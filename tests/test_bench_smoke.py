"""Bench regression guard (r2 post-mortem): run every bench.py entry once at
sf0.001 inside pytest, so a contract/bench breakage surfaces as a red TEST
before the driver's per-round bench pass can crash.  bench.main() reuses the
session-scoped SparkSession via get_spark()'s getOrCreate."""

import json
import os

import pytest


def test_bench_all_entries_run_clean(spark, monkeypatch, capsys):
    sf001 = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf001)
    # no storm-waiting inside pytest: the smoke run checks CORRECTNESS of
    # every section, not timing quality (bench.quiet_wait doc)
    monkeypatch.setenv("SPARK_GRAFT_NO_QUIET_WAIT", "1")
    import bench

    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    # crash tolerance must not have been needed: every section green
    assert "errors" not in data, f"bench sections failed: {data.get('errors')}"
    expected = {
        "q03_equi_join", "exact_knn_ip", "exact_knn_engine",
        "filtered_knn_p50", "ivf_knn_nprobe4", "hnsw_knn_ef128",
        "ivfhnsw_knn_np8", "lsh_knn_4x8", "sessionize_events",
        "knn_majority_vote", "similarity_join_f64", "dedup_minhash_lsh",
        "text_quality_lang", "ingest_rows_per_sec",
        "ingest_unlabeled_rows_per_sec",
    }
    missing = expected - set(data["queries"])
    assert not missing, f"bench entries missing: {missing}"
    assert data["value"] > 0
