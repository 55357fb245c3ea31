"""Bench regression guard (r2 post-mortem): run every bench.py entry once at
sf0.001 inside pytest, so a contract/bench breakage surfaces as a red TEST
before the driver's per-round bench pass can crash.  bench.main() reuses the
session-scoped SparkSession via get_spark()'s getOrCreate.

r14 (VERDICT r13 What's-wrong #1/#2): the headline line has a guaranteed
second-stage trim whose shed-list overlaps the keys this smoke asserts, so
key presence is now checked against the FULL side artifact — the trim's
contract is "everything stays in the full file" — while the printed line
keeps only thin assertions (parses, fits the driver's ~1900-char capture).
The smoke also writes its full artifact to a pytest tempdir via
SPARK_GRAFT_BENCH_FULL_PATH so it can never clobber an official run's file.
"""

import json
import os

import pytest


def test_bench_all_entries_run_clean(spark, monkeypatch, capsys, tmp_path):
    sf001 = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf001)
    # no storm-waiting inside pytest: the smoke run checks CORRECTNESS of
    # every section, not timing quality (bench.quiet_wait doc)
    monkeypatch.setenv("SPARK_GRAFT_NO_QUIET_WAIT", "1")
    # r15 (VERDICT r14 task 2): shrink the constant-size synthetic sections
    # 8x — this smoke checks that every section RUNS CLEAN, not its timing,
    # and at full shape it was a 19-minute test that pushed the suite past
    # the driver's verify budget.  The driver's own bench never sets this.
    monkeypatch.setenv("SPARK_GRAFT_BENCH_SMOKE", "1")
    full_path = tmp_path / "bench_full_smoke.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL_PATH", str(full_path))
    import bench

    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    # thin line contract: parses as one JSON object and fits under the
    # driver's stdout tail capture cliff
    data = json.loads(line)
    assert len(line) <= 1600, f"headline line too long: {len(line)} chars"
    assert data["value"] > 0
    assert data["full"], "headline line must point at the full artifact"
    # key-presence contract: against the FULL artifact (trim-immune)
    full = json.loads(full_path.read_text())
    # crash tolerance must not have been needed: every section green
    assert "errors" not in full, f"bench sections failed: {full.get('errors')}"
    expected = {
        "q03_equi_join", "exact_knn_ip", "exact_knn_engine",
        "filtered_knn_p50", "ivf_knn_nprobe4", "hnsw_knn_ef128",
        "ivfhnsw_knn_np8", "lsh_knn_4x8", "sessionize_events",
        "knn_majority_vote", "similarity_join_f64", "dedup_minhash_lsh",
        "text_quality_lang", "ingest_rows_per_sec",
        "ingest_unlabeled_rows_per_sec",
    }
    missing = expected - set(full["queries"])
    assert not missing, f"bench entries missing from full artifact: {missing}"
    assert full["value"] > 0
