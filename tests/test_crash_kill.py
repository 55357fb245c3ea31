"""TRUE SIGKILL crash tests for the disk graph (VERDICT r8 task 5).

The r8 crash-window tests simulated deletion points in-process; these
spawn a REAL subprocess (own JVM) that SIGKILLs itself mid-compaction /
mid-concat, then reopen the index from storage_path in this session and
assert row count + search identity.  ~25 s per point (child Spark boot).
"""

import os
import subprocess
import sys

import pyspark.sql.functions as F
import pytest
from conftest import gen_vectors

from duckdb_faiss_ext_spark import FaissSparkEngine

_CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "crash_kill_child.py")


@pytest.mark.parametrize(
    "point,expected_rows",
    [
        ("merge_pre_manifest", 176),
        ("merge_pre_delete", 176),
        ("concat_mid_move", 160),
    ],
)
def test_sigkill_mid_compaction_recovers(spark, tmp_path, point, expected_rows):
    path = str(tmp_path / point)
    proc = subprocess.run(
        [sys.executable, _CHILD, point, path],
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        capture_output=True,
        timeout=420,
    )
    assert proc.returncode == -9, (
        point,
        proc.returncode,
        proc.stdout[-1500:],
        proc.stderr[-1500:],
    )

    name = f"ck_{point}"
    eng = FaissSparkEngine(spark)
    eng.FULL_SLICE_FANOUT = 2
    eng.create(
        name, 8, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "32", "storage_path": path},
    )
    eng.compact(name)  # hydrate from manifest, GC orphans, finish the work
    idx = eng.registry.get(name)
    assert idx.data.count() == expected_rows  # nothing lost, nothing doubled
    assert idx.data.select("label").distinct().count() == expected_rows

    x = gen_vectors(176, 8)
    q = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(0, expected_rows, 13)],
        "qid bigint, vector array<float>",
    )
    res = eng.search_flat(name, 1, q, params={"efSearch": 64}).collect()
    assert res and all(
        r["qid"] == r["label"] and r["distance"] < 1e-5 for r in res
    )
    eng.destroy(name)
