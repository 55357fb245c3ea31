"""Subprocess half of the TRUE crash-kill disk-graph tests (VERDICT r8
task 5): builds a disk-backed HNSW index at sys.argv[2], then SIGKILLs
ITSELF (os.kill SIGKILL — no cleanup, no atexit, no finally blocks) at a
chosen injection point inside compaction.  The parent test reopens the
index from storage_path and asserts row count + search identity.

Injection points:
- merge_pre_manifest — inside the manifest save that registers a tiered-
  merge result: the merged dir must be an unreferenced orphan, all
  original slices intact.
- merge_pre_delete  — after the merge manifest save, inside the deletion
  of the superseded dirs: they must be GC-able orphans, no data loss.
- concat_mid_move   — mid-source during a concat file-move pass: every
  part-file lives in exactly one place (os.replace moves, never copies),
  so the total row count must be exact even with per-entry counts stale.
"""

import os
import signal
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

point, path = sys.argv[1], sys.argv[2]

from conftest import gen_vectors  # noqa: E402

from duckdb_faiss_ext_spark import FaissSparkEngine  # noqa: E402
from duckdb_faiss_ext_spark.session import get_spark  # noqa: E402

spark = get_spark("crash-child", shuffle_partitions=4)
eng = FaissSparkEngine(spark)
eng.FULL_SLICE_FANOUT = 2


def _df(x, lo, n):
    return spark.createDataFrame(
        [(lo + j, [float(v) for v in x[lo + j]]) for j in range(n)],
        "label bigint, vector array<float>",
    )


def die(*_a, **_k):
    os.kill(os.getpid(), signal.SIGKILL)


eng.create(
    "cg", 8, "IDMap,HNSW8", metric_type="L2",
    params={
        "graph_partition_rows": "32",
        "storage_path": path,
        "disk_graph_buffer_rows": "0",  # write-through: every add durable
    },
)
x = gen_vectors(176, 8)
for i in range(4):  # four FULL slices (40 >= 32)
    eng.add("cg", _df(x, i * 40, 40))

if point in ("merge_pre_manifest", "merge_pre_delete"):
    # two micro slices so the tiered merge path runs at compact()
    eng.add("cg", _df(x, 160, 8))
    eng.add("cg", _df(x, 168, 8))
    if point == "merge_pre_manifest":
        eng._graph_manifest_save = die  # instance attr shadows the method
    else:
        import shutil

        shutil.rmtree = die  # first superseded-dir deletion dies
    eng.compact("cg")
elif point == "concat_mid_move":
    # 4 full slices > FULL_SLICE_FANOUT -> concat file-move pass
    real_replace = os.replace
    moved = {"n": 0}

    def counted(src, dst, *a, **k):
        if str(src).endswith(".parquet") and "graph_slices" in str(src):
            moved["n"] += 1
            if moved["n"] == 2:
                die()
        return real_replace(src, dst, *a, **k)

    os.replace = counted
    eng.compact("cg")
else:
    raise SystemExit(f"unknown injection point {point!r}")

raise SystemExit(f"BUG: compact survived injection point {point!r}")
