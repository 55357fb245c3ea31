"""Plan receipt for the corpus-rebalance reassign kernel (VERDICT r14
task 3): after a rebalance that splits clusters, the index frame's lineage
must show a MapInArrow node (zero-copy kernel) and no ArrowEvalPython /
BatchEvalPython (the old per-row pandas_udf decode).

Drives the same adversarial skew shape as tests/test_rebalance_corpus.py
(3/4 of rows in one tight blob), rebalances post-hoc, and dumps the
reassigned frame's formatted plan.

Run:  python tools/reassign_plan_probe.py <out.txt>
"""
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import numpy as np

from duckdb_faiss_ext_spark.engine import FaissSparkEngine
from duckdb_faiss_ext_spark.session import get_spark

NLIST = 8
N = 4000

rng = np.random.default_rng(7)
nb = int(N * 0.75)
x = np.vstack([
    rng.normal(0.0, 0.02, size=(nb, 8)) + 5.0,
    rng.uniform(-4.0, 4.0, size=(N - nb, 8)),
]).astype(np.float32)

spark = get_spark("reassign_plan_probe", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
eng = FaissSparkEngine(spark)
df = spark.createDataFrame(
    [(i, [float(v) for v in r]) for i, r in enumerate(x)],
    "label bigint, vector array<float>",
)
eng.create(
    "plan_probe", 8, f"IDMap,IVF{NLIST}", metric_type="L2",
    params={"train_points_per_centroid": "32", "rebalance_clusters": "0"},
)
eng.add("plan_probe", df)
idx = eng.registry.get("plan_probe")
idx.params["rebalance_clusters"] = "1"
out = eng.rebalance("plan_probe")
assert out["splits"] > 0, out
plan = idx.data._jdf.queryExecution().toString()
dest = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"
with open(dest, "w") as f:
    f.write(f"# rebalance stats: {out}\n")
    f.write(plan)
has_arrow_udf = "ArrowEvalPython" in plan or "BatchEvalPython" in plan
has_mapinarrow = "MapInArrow" in plan
print(f"splits={out['splits']} MapInArrow={has_mapinarrow} "
      f"ArrowEvalPython/BatchEvalPython={has_arrow_udf}")
spark.stop()
