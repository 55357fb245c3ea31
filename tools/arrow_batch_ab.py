"""Arrow batch-size A/B on the vec1m add/assign path (VERDICT r14 task 6).

The session pins spark.sql.execution.arrow.maxRecordsPerBatch=65536; the
r14 profile saw 40-90% sys time (memcg page-zero) on the Python-worker
shuffle stages even with zero-copy kernels — batch size is the one
unexplored lever.  Times create+add of the 1M x 64 IVF2048 bench shape at
three batch sizes, same session, fresh index per variant.

Run:  SPARK_GRAFT_CPUS=32 python tools/arrow_batch_ab.py
"""
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tools"))

from duckdb_faiss_ext_spark import FaissSparkEngine
from duckdb_faiss_ext_spark.session import get_spark
from _synth import synth_clusterable

N, DIM, NLIST = 1_000_000, 64, 2048
VARIANTS = [16384, 65536, 262144]

spark = get_spark("arrow_batch_ab", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
eng = FaissSparkEngine(spark)
corp = synth_clusterable(spark, N, DIM, n_clusters=1024).persist()
corp.count()

# JIT warmup so variant 1 doesn't eat first-use compilation
eng.create("ab_warm", DIM, "IDMap,IVF64", metric_type="L2")
eng.add("ab_warm", corp.limit(32_768))
eng.destroy("ab_warm")

results = {}
for i, mb in enumerate(VARIANTS):
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(mb))
    name = f"ab_{mb}"
    t0 = time.perf_counter()
    eng.create(name, DIM, f"IDMap,IVF{NLIST}", metric_type="L2")
    eng.add(name, corp)
    dt = time.perf_counter() - t0
    results[mb] = round(dt, 2)
    print(f"maxRecordsPerBatch={mb}: create+add {dt:.1f}s "
          f"load={os.getloadavg()[0]:.1f}", flush=True)
    eng.destroy(name)
print("RESULTS:", results)
spark.stop()
