"""Quiet-host rerun of the wide1536 bench keys (VERDICT r6 task 2b).

Replicates bench.py's wide1536 section standalone so the declared baselines
(bench.py DECLARED_BASELINES) can carry quiet-host numbers with recorded
load.  Usage: python tools/wide1536_rerun.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.operators.simjoin import similarity_join
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("wide1536-rerun")
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)
    out = {"load_start": loadavg(), "sf_dir": sf_dir}

    # EXACT replica of bench.py's wide_vec section (same seeds, sizes)
    wdim, wn, wq = 1536, 20_000, 2_000
    wide = (
        spark.range(wn)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[F.rand(seed=101 + j).cast("float") for j in range(wdim)]
            ).alias("embedding"),
        )
        .persist()
    )
    out["rows"] = wide.count()

    eng.create("bench_wide", wdim, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("bench_wide", wide, validate=False)
    wq48 = wide.limit(48).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    ).cache()
    wq48.count()
    eng.search_flat("bench_wide", 10, wq48).count()  # warm
    t0 = time.perf_counter()
    eng.search_flat("bench_wide", 10, wq48).count()
    out["wide1536_knn"] = round(time.perf_counter() - t0, 3)
    out["load_after_knn"] = loadavg()

    right = wide.limit(wq).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    left = wide.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    )
    run = lambda: similarity_join(  # noqa: E731
        left, right, 5, metric="INNER_PRODUCT", bulk=True
    ).count()
    run()  # warm
    t0 = time.perf_counter()
    run()
    out["wide1536_simjoin"] = round(time.perf_counter() - t0, 3)
    out["load_end"] = loadavg()
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
