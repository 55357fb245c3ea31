"""IVF2048 build breakdown (VERDICT r6 task 3).

The r6 1M nlist=2048 build measured 1844 s while a standalone KMeans fit of
the same capped-sample problem takes ~85 s — the gap is assignment +
range-shuffle materialization + ambient load, but unmeasured in isolation.
This probe stages the SAME build into separately-timed phases:

  fit          — KMeans on the 256/centroid capped sample (+ skew check)
  assign_only  — materialize the assignment pandas_udf WITHOUT the range
                 shuffle (count over assigned frame)
  full_add     — the engine's real add(): assign + repartitionByRange +
                 persist + count (the slice materialization)

full_add re-runs assignment inside its one job, so the isolated
range-shuffle+cache share is full_add - assign_only (both read the same
cached corpus; reported with host load so ambient noise is attributable).

Usage: python tools/ivf_build_breakdown.py [n_rows] [nlist] [dim] [normalize]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nlist = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    normalize = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark
    from tools._synth import synth_vectors

    spark = get_spark("ivf-build-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)

    corpus = synth_vectors(spark, n, dim)
    if normalize:
        nrm = F.sqrt(F.aggregate("vector", F.lit(0.0), lambda a, v: a + v * v))
        corpus = corpus.select(
            "label",
            F.transform("vector", lambda v: (v / nrm).cast("float")).alias("vector"),
        )
    corpus = corpus.persist()
    corpus.count()
    out = {"n": n, "nlist": nlist, "dim": dim, "normalized": normalize,
           "load_start": loadavg()}

    eng.create("bk", dim, f"IDMap,IVF{nlist},Flat", metric_type="INNER_PRODUCT")
    idx = eng.registry.get("bk")

    t0 = time.perf_counter()
    eng._train(idx, corpus.select("vector"))
    out["fit_sec"] = round(time.perf_counter() - t0, 2)
    out["load_after_fit"] = loadavg()

    assigned = corpus.select("label", "vector").withColumn(
        "cluster_id", eng._cluster_assign_udf(idx)(F.col("vector"))
    )
    t0 = time.perf_counter()
    # force the UDF: a bare count() prunes the assignment column entirely
    # (the first run of this probe measured 0.09 s of nothing)
    assigned.agg(F.sum("cluster_id")).collect()
    out["assign_only_sec"] = round(time.perf_counter() - t0, 2)
    out["load_after_assign"] = loadavg()

    # the engine's real slice materialization: assignment re-runs inside
    # this one job, plus repartitionByRange write+read and the cache fill
    t0 = time.perf_counter()
    ranged = eng._assign_clusters(idx, corpus.select("label", "vector")).persist()
    ranged.count()
    out["full_add_sec"] = round(time.perf_counter() - t0, 2)
    out["range_shuffle_cache_sec"] = round(
        out["full_add_sec"] - out["assign_only_sec"], 2
    )
    out["load_end"] = loadavg()
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
