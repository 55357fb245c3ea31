"""Quiet-host adjudication of the four bench keys that breached 2x their
r1 baselines in the contaminated r7 bench (VERDICT r7 task 3).

Replicates the exact bench.py legs standalone, with per-leg load recorded:
  q07_window_topk      (r1 0.742, r7 bench 1.482)
  knn_majority_vote    (r1 0.744, r7 bench 1.509)
  similarity_join_f64  (r1 0.513, r7 bench 1.148)
  ivf_build_sec        (r1 3.961, r7 bench 8.012) — three full build cycles,
                       since the r7/r8 train path added work (fit-sample
                       repartition, degeneracy histogram, r8 rebalance check)

Usage: python tools/quiet4_rerun.py [out.json]
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


def timed(fn, warmup=True):
    if warmup:
        fn()
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("quiet4-rerun")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": sf_dir, "load_start": loadavg()}
    legs = []

    def leg(name, fn, warmup=True):
        l0 = loadavg()
        sec = timed(fn, warmup=warmup)
        legs.append(
            {"key": name, "sec": sec, "load_before": l0, "load_after": loadavg()}
        )
        print(json.dumps(legs[-1]), flush=True)

    leg("q07_window_topk", lambda: entry.q07_window_topk(spark, sf_dir).count())
    leg("knn_majority_vote", lambda: entry.knn_majority_vote(spark, sf_dir).count())
    leg(
        "similarity_join_f64",
        lambda: entry.similarity_join_topk(spark, sf_dir).count(),
    )

    # ivf_build_sec: bench times create+add cold (no warmup); run 3 cycles
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    emb.count()
    dim = len(emb.select("embedding").first()[0])
    eng = FaissSparkEngine(spark)
    for i in range(3):
        name = f"bench_ivf_q4_{i}"

        def build(name=name):
            eng.create(name, dim, "IDMap,IVF16,Flat", metric_type="INNER_PRODUCT")
            eng.add(name, emb.select("vec_id", "embedding"))

        leg(f"ivf_build_sec_cycle{i}", build, warmup=False)
        eng.destroy(name)

    out["legs"] = legs
    out["load_end"] = loadavg()
    dst = sys.argv[1] if len(sys.argv) > 1 else "tools/out_r8/quiet4.json"
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
