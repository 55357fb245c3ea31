"""Re-pin the sf0.1 ivf_recall_nprobe4 floor with margin (VERDICT r9
task 6: measured 0.5625 vs floor 0.55 — a coin-flip guard).

Replicates the bench ivf section's recall measurement exactly (same
factory, metric, query batch, k) in a FRESH process; run it 5x on a
quiet host and pin the floor at min - margin.  r10 note: the build path
now runs corpus-level rebalance, so the layout may differ from r9 —
that is exactly why the floor must be re-measured, not carried over.

Usage: python tools/np4_floor_repin.py [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("np4-repin")
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    emb.count()
    dim = len(emb.select("embedding").first()[0])
    qdf48 = emb.limit(48).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    ).cache()
    qdf48.count()

    eng.create("rp_flat", dim, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("rp_flat", emb.select("vec_id", "embedding"))
    exact = {
        (r["qid"], r["label"])
        for r in eng.search_flat("rp_flat", 10, qdf48).collect()
    }
    t0 = time.perf_counter()
    eng.create("rp_ivf", dim, "IDMap,IVF16,Flat", metric_type="INNER_PRODUCT")
    eng.add("rp_ivf", emb.select("vec_id", "embedding"))
    build_sec = time.perf_counter() - t0
    out = {"build_sec": round(build_sec, 2)}
    for np_ in (4, 16):
        hits = {
            (r["qid"], r["label"])
            for r in eng.search_flat(
                "rp_ivf", 10, qdf48, params={"nprobe": np_}
            ).collect()
        }
        out[f"recall_np{np_}"] = round(len(hits & exact) / len(exact), 4)
    idx = eng.registry.get("rp_ivf")
    hist = [
        int(r["c"])
        for r in idx.data.groupBy("cluster_id")
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    out["nlist_live"] = len(idx.centroids)
    out["cluster_rows_max"] = max(hist)
    with open("/proc/loadavg") as f:
        out["load_1m"] = float(f.read().split()[0])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
