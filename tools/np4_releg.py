"""ivf_knn_nprobe4 drift adjudication (VERDICT r8 task 1).

BENCH_r08 recorded ivf_knn_nprobe4 at 1.72x r1 (0.653 vs 0.379 s) at
unchanged recall — the only timed key trending against BOTH r7 and r1.
Suspects: (a) the r8 default-on train-time rebalance changing the sf0.1
nlist=16 layout, (b) the grouped-kernel branch choice at np4 mask density
(operators/topk.py DENSE_MASK_THRESHOLD), (c) ambient load.

This probe reproduces the EXACT bench config (sf0.1 embeddings, nlist=16,
INNER_PRODUCT, the bench's own 48-query frame) and A/Bs:
  - rebalance ON vs OFF (cluster histogram recorded for each)
  - np4 vs np16, three rotated cycles each (np16 first, np4 first)
  - np4 with the kernel FORCED dense vs FORCED sparse (threshold pin)
Per-leg host load_1m is recorded; legs at load >= 2 are flagged.

Usage: python tools/np4_releg.py [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyspark.sql.functions as F


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.operators import topk as topk_mod
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("np4-releg")
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    qdf48 = (
        emb.limit(48)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("vector"))
        .cache()
    )
    qdf48.count()
    print(json.dumps({"n": n, "dim": dim, "load_start": loadavg()}), flush=True)

    def timed_leg(name, fn, rec):
        fn()  # warm
        t0 = time.perf_counter()
        fn()
        rec.append({"leg": name, "sec": round(time.perf_counter() - t0, 4),
                    "load_1m": loadavg()})
        print(json.dumps(rec[-1]), flush=True)

    for mode, params in (
        ("rebalance_on", None),
        ("rebalance_off", {"rebalance_clusters": "0"}),
    ):
        name = f"iv_{mode}"
        t0 = time.perf_counter()
        eng.create(name, dim, "IDMap,IVF16,Flat", metric_type="INNER_PRODUCT",
                   params=params)
        eng.add(name, emb.select("vec_id", "embedding"))
        build = time.perf_counter() - t0
        idx = eng.registry.get(name)
        sizes = np.array(sorted(
            r["c"] for r in
            idx.data.groupBy("cluster_id").agg(F.count("*").alias("c")).collect()
        ))
        print(json.dumps({
            "mode": mode, "build_sec": round(build, 2),
            "cluster_max": int(sizes.max()),
            "cluster_max_x_even": round(float(sizes.max()) / (n / 16), 2),
            "n_clusters": len(sizes), "load_1m": loadavg(),
        }), flush=True)

        legs: list = []
        run = lambda np_: eng.search_flat(  # noqa: E731
            name, 10, qdf48, params={"nprobe": np_}
        ).count()
        # three rotated cycles: np16-first, np4-first, np16-first
        for cyc, order in enumerate(((16, 4), (4, 16), (16, 4))):
            for np_ in order:
                timed_leg(f"{mode}_np{np_}_cyc{cyc}", lambda np_=np_: run(np_), legs)
        # kernel-branch A/B at np4: force dense vs force sparse
        orig_thr = topk_mod.DENSE_MASK_THRESHOLD
        try:
            topk_mod.DENSE_MASK_THRESHOLD = 0.0  # any density > 0 -> dense
            timed_leg(f"{mode}_np4_forced_dense", lambda: run(4), legs)
            topk_mod.DENSE_MASK_THRESHOLD = 1.1  # density never > 1.1 -> sparse
            timed_leg(f"{mode}_np4_forced_sparse", lambda: run(4), legs)
        finally:
            topk_mod.DENSE_MASK_THRESHOLD = orig_thr
        # recall parity check between modes
        hits = {
            (r["qid"], r["label"])
            for r in eng.search_flat(name, 10, qdf48, params={"nprobe": 4}).collect()
        }
        print(json.dumps({"mode": mode, "np4_hits": len(hits)}), flush=True)
        best_np4 = min(x["sec"] for x in legs if "_np4_cyc" in x["leg"])
        best_np16 = min(x["sec"] for x in legs if "_np16_cyc" in x["leg"])
        print(json.dumps({
            "mode": mode, "best_np4": best_np4, "best_np16": best_np16,
            "r1_np4": 0.379, "np4_x_r1": round(best_np4 / 0.379, 2),
        }), flush=True)
        eng.destroy(name)


if __name__ == "__main__":
    main()
