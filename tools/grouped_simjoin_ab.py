"""Rebalanced layout x grouped similarity join A/B (VERDICT r8 task 7).

similarity_join_grouped partitions work by cluster_id — the bulk-IVF
search path routes corpus-scale query sides through it.  Pre-r8 skew
(a 132x-even-share cluster at 4M/2048) straggles the per-(blk, grp)
kernels exactly the way probed search was straggled.  This probe builds
the SAME skew-prone corpus (hash-uniform, L2-normalized, IP metric — the
regime where the coarse quantizer concentrates mass) twice, rebalance
ON vs OFF, and times the bulk-queries search (which executes the grouped
join) plus the cluster histogram each side.

Usage: python tools/grouped_simjoin_ab.py [n] [nlist] [dim] [n_queries]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nlist = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    nq = int(sys.argv[4]) if len(sys.argv) > 4 else 100_000

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark
    from tools._synth import synth_vectors

    spark = get_spark("grouped-simjoin-ab")
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)

    nrm = F.sqrt(F.aggregate("vector", F.lit(0.0), lambda a, v: a + v * v))
    corpus = (
        synth_vectors(spark, n, dim)
        .select(
            "label",
            F.transform("vector", lambda v: (v / nrm).cast("float")).alias("vector"),
        )
        .persist()
    )
    corpus.count()
    queries = (
        corpus.limit(nq)
        .select(F.col("label").alias("qid"), "vector")
        .persist()
    )
    queries.count()
    print(json.dumps({"n": n, "nlist": nlist, "dim": dim, "nq": nq,
                      "load_start": loadavg()}), flush=True)

    for mode, params in (
        ("rebalance_on", None),
        ("rebalance_off", {"rebalance_clusters": "0"}),
    ):
        name = f"gs_{mode}"
        t0 = time.perf_counter()
        eng.create(name, dim, f"IDMap,IVF{nlist},Flat",
                   metric_type="INNER_PRODUCT", params=params)
        eng.add(name, corpus)
        build = time.perf_counter() - t0
        idx = eng.registry.get(name)
        sizes = np.array(sorted(
            r["c"] for r in
            idx.data.groupBy("cluster_id").agg(F.count("*").alias("c")).collect()
        ))
        print(json.dumps({
            "mode": mode, "build_sec": round(build, 1),
            "cluster_max": int(sizes.max()),
            "cluster_max_x_even": round(float(sizes.max()) / (n / nlist), 1),
            "cluster_p99": int(np.percentile(sizes, 99)),
            "load_1m": loadavg(),
        }), flush=True)

        run = lambda: eng.search_flat(  # noqa: E731
            name, 10, queries, params={"nprobe": 16, "bulk_queries": 1}
        ).count()
        run()  # warm (also the first-leg cache penalty seat)
        for leg in range(2):
            t0 = time.perf_counter()
            run()
            print(json.dumps({
                "mode": mode, "leg": leg,
                "bulk_np16_sec": round(time.perf_counter() - t0, 2),
                "load_1m": loadavg(),
            }), flush=True)
        eng.destroy(name)


if __name__ == "__main__":
    main()
