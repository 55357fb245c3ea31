"""Measure the HNSW segment-size trade at 1M x 64 (VERDICT r3 task 5).

The per-segment graph build is O(seg^2 * d) (exact candidate lists,
operators/nsw.py); bigger segments cost quadratically more build but give
beams a whole-corpus view in fewer, deeper walks.  This probe builds
`IDMap,HNSW32` at graph_partition_rows in {16384, 65536, 131072} over the
same 1M-row corpus and reports build seconds, 48-query search latency at
efSearch=128, and recall@10 vs exact IP — the numbers behind the
segment-size guidance in README/SCALE.md.

Usage: python tools/hnsw_segment_probe.py [n_rows] [seg1,seg2,...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    segs = (
        [int(s) for s in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [16384, 65536, 131072]
    )
    dim = 64
    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("hnsw-seg-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from tools._synth import synth_vectors

    gen = synth_vectors(spark, n, dim).persist()
    gen.count()

    eng = FaissSparkEngine(spark)
    qdf = gen.limit(48).select(F.col("label").alias("qid"), "vector").cache()
    qdf.count()

    # exact baseline
    eng.create("seg_exact", dim, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("seg_exact", gen, validate=False)
    t0 = time.perf_counter()
    exact_hits = {
        (r["qid"], r["label"])
        for r in eng.search_flat("seg_exact", 10, qdf).collect()
    }
    t_exact = time.perf_counter() - t0
    print(json.dumps({"probe": "hnsw_seg_exact_baseline", "n": n,
                      "search48_sec": round(t_exact, 2)}), flush=True)
    eng.destroy("seg_exact")

    for seg in segs:
        name = f"seg_hnsw_{seg}"
        t0 = time.perf_counter()
        eng.create(
            name, dim, "IDMap,HNSW32", metric_type="INNER_PRODUCT",
            params={"graph_partition_rows": str(seg)},
        )
        eng.add(name, gen, validate=False)
        build = time.perf_counter() - t0
        eng.search_flat(name, 10, qdf, params={"efSearch": 128}).count()  # warm
        t0 = time.perf_counter()
        hits = {
            (r["qid"], r["label"])
            for r in eng.search_flat(name, 10, qdf, params={"efSearch": 128}).collect()
        }
        search = time.perf_counter() - t0
        print(json.dumps({
            "probe": "hnsw_segment_size", "n": n, "dim": dim,
            "graph_partition_rows": seg,
            "build_sec": round(build, 1),
            "search48_ef128_sec": round(search, 2),
            "recall_at_10": round(len(hits & exact_hits) / len(exact_hits), 4),
            "load_1m": round(os.getloadavg()[0], 1),
        }), flush=True)
        eng.destroy(name)


if __name__ == "__main__":
    main()
