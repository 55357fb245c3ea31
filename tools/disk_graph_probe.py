"""Disk-backed graph segments at stream scale (r7; VERDICT r6 task 1).

Streams ``n_total / batch`` micro-batch adds into an ``IDMap,HNSW32``
index with ``storage_path`` set (one parquet slice directory per add,
tiered merge-REWRITE compaction on disk) and compares against (a) one
single bulk add in the SAME disk mode and (b) the r6 memory-mode tiered
numbers (SCALE.md r6: search 0.88x bulk, write amp 2.0 at 1M x 100).

Axes: ingest wall, slice-directory count at steady state, rebuilt rows /
write amplification (counted via _rebuild_graph_frame), search latency
(48 q, efSearch=128, best of 3) and recall@10 vs exact IP.

Pass criteria mirror the r6 memory probe: disk tiered search within
~1.2x of the disk bulk build, write amplification a small constant, and
no step that materializes the corpus in executor cache.

Usage: python tools/disk_graph_probe.py [n_total] [batch] [dim]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark
    from tools._synth import synth_vectors

    spark = get_spark("disk-graph-probe")
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)
    root = tempfile.mkdtemp(prefix="dg_probe_")

    corpus = synth_vectors(spark, n_total, dim).persist()
    corpus.count()
    queries = corpus.limit(48).select(
        F.col("label").alias("qid"), F.col("vector")
    ).cache()
    queries.count()

    eng.create("dp_flat", dim, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("dp_flat", corpus)
    exact = {
        (r["qid"], r["label"])
        for r in eng.search_flat("dp_flat", 10, queries).collect()
    }

    def search_stats(name):
        run = lambda: eng.search_flat(  # noqa: E731
            name, 10, queries, params={"efSearch": 128, "bulk_queries": 0}
        )
        run().count()
        sec = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run().count()
            sec = min(sec, time.perf_counter() - t0)
        hits = {(r["qid"], r["label"]) for r in run().collect()}
        return sec, len(hits & exact) / max(len(exact), 1)

    def segments(name):
        return eng.registry.get(name).data.select("graph_seg").distinct().count()

    def loadavg():
        return round(os.getloadavg()[0], 1)

    # --- A: single bulk add, disk mode -------------------------------------
    t0 = time.perf_counter()
    eng.create(
        "dp_bulk", dim, "IDMap,HNSW32", metric_type="INNER_PRODUCT",
        params={"storage_path": os.path.join(root, "bulk")},
    )
    eng.add("dp_bulk", corpus)
    build = time.perf_counter() - t0
    sec, rec = search_stats("dp_bulk")
    print(json.dumps({
        "scenario": "disk_bulk", "build_sec": round(build, 2),
        "segments": segments("dp_bulk"), "search_sec": round(sec, 3),
        "recall_at_10": round(rec, 4), "load_1m": loadavg(),
    }), flush=True)
    eng.destroy("dp_bulk")

    # --- B: micro-batch stream, disk tiered compaction ----------------------
    slices = [
        corpus.filter((F.col("label") >= lo) & (F.col("label") < lo + batch))
        for lo in range(0, n_total, batch)
    ]
    rebuilt = []
    orig_rb = eng._rebuild_graph_frame

    def counting(idx, df, n_rows, _o=orig_rb):
        rebuilt.append(int(n_rows))
        return _o(idx, df, n_rows)

    eng._rebuild_graph_frame = counting
    try:
        t0 = time.perf_counter()
        eng.create(
            "dp_micro", dim, "IDMap,HNSW32", metric_type="INNER_PRODUCT",
            params={"storage_path": os.path.join(root, "micro")},
        )
        for s in slices:
            eng.add("dp_micro", s, validate=False)
        eng.compact("dp_micro")  # streaming steady state ends on a compact
        build = time.perf_counter() - t0
    finally:
        eng._rebuild_graph_frame = orig_rb
    man = json.load(open(os.path.join(root, "micro", "graph_manifest.json")))
    sec, rec = search_stats("dp_micro")
    print(json.dumps({
        "scenario": "disk_micro_tiered", "n_adds": len(slices),
        "build_sec": round(build, 2), "segments": segments("dp_micro"),
        "slice_dirs": len(man["slices"]),
        "rebuilt_rows": sum(rebuilt), "n_merges": len(rebuilt),
        "write_amplification": round((n_total + sum(rebuilt)) / n_total, 2),
        "search_sec": round(sec, 3), "recall_at_10": round(rec, 4),
        "load_1m": loadavg(),
    }), flush=True)
    eng.destroy("dp_micro")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
