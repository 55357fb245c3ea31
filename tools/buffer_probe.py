"""Disk-graph micro-batch ingest: write-buffer A/B (VERDICT r7 stretch).

r7 measured disk-graph ingest at 539 s vs memory-mode 394 s over 1M x 100
batches (10k rows/batch) — ~1.5 s/batch of parquet dir + manifest + re-read.
The r8 write buffer coalesces sub-quarter-segment batches in cache and
flushes ONE slice dir per quarter segment.  This probe measures steady-state
ingest at SMALL batches (where the per-batch overhead dominates) three ways:

  memory mode | disk, buffer ON (default) | disk, buffer OFF (write-through)

and verifies search identity across all three at the end.

Usage: python tools/buffer_probe.py [n_rows] [batch_rows] [dim]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def loadavg():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark
    from tools._synth import synth_vectors

    spark = get_spark("buffer-probe")
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)
    tmp = tempfile.mkdtemp(prefix="bufprobe_")
    results = []

    corpus = synth_vectors(spark, n, dim).persist()
    corpus.count()
    queries = corpus.limit(32).select(
        F.col("label").alias("qid"), "vector"
    ).cache()
    queries.count()

    def run(name, params):
        eng.create(
            name, dim, "IDMap,HNSW16", metric_type="INNER_PRODUCT",
            params={"graph_partition_rows": "10000", **params},
        )
        t0 = time.perf_counter()
        for lo in range(0, n, batch):
            b = corpus.filter((F.col("label") >= lo) & (F.col("label") < lo + batch))
            eng.add(name, b)
        ing = time.perf_counter() - t0
        t0 = time.perf_counter()
        hits = sorted(
            (r["qid"], r["rank"], r["label"])
            for r in eng.search_flat(name, 5, queries, params={"efSearch": 64}).collect()
        )
        s = time.perf_counter() - t0
        results.append(
            {
                "leg": name,
                "ingest_sec": round(ing, 2),
                "sec_per_batch": round(ing / (n // batch), 3),
                "search_sec": round(s, 2),
                "load_1m": loadavg(),
            }
        )
        print(json.dumps(results[-1]), flush=True)
        return hits

    h_mem = run("bp_mem", {})
    h_buf = run("bp_buf", {"storage_path": os.path.join(tmp, "buf")})
    h_wt = run(
        "bp_wt",
        {"storage_path": os.path.join(tmp, "wt"), "disk_graph_buffer_rows": "0"},
    )
    print(
        json.dumps(
            {
                "summary": {
                    "n": n,
                    "batch": batch,
                    "dim": dim,
                    "identity_buf_vs_writethrough": h_buf == h_wt,
                    "disk_buf_vs_mem_ingest": round(
                        results[1]["ingest_sec"] / results[0]["ingest_sec"], 3
                    ),
                    "disk_wt_vs_mem_ingest": round(
                        results[2]["ingest_sec"] / results[0]["ingest_sec"], 3
                    ),
                }
            }
        ),
        flush=True,
    )
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
