"""Wide-dim scaled leg: 1M x 1536, IVF2048, SQ8 on/off (VERDICT r10 task 4).

Every >=1M probe so far ran dim=64; the reference's own bench corpus is
8.8M x 1536 real embeddings (go/benches_c.go:31,:87) — a regime where
per-row decode cost, Arrow transfer size, and the ~3.8x SQ8 at-rest lever
all change.  1M x 1536 f32 = 6.1 GB, comfortably inside the host ceiling
with one raw index + one codes index.

Measures per index tier (raw IVF2048 vs IVF2048,SQ8):
  build_sec, warm_sec, at-rest parquet bytes (save()), search np4/np16,
  exact (= nprobe=nlist fullprobe on the raw index — r9 OOM lesson: never
  persist a second 6 GB flat copy), recall@10 np4/np16 (+ SQ8 np16 recall
  vs the raw exact baseline).

Fit-cost controls, documented deviations from defaults:
  train_points_per_centroid=32 (65k-row sample — the default 256/centroid
  would fit 524k x 1536), train_max_iter=10.  Centroids only route; recall
  is measured against the exact scan on the SAME corpus, so a shallower
  fit shows up IN the recall numbers, honestly.
  Arrow maxRecordsPerBatch=8192: the session default 65536 was tuned for
  dim 64 (~17 MB batches); at dim 1536 it would be ~400 MB per in-flight
  batch per worker.

Usage: python tools/wide1m_probe.py [n_rows] [dim] [nlist] [out_json]
Run with SPARK_DRIVER_MEMORY=24g (r9: spill politely instead of
ballooning into the host's ~30 GB OOM ceiling).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def du_bytes(path: str) -> int:
    return int(
        subprocess.run(
            ["du", "-sb", path], capture_output=True, text=True, check=True
        ).stdout.split()[0]
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 1536
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    out_path = sys.argv[4] if len(sys.argv) > 4 else "tools/out_r11/wide1m.json"

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark
    from tools._synth import synth_clusterable

    spark = get_spark(
        "wide1m-probe",
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)
    params = {"train_points_per_centroid": "32", "train_max_iter": "10"}

    def loadavg() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    out = {"n": n, "dim": dim, "nlist": nlist, "params": params,
           "load_start": loadavg()}

    corpus = synth_clusterable(spark, n, dim, n_clusters=1024).persist()
    corpus.count()
    queries = corpus.limit(48).select(
        F.col("label").alias("qid"), F.col("vector")
    ).cache()
    queries.count()

    results = {}
    for tier, suffix in (("raw", ""), ("sq8", ",SQ8")):
        name = f"wide_{tier}"
        r = {}
        t0 = time.perf_counter()
        eng.create(
            name, dim, f"IDMap,IVF{nlist}{suffix}",
            metric_type="L2", params=params,
        )
        eng.add(name, corpus)
        r["build_sec"] = round(time.perf_counter() - t0, 1)
        r["build_load_1m"] = loadavg()
        idx = eng.registry.get(name)
        r["nlist_live"] = len(idx.centroids)
        with tempfile.TemporaryDirectory(prefix=f"wide1m_{tier}_") as td:
            p = os.path.join(td, "idx")
            t0 = time.perf_counter()
            eng.save(name, p)
            r["save_sec"] = round(time.perf_counter() - t0, 1)
            r["at_rest_bytes"] = du_bytes(p)
        r["warm_sec"] = round(eng.warm(name), 1)
        for np_ in (4, 16):
            run = lambda: eng.search_flat(  # noqa: E731
                name, 10, queries, params={"nprobe": np_}
            )
            t0 = time.perf_counter()
            run().count()
            r[f"search_np{np_}_sec"] = round(time.perf_counter() - t0, 2)
            r[f"hits_np{np_}"] = sorted(
                (int(x["qid"]), int(x["label"])) for x in run().collect()
            )
        if tier == "raw":
            t0 = time.perf_counter()
            exact = {
                (int(x["qid"]), int(x["label"]))
                for x in eng.search_flat(
                    name, 10, queries, params={"nprobe": r["nlist_live"]}
                ).collect()
            }
            r["exact_sec"] = round(time.perf_counter() - t0, 2)
            results["exact"] = exact
        r["search_load_1m"] = loadavg()
        results[tier] = r
        print(json.dumps({k: v for k, v in r.items()
                          if not k.startswith("hits_")}), flush=True)

    exact = results.pop("exact")
    for tier in ("raw", "sq8"):
        r = results[tier]
        for np_ in (4, 16):
            hits = set(map(tuple, r.pop(f"hits_np{np_}")))
            r[f"recall_np{np_}"] = round(len(hits & exact) / len(exact), 4)
    results["sq8_vs_raw_at_rest_ratio"] = round(
        results["raw"]["at_rest_bytes"] / results["sq8"]["at_rest_bytes"], 2
    )
    out["tiers"] = results
    out["load_end"] = loadavg()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
