"""Auto-rebalance-on-append at corpus scale (r11 feature receipt).

The r11 add() path re-runs the corpus rebalance pass when an append
drifts the running histogram over the skew cap (engine.py
_warn_if_corpus_drifted) — unit-tested at 2.4k rows; this probe is the
scale receipt: build 1M x 64 IVF2048 (cap enforced, mog corpus), then
append an adversarial 200k-row tight blob that lands in ONE cluster
(>25x the even share if left alone), and verify on the live index that

  * the cap invariant holds immediately after the add (no manual call),
  * no row is lost (histogram sums to 1.2M),
  * nlist growth stays within the 2x bound,
  * a self-hit search over appended rows is exact,

and price the feature: append-with-auto-pass wall time vs the same
append with rebalance_on_append=0 (warn-only control).

Usage: python tools/append_drift_probe.py [n_corpus] [n_blob] [out_json]
"""

import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyspark.sql.functions as F

from tools._synth import synth_clusterable


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nblob = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    out_path = (
        sys.argv[3] if len(sys.argv) > 3 else "tools/out_r11/append_drift.json"
    )
    nlist = 2048

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark(
        "append-drift", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)

    def loadavg() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    corp = synth_clusterable(spark, n, 64, n_clusters=1024).persist()
    corp.count()
    # adversarial blob: one tight gaussian far from [0,1)^64 — every row
    # assigns to the same nearest centroid
    blob = (
        spark.range(n, n + nblob, 1, 32)
        .select(
            F.col("id").alias("label"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda j: (
                    F.lit(5.0)
                    + (F.sin(F.col("id") * 997 + j) * 0.01)
                ).cast("float"),
            ).alias("vector"),
        )
    )

    out = {"n": n, "nblob": nblob, "nlist": nlist, "load_start": loadavg()}
    results = {}
    for mode, param in (("auto", "1"), ("warn_only", "0")):
        name = f"ad_{mode}"
        t0 = time.perf_counter()
        eng.create(
            name, 64, f"IDMap,IVF{nlist}", metric_type="L2",
            params={"rebalance_on_append": param},
        )
        eng.add(name, corp)
        build_sec = round(time.perf_counter() - t0, 1)
        idx = eng.registry.get(name)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            t0 = time.perf_counter()
            eng.add(name, blob)
            append_sec = round(time.perf_counter() - t0, 1)
        drift_warned = any("drifted" in str(c.message) for c in caught)
        hist = {
            int(r["cluster_id"]): int(r["cnt"])
            for r in idx.data.groupBy("cluster_id")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        total = sum(hist.values())
        cap = max(FaissSparkEngine.REBALANCE_CAP_SHARE * total / nlist, 32.0)
        q = blob.limit(8).select(F.col("label").alias("qid"), "vector")
        hits = eng.search_flat(
            name, 1, q, params={"nprobe": len(idx.centroids)}
        ).collect()
        results[mode] = {
            "build_sec": build_sec,
            "append_sec": append_sec,
            "drift_warned": drift_warned,
            "rows_total": total,
            "max_cluster": max(hist.values()),
            "cap_rows": round(cap),
            "max_share_vs_factory_even": round(
                max(hist.values()) * nlist / total, 2
            ),
            "under_cap": max(hist.values()) <= cap,
            "nlist_live": len(idx.centroids),
            "selfhit_ok": all(r["qid"] == r["label"] for r in hits),
            "load_1m": loadavg(),
        }
        print(json.dumps({mode: results[mode]}), flush=True)
        eng.destroy(name)

    out["modes"] = results
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
