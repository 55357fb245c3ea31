"""Within-session vs cross-session variance of the bulk grouped-join leg.

The r11 vec1m re-pin batch measured vec1m_bulk_np16 at 45.6 / 47.6 / 24.9 s
on three back-to-back runs of IDENTICAL code on an otherwise-idle host —
a 1.9x spread that any median pin inherits.  This probe separates the
candidate causes:

  * session/JIT state: the first bulk search in a session pays worker
    import + grouped-kernel JIT that later ones don't -> first leg high,
    repeats tight;
  * scheduling/ambient noise: repeats swing as much as sessions do;
  * plan instability: repeats tight but per-run `parts` (shuffle layout)
    differ.

Build the 1M x 64 IVF2048 index ONCE (same synth corpus as the bench
vec1m section), then run the same 20k-query bulk search N times in one
session, recording each timing + loadavg.

Usage: python tools/bulk_variance_probe.py [repeats] [out_json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._synth import synth_clusterable  # noqa: E402


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else "tools/out_r11/bulk_variance.json"
    )

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark(
        "bulk-variance", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)

    def loadavg() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    n1m, vdim, vnlist = 1_000_000, 64, 2048
    corp = synth_clusterable(spark, n1m, vdim, n_clusters=1024).persist()
    corp.count()
    t0 = time.perf_counter()
    eng.create("bv", vdim, f"IDMap,IVF{vnlist}", metric_type="L2")
    eng.add("bv", corp)
    build_sec = round(time.perf_counter() - t0, 1)
    eng.warm("bv")
    qbulk = synth_clusterable(
        spark, 20_000, vdim, n_clusters=1024, lo=n1m + 256, id_col="qid"
    )

    legs = []
    for i in range(repeats):
        t0 = time.perf_counter()
        eng.search_flat(
            "bv", 10, qbulk, params={"nprobe": 16, "bulk_queries": 1}
        ).count()
        legs.append(
            {"i": i, "sec": round(time.perf_counter() - t0, 2),
             "load_1m": loadavg()}
        )
        print(json.dumps(legs[-1]), flush=True)

    out = {"build_sec": build_sec, "legs": legs,
           "secs": [x["sec"] for x in legs]}
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
