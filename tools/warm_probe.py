"""First-query warm affordance A/B (VERDICT r9 task 4).

r9 measured the first search after a build at 2.3-3.5x steady state
(16M np16 5.58 s first vs 1.61 steady; grouped simjoin 93.9 vs 41.1).
This probe prices engine.warm(): ONE fresh process per arm (the penalty
is per-session JIT + cold layout, so both arms must start cold):

  arm cold: build IVF2048 on 1M x 64 mog -> time first np16 search, then
            3 steady legs
  arm warm: build -> warm() (timed) -> time "first" np16 search, then 3
            steady legs

Done-criterion: warm-arm first leg ~= steady +/-20%, warm cost recorded.

Usage: python tools/warm_probe.py {cold|warm} [n] [dim] [nlist]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main() -> None:
    arm = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    nlist = int(sys.argv[4]) if len(sys.argv) > 4 else 2048

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark
    from tools._synth import synth_clusterable

    spark = get_spark("warm-probe")
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)

    corpus = synth_clusterable(spark, n, dim, n_clusters=1024).persist()
    corpus.count()
    queries = synth_clusterable(
        spark, 256, dim, n_clusters=1024, lo=n, id_col="qid"
    ).cache()
    queries.count()

    def load_1m() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    t0 = time.perf_counter()
    eng.create("wp", dim, f"IDMap,IVF{nlist}", metric_type="L2")
    eng.add("wp", corpus)
    build_sec = time.perf_counter() - t0

    warm_sec = None
    if arm == "warm":
        warm_sec = eng.warm("wp")

    legs = []
    for _ in range(4):
        t0 = time.perf_counter()
        eng.search_flat("wp", 10, queries, params={"nprobe": 16}).count()
        legs.append(round(time.perf_counter() - t0, 3))

    steady = sorted(legs[1:])[len(legs[1:]) // 2]
    print(
        json.dumps(
            {
                "arm": arm,
                "n": n,
                "dim": dim,
                "nlist": nlist,
                "build_sec": round(build_sec, 2),
                "warm_sec": round(warm_sec, 3) if warm_sec is not None else None,
                "first_leg_sec": legs[0],
                "steady_legs_sec": legs[1:],
                "first_over_steady": round(legs[0] / max(steady, 1e-9), 2),
                "load_1m": load_1m(),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
