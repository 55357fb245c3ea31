"""ivf_build_sec in-suite-vs-standalone gap (VERDICT r8 task 2).

BENCH recorded ~8.2 s two rounds running while the same build standalone-
quiet runs 4.5-4.7 s.  bench.py now phase-times the build (fit vs
assign/persist) and logs load + JVM heap; this probe produces the
STANDALONE side of that comparison with the identical phase split, plus a
"warm suite" variant that first caches the embeddings table and runs the
bench's earlier sections' cache load (exact flat index + 48-query searches)
to test the memory-pressure hypothesis.

Usage: python tools/build_insuite_gap.py [sf_dir] [cycles]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("build-gap")
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)
    rt = spark._jvm.java.lang.Runtime.getRuntime()

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])

    def heap_mb() -> int:
        return round((rt.totalMemory() - rt.freeMemory()) / 1e6)

    def one_build(tag: str) -> None:
        name = f"gap_{tag}"
        pre = {"load_1m": loadavg(), "heap_used_mb": heap_mb()}
        t0 = time.perf_counter()
        eng.create(name, dim, "IDMap,IVF16,Flat", metric_type="INNER_PRODUCT")
        eng.manual_train(name, emb.select("embedding"))
        t1 = time.perf_counter()
        eng.add(name, emb.select("vec_id", "embedding"))
        t2 = time.perf_counter()
        print(json.dumps({
            "tag": tag, "fit_sec": round(t1 - t0, 3),
            "assign_sec": round(t2 - t1, 3), "total_sec": round(t2 - t0, 3),
            **pre, "load_after": loadavg(),
        }), flush=True)
        eng.destroy(name)

    print(json.dumps({"n": n, "dim": dim, "load_start": loadavg()}), flush=True)
    for c in range(cycles):
        one_build(f"cold{c}")

    # warm-suite variant: replicate the bench's pre-IVF cache state — exact
    # flat index over the corpus + repeated 48-query searches + filtered
    # searches, then build again
    qdf48 = (
        emb.limit(48)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("vector"))
        .cache()
    )
    qdf48.count()
    eng.create("gap_flat", dim, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("gap_flat", emb.select("vec_id", "embedding"))
    for _ in range(6):
        eng.search_flat("gap_flat", 10, qdf48).count()
    emb.createOrReplaceTempView("gap_embeddings")
    for p in (1, 10, 50, 90):
        eng.search_filter(
            "gap_flat", 10, qdf48, f"vec_id % 100 < {p}", "vec_id",
            "gap_embeddings",
        ).count()
    for c in range(cycles):
        one_build(f"warmsuite{c}")


if __name__ == "__main__":
    main()
