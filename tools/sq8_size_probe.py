"""SQ8 at-rest size receipt (VERDICT r9 task 3 done-criterion): save()
the SAME 1M x 64 corpus through a raw Flat index and a Flat,SQ8 index and
compare the parquet directory bytes.

Usage: python tools/sq8_size_probe.py [n] [dim] [out_dir]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sq8_size_probe"

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark
    from tools._synth import synth_clusterable

    spark = get_spark("sq8-size")
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)
    corpus = synth_clusterable(spark, n, dim, n_clusters=1024).persist()
    corpus.count()
    shutil.rmtree(out, ignore_errors=True)
    res = {"n": n, "dim": dim}
    for name, fac in (("raw", "IDMap,Flat"), ("sq8", "IDMap,Flat,SQ8")):
        t0 = time.perf_counter()
        eng.create(f"sz_{name}", dim, fac, metric_type="L2")
        eng.add(f"sz_{name}", corpus)
        res[f"{name}_build_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        eng.save(f"sz_{name}", os.path.join(out, name))
        res[f"{name}_save_sec"] = round(time.perf_counter() - t0, 2)
        res[f"{name}_bytes"] = du(os.path.join(out, name))
    res["ratio_raw_over_sq8"] = round(res["raw_bytes"] / res["sq8_bytes"], 2)
    with open("/proc/loadavg") as f:
        res["load_1m"] = float(f.read().split()[0])
    print(json.dumps(res), flush=True)
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
