"""Scale probe: similarity join over >=1M-row vector tables with NO driver
streaming (VERDICT r3 task 3 done-criterion).

Two measurements, printed as one JSON line each:
1. exact block-nested-loop: 1M left x 64k right, k=10 — the exact path's
   throughput envelope (cost is inherently |L|*|R|*d).
2. LSH bucket join: 1M x 1M self-join, k=10 — the corpus x corpus scale
   path; quality check = fraction of left rows whose rank-0 hit is
   themselves at cosine ~1.0 (identical vectors always collide).

Usage: python tools/simjoin_probe.py [n_left] [n_right_exact] [dim]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def synth(spark, n, dim, seed, id_col="id"):
    cols = [F.rand(seed=seed + j) for j in range(dim)]
    return spark.range(n).select(
        F.col("id").alias(id_col),
        F.array(*[c.cast("float") for c in cols]).alias("vector"),
    )


def main():
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 16_384
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    from duckdb_faiss_ext_spark.session import get_spark
    from duckdb_faiss_ext_spark.operators.simjoin import (
        similarity_join,
        similarity_join_lsh,
    )

    spark = get_spark("simjoin_probe")
    spark.sparkContext.setLogLevel("ERROR")

    left = synth(spark, n_left, dim, 1).persist()
    left.count()
    right = synth(spark, n_right, dim, 2).persist()
    right.count()

    t0 = time.perf_counter()
    out = similarity_join(left, right, 10, metric="INNER_PRODUCT", bulk=True)
    n_out = out.count()
    t_exact = time.perf_counter() - t0
    print(json.dumps({
        "probe": "simjoin_exact_blocks", "n_left": n_left, "n_right": n_right,
        "dim": dim, "k": 10, "rows_out": n_out,
        "sec": round(t_exact, 2), "load_1m": round(os.getloadavg()[0], 1),
    }), flush=True)
    right.unpersist()

    # LSH self-join: both sides >= 1M rows
    r2 = left.select(F.col("id").alias("rid"), F.col("vector").alias("rv"))
    t0 = time.perf_counter()
    lsh = similarity_join_lsh(
        left, r2, 10, dim, right_id="rid", right_vec="rv",
        n_planes=20, n_tables=4,
    ).persist()
    n_out = lsh.count()
    t_lsh = time.perf_counter() - t0
    self_hits = lsh.filter(
        (F.col("rank") == 0) & (F.col("id") == F.col("rid"))
    ).count()
    rank0 = lsh.filter(F.col("rank") == 0).count()
    print(json.dumps({
        "probe": "simjoin_lsh_1m_x_1m", "n_left": n_left, "n_right": n_left,
        "dim": dim, "k": 10, "rows_out": n_out, "sec": round(t_lsh, 2),
        "rank0_self_hit_rate": round(self_hits / max(rank0, 1), 4),
        "load_1m": round(os.getloadavg()[0], 1),
    }), flush=True)


if __name__ == "__main__":
    main()
