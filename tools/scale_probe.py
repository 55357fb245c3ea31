"""Scale probe: 1M x 64 synthetic vectors through the engine's real paths.

Generates a deterministic corpus ~500x larger than sf0.1's embeddings table
(pure codegen generation, 32 partitions — the multi-partition case the tiny
testdata files never exercise), then measures ingest, exact search, filtered
search, and IVF pruned search.  Run: python tools/scale_probe.py [n_rows]

Results are appended to SCALE.md at the repo root.
"""

from __future__ import annotations

import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = 64
    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic hash-derived vectors, fully codegen (README.md:58 style;
    # ONE shared definition across probes — tools/_synth.py)
    from tools._synth import synth_vectors

    gen = synth_vectors(spark, n, dim)

    eng = FaissSparkEngine(spark)
    results: dict[str, float] = {}

    t0 = time.perf_counter()
    eng.create("scale", dim, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("scale", gen, validate=False)
    results["ingest_sec"] = time.perf_counter() - t0
    results["ingest_rows_per_sec"] = n / results["ingest_sec"]

    idx = eng.registry.get("scale")
    qdf = idx.data.limit(48).select(
        F.col("label").alias("qid"), F.col("vector")
    ).cache()
    qdf.count()

    t0 = time.perf_counter()
    cnt = eng.search_flat("scale", 10, qdf).count()  # cold: worker spawn+codegen
    results["exact_knn48_cold_sec"] = time.perf_counter() - t0
    assert cnt == 480, cnt
    t0 = time.perf_counter()
    eng.search_flat("scale", 10, qdf).count()
    results["exact_knn48_warm_sec"] = time.perf_counter() - t0

    # dominance sanity: top-1 IP must be >= the query's self inner product
    # (self is in the corpus; IP self-hit is NOT guaranteed for unnormalized
    # vectors — a larger-norm neighbor may legitimately dominate)
    from duckdb_faiss_ext_spark.functions.vector import inner_product

    small_q = qdf.limit(4)
    self_ip = {
        r["qid"]: r["s"]
        for r in small_q.select(
            "qid", inner_product("vector", "vector").alias("s")
        ).collect()
    }
    res = eng.search_flat("scale", 1, small_q)
    ok = all(r["distance"] >= self_ip[r["qid"]] - 1e-3 for r in res.collect())
    results["top1_dominates_self"] = float(ok)

    # filtered search @1% selectivity via semi-join
    allowed = idx.data.filter(F.col("label") % 100 == 0).select("label")
    t0 = time.perf_counter()
    eng.search_flat("scale", 10, qdf, allowed_df=allowed).count()
    results["filtered_knn_p1_sec"] = time.perf_counter() - t0

    # IVF pruned search: train on a sample, nprobe=4/32 clusters — the path
    # that replaces full scans once the corpus outgrows one pass
    t0 = time.perf_counter()
    eng.create("scale_ivf", dim, "IDMap,IVF32,Flat", metric_type="INNER_PRODUCT")
    eng.add("scale_ivf", idx.data.select("label", "vector"), validate=False)
    results["ivf32_build_sec"] = time.perf_counter() - t0
    eng.search_flat("scale_ivf", 10, qdf, params={"nprobe": 4}).count()  # warm
    t0 = time.perf_counter()
    eng.search_flat("scale_ivf", 10, qdf, params={"nprobe": 4}).count()
    results["ivf_knn48_nprobe4_sec"] = time.perf_counter() - t0

    # LSH bucket-join ANN: training-free; candidates via (table, bucket) join.
    # The signature table is the index — built once, cached, searched many.
    # Buckets center on the corpus mean: this corpus lives entirely in the
    # positive orthant, where origin hyperplanes separate nothing.
    from duckdb_faiss_ext_spark.operators.lsh import (
        corpus_mean,
        lsh_ann_cosine,
        lsh_signatures,
    )

    lsh_q = qdf.limit(8)
    t0 = time.perf_counter()
    ctr = corpus_mean(idx.data, dim)
    sig = lsh_signatures(
        idx.data, dim, "label", "vector", n_planes=10, n_tables=4, center=ctr
    ).persist()  # 10 planes -> ~n/1024 rows per bucket
    sig.count()
    results["lsh_sig_build_sec"] = time.perf_counter() - t0

    def lsh_run():
        lsh_ann_cosine(
            idx.data, lsh_q, 10, dim, n_planes=10, n_tables=4,
            corpus_sig=sig, center=ctr,
        ).count()

    lsh_run()  # warm
    t0 = time.perf_counter()
    lsh_run()
    results["lsh_knn8_sec"] = time.perf_counter() - t0

    # --- round-2 paths: graph ANN, PQ compression, disk round-trip ---------
    exact_hits = {
        (r["qid"], r["label"])
        for r in eng.search_flat("scale", 10, qdf).collect()
    }

    t0 = time.perf_counter()
    eng.create("scale_hnsw", dim, "IDMap,HNSW32", metric_type="INNER_PRODUCT")
    eng.add("scale_hnsw", idx.data.select("label", "vector"), validate=False)
    results["hnsw32_build_sec"] = time.perf_counter() - t0
    eng.search_flat("scale_hnsw", 10, qdf, params={"efSearch": 128}).count()
    t0 = time.perf_counter()
    hnsw_hits = {
        (r["qid"], r["label"])
        for r in eng.search_flat(
            "scale_hnsw", 10, qdf, params={"efSearch": 128}
        ).collect()
    }
    results["hnsw_knn48_ef128_sec"] = time.perf_counter() - t0
    results["hnsw_recall_ef128"] = len(hnsw_hits & exact_hits) / len(exact_hits)

    # filtered GRAPH search @1% selectivity (r4): auto picks the survivor
    # scan here (beams widened by 1/sel lose the cost model); 'beam' forces
    # the masked-beam plan — the IDSelectorBitmap analog — so both physical
    # strategies stay measured.  Recall is vs the exact FILTERED top-k.
    allowed = idx.data.filter(F.col("label") % 100 == 0).select("label")
    fexact_hits = {
        (r["qid"], r["label"])
        for r in eng.search_flat("scale", 10, qdf, allowed_df=allowed).collect()
    }
    # forced beam at p=1% costs segments x (2k/sel)-widened walks — minutes
    # at 1M; the 50k A/B already records that trade, so big probes measure
    # only the auto choice
    for mode in ("auto", "beam") if n <= 200_000 else ("auto",):
        fparams = {"efSearch": 128, "graph_filter": mode}
        eng.search_flat(
            "scale_hnsw", 10, qdf, params=fparams, allowed_df=allowed
        ).count()  # warm
        t0 = time.perf_counter()
        fhits = {
            (r["qid"], r["label"])
            for r in eng.search_flat(
                "scale_hnsw", 10, qdf, params=fparams, allowed_df=allowed
            ).collect()
        }
        results[f"hnsw_filtered_p1_{mode}_sec"] = time.perf_counter() - t0
        results[f"hnsw_filtered_p1_{mode}_recall"] = (
            len(fhits & fexact_hits) / len(fexact_hits)
        )

    # the reference's headline composite shape (IVF2048_HNSW128 analog):
    # nprobe routes to clusters, a per-cluster NSW graph beams inside each
    t0 = time.perf_counter()
    eng.create(
        "scale_ivfhnsw", dim, "IDMap,IVF32_HNSW32", metric_type="INNER_PRODUCT"
    )
    eng.add("scale_ivfhnsw", idx.data.select("label", "vector"), validate=False)
    results["ivfhnsw_build_sec"] = time.perf_counter() - t0
    eng.search_flat(
        "scale_ivfhnsw", 10, qdf, params={"nprobe": 4, "efSearch": 64}
    ).count()
    t0 = time.perf_counter()
    ivfhnsw_hits = {
        (r["qid"], r["label"])
        for r in eng.search_flat(
            "scale_ivfhnsw", 10, qdf, params={"nprobe": 4, "efSearch": 64}
        ).collect()
    }
    results["ivfhnsw_knn48_sec"] = time.perf_counter() - t0
    results["ivfhnsw_recall_np4_ef64"] = (
        len(ivfhnsw_hits & exact_hits) / len(exact_hits)
    )

    t0 = time.perf_counter()
    eng.create("scale_ivfpq", dim, "IDMap,IVF32,PQ8", metric_type="L2")
    eng.add("scale_ivfpq", idx.data.select("label", "vector"), validate=False)
    results["ivfpq_build_sec"] = time.perf_counter() - t0
    eng.search_flat("scale_ivfpq", 10, qdf, params={"nprobe": 4}).count()
    t0 = time.perf_counter()
    eng.search_flat("scale_ivfpq", 10, qdf, params={"nprobe": 4}).count()
    results["ivfpq_knn48_nprobe4_sec"] = time.perf_counter() - t0

    # disk round-trip of the IVF index (cluster-partitioned parquet)
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="scale_idx_")
    try:
        t0 = time.perf_counter()
        eng.save("scale_ivf", d)
        results["ivf_save_sec"] = time.perf_counter() - t0
        eng.destroy("scale_ivf")
        t0 = time.perf_counter()
        eng.load("scale_ivf", d)
        eng.search_flat("scale_ivf", 10, qdf, params={"nprobe": 4}).count()
        results["ivf_load_plus_knn48_sec"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)

    # --- dedup at scale: synthetic docs, fully codegen -----------------------
    # ~40-word docs from a 5000-word vocab; every 10th doc clones doc id/10's
    # word stream, so LSH has ~ndocs/10 real positives to find.
    ndocs = max(n // 5, 100_000)
    seed = F.expr("CASE WHEN id % 10 = 0 THEN id DIV 10 ELSE id END")
    docs = spark.range(0, ndocs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda j: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(seed * 40 + j), F.lit(5000)),
                ),
            ),
        ).alias("text"),
    )
    from duckdb_faiss_ext_spark.operators.dedup import minhash_lsh_pairs

    run_dedup = lambda: minhash_lsh_pairs(  # noqa: E731
        docs, "doc_id", "text", 4, 2, shingle_n=3
    ).count()
    run_dedup()  # warm
    t0 = time.perf_counter()
    npairs = run_dedup()
    results["dedup_lsh_sec"] = time.perf_counter() - t0
    results["dedup_lsh_docs"] = float(ndocs)
    results["dedup_lsh_pairs"] = float(npairs)

    # host CPU contention context — without it, cross-probe comparisons on
    # this shared sandbox are not interpretable
    results["host_load_1m"] = os.getloadavg()[0]

    lines = [f"| {k} | {round(v, 2)} |" for k, v in results.items()]
    out = (
        f"\n## scale probe n={n:,} dim={dim} "
        f"(local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}])\n\n"
        "| metric | value |\n|---|---|\n" + "\n".join(lines) + "\n"
    )
    print(out)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE.md"), "a") as f:
        f.write(out)


if __name__ == "__main__":
    main()
