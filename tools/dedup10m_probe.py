"""MinHash dedup pipeline receipt at >= 10M docs with a band-bucket skew
audit (VERDICT r11 task 5).

The 5-stage pipeline is benched at sf0.1 (20k docs) and was probed at 1M in
r4 — BEFORE the r9/r10 skew machinery and before the loud cap_stats audit
existed.  At 10M+, banded LSH buckets develop their own heavy hitters
(boilerplate grams), so this probe records, per stage: wall time, the
largest band bucket, cap-hit counts and dropped member rows — verifying the
truncation is LOUD (counted in the result), never silent.

Corpus (same structure as tools/dedup_probe.py, scaled):
- 2% members of GIANT boilerplate cliques (1000 docs per template, 3 exact
  variants each — the m² blowup max_bucket exists for);
- 18% small dup groups (4 near-identical variants);
- 80% unique hash-derived word soup.

Stages mirror examples/dedup_pipeline.py's text path (the semantic
embedding stage is a different operator family with its own 1M receipts in
SCALE.md r4/r11):
  1. exact dedup (md5 groupBy, min-id survivor)
  2. MinHash banded-LSH candidates, max_bucket=256, cap_stats audit ON
  3. exact 3-gram Jaccard computed per candidate pair
  4. connected-components survivors (max_degree=16)

Run:  python tools/dedup10m_probe.py [n_docs] [cap_mode]
      (defaults 10_000_000, refine)
r14 (VERDICT r13 task 5): default cap_mode is now 'refine' — the r12 10M
receipt used drop mode, and the r13 cap-recall study measured drop losing
~18% of verified pairs on exactly this boilerplate-clique profile.  The
receipt records refined_docs / refined residual-drop stats alongside the
stage times so the r12 drop-mode numbers have a like-for-like refine twin.
Appends the receipt to SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_corpus(spark, n: int):
    """Deterministic clique-structured corpus, fully codegen."""
    n_giant = max(n // 50_000, 1)          # 200 cliques of 1000 at 10M
    giant_sz = 1000
    n_small_groups = max(n * 18 // 100 // 4, 1)
    return spark.range(0, n, 1, 128).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_giant * giant_sz,
            F.concat(
                F.lit("terms of service boilerplate template "),
                (F.col("id") / giant_sz).cast("bigint").cast("string"),
                F.lit(" all rights reserved standard clause text variant "),
                (F.col("id") % 3).cast("string"),
            ),
        )
        .when(
            F.col("id") < n_giant * giant_sz + n_small_groups * 4,
            F.concat(
                F.lit("document template number "),
                ((F.col("id") - n_giant * giant_sz) / 4)
                .cast("bigint")
                .cast("string"),
                F.lit(" shared content body sentence alpha beta gamma "),
                (F.col("id") % 4).cast("string"),
            ),
        )
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("id").cast("string"), F.lit(f"w{i}")
                                )
                            ),
                            1,
                            6,
                        ),
                        16,
                        10,
                    )
                    for i in range(12)
                ],
            )
        )
        .alias("text"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cap_mode = sys.argv[2] if len(sys.argv) > 2 else "refine"
    from duckdb_faiss_ext_spark.operators.dedup import (
        exact_dedup,
        jaccard_verify_pairs,
        minhash_lsh_pairs,
        neardup_survivors,
    )
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("dedup10m-probe")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {}
    results["host_load_start"] = round(os.getloadavg()[0], 2)
    docs0 = synth_corpus(spark, n).persist()
    results["n_docs"] = docs0.count()

    # 1. exact dedup --------------------------------------------------------
    t0 = time.perf_counter()
    docs = exact_dedup(docs0, "doc_id", "text").persist()
    results["after_exact"] = docs.count()
    results["exact_sec"] = round(time.perf_counter() - t0, 2)
    docs0.unpersist()

    # 2. banded-LSH candidates with the LOUD cap audit ------------------------
    t0 = time.perf_counter()
    cap: dict = {}
    cand = (
        minhash_lsh_pairs(
            docs, "doc_id", "text", 4, 2, shingle_n=3, max_bucket=256,
            cap_stats=cap, cap_mode=cap_mode,
        )
        .select("id_a", "id_b")
        .distinct()
        .persist()
    )
    results["cap_mode"] = cap_mode
    results["lsh_candidate_pairs"] = cand.count()
    results["lsh_sec"] = round(time.perf_counter() - t0, 2)
    results["lsh_largest_bucket"] = cap.get("largest_bucket")
    results["lsh_bucket_cap_hits"] = cap.get("bucket_cap_hits")
    results["lsh_bucket_cap_dropped_rows"] = cap.get("bucket_cap_dropped_rows")
    if cap_mode == "refine":
        results["lsh_refined_docs"] = cap.get("refined_docs")
        results["lsh_refined_bucket_cap_hits"] = cap.get(
            "refined_bucket_cap_hits"
        )
        results["lsh_refined_dropped_rows"] = cap.get("refined_dropped_rows")

    # 3. Jaccard verify, per candidate pair (O(|pairs|) — the gram
    # self-join variant measured 61 s for 17k pairs at 200k docs) --------------
    t0 = time.perf_counter()
    verified = jaccard_verify_pairs(
        docs, cand, "doc_id", "text", n=3, threshold=0.8
    ).persist()
    results["jaccard_verified"] = verified.count()
    results["jaccard_sec"] = round(time.perf_counter() - t0, 2)

    # 4. survivors -------------------------------------------------------------
    t0 = time.perf_counter()
    clean = neardup_survivors(
        docs, verified.select("id_a", "id_b"), "doc_id", max_degree=16
    )
    results["clean_docs"] = clean.count()
    results["survivors_sec"] = round(time.perf_counter() - t0, 2)
    results["host_load_end"] = round(os.getloadavg()[0], 2)

    lines = [
        f"\n## dedup 10M receipt n={results['n_docs']:,} docs "
        f"(max_bucket=256, cap_mode={cap_mode}, max_degree=16) — r14\n",
        "| metric | value |",
        "|---|---|",
    ]
    for k, v in results.items():
        lines.append(f"| {k} | {v} |")
    out = "\n".join(lines) + "\n"
    print(out)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SCALE.md"), "a") as f:
        f.write(out)


if __name__ == "__main__":
    main()
