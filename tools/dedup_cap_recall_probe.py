"""What does the band-bucket cap COST in recall?  (VERDICT r12 task 4)

The 10M receipt (SCALE.md r12) dropped 8 over-cap buckets / 1.71M member
rows and asserted their members "still pair through their other, more
selective bands" — plausible but unmeasured.  This probe measures it on a
corpus slice with the SAME clique/boilerplate profile as the 10M probe
(reuses its synth), small enough that the UNCAPPED pipeline is feasible:

  capped   = minhash_lsh_pairs(max_bucket=256) -> jaccard verify -> survivors
  uncapped = identical, max_bucket=None (ground truth)

Reported (appended to SCALE.md):
- candidate_pair_recall: |capped cand ∩ uncapped cand| / |uncapped cand|
  (context only — most cross-group candidates FAIL verification, so
  losing them costs compute savings, not dedup quality)
- verified_pair_recall: same ratio over pairs that PASS Jaccard >= 0.8 —
  the recall that matters (a lost verified pair is a missed duplicate)
- survivor_agreement + dropped_doc_recall: does the final keep/drop
  decision change?  dropped_doc_recall = fraction of the uncapped run's
  dropped (= detected-duplicate) docs the capped run also drops.

Run:  python tools/dedup_cap_recall_probe.py [n_docs]   (default 200_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dedup10m_probe import synth_corpus  # same boilerplate profile


def run_variant(docs, max_bucket, cap_mode="drop"):
    from duckdb_faiss_ext_spark.operators.dedup import (
        jaccard_verify_pairs,
        minhash_lsh_pairs,
        neardup_survivors,
    )

    out: dict = {}
    t0 = time.perf_counter()
    cap: dict = {}
    cand = (
        minhash_lsh_pairs(
            docs, "doc_id", "text", 4, 2, shingle_n=3, max_bucket=max_bucket,
            cap_stats=cap, cap_mode=cap_mode,
        )
        .select("id_a", "id_b")
        .distinct()
        .persist()
    )
    out["candidate_pairs"] = cand.count()
    out["lsh_sec"] = round(time.perf_counter() - t0, 2)
    out["largest_bucket"] = cap.get("largest_bucket")
    out["cap_hits"] = cap.get("bucket_cap_hits")
    out["cap_dropped_rows"] = cap.get("bucket_cap_dropped_rows")
    for k in ("refined_docs", "refined_bucket_cap_hits", "refined_dropped_rows"):
        if k in cap:
            out[k] = cap[k]

    t0 = time.perf_counter()
    verified = (
        jaccard_verify_pairs(docs, cand, "doc_id", "text", n=3, threshold=0.8)
        .select("id_a", "id_b")
        .persist()
    )
    out["verified_pairs"] = verified.count()
    out["verify_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    clean = neardup_survivors(
        docs, verified, "doc_id", max_degree=16
    ).select("doc_id").persist()
    out["clean_docs"] = clean.count()
    out["survivors_sec"] = round(time.perf_counter() - t0, 2)
    return out, cand, verified, clean


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from duckdb_faiss_ext_spark.operators.dedup import exact_dedup
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("dedup-cap-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {}
    results["host_load_start"] = round(os.getloadavg()[0], 2)
    docs0 = synth_corpus(spark, n).persist()
    results["n_docs"] = docs0.count()
    docs = exact_dedup(docs0, "doc_id", "text").persist()
    results["after_exact"] = docs.count()
    docs0.unpersist()

    capped, c_cand, c_ver, c_clean = run_variant(docs, 256)
    refined, r_cand, r_ver, r_clean = run_variant(docs, 256, cap_mode="refine")
    uncapped, u_cand, u_ver, u_clean = run_variant(docs, None)
    for k, v in capped.items():
        results[f"capped_{k}"] = v
    for k, v in refined.items():
        results[f"refine_{k}"] = v
    for k, v in uncapped.items():
        results[f"uncapped_{k}"] = v

    # recall of the capped run against the uncapped ground truth
    results["candidate_pair_recall"] = round(
        c_cand.join(u_cand, ["id_a", "id_b"], "left_semi").count()
        / max(uncapped["candidate_pairs"], 1),
        6,
    )
    results["verified_pair_recall"] = round(
        c_ver.join(u_ver, ["id_a", "id_b"], "left_semi").count()
        / max(uncapped["verified_pairs"], 1),
        6,
    )
    results["refine_candidate_pair_recall"] = round(
        r_cand.join(u_cand, ["id_a", "id_b"], "left_semi").count()
        / max(uncapped["candidate_pairs"], 1),
        6,
    )
    results["refine_verified_pair_recall"] = round(
        r_ver.join(u_ver, ["id_a", "id_b"], "left_semi").count()
        / max(uncapped["verified_pairs"], 1),
        6,
    )
    # final keep/drop decisions: dropped = detected duplicate
    all_ids = docs.select("doc_id")
    u_dropped = all_ids.subtract(u_clean).persist()
    c_dropped = all_ids.subtract(c_clean).persist()
    r_dropped = all_ids.subtract(r_clean).persist()
    n_u_dropped = u_dropped.count()
    results["uncapped_dropped_docs"] = n_u_dropped
    results["capped_dropped_docs"] = c_dropped.count()
    results["refine_dropped_docs"] = r_dropped.count()
    results["dropped_doc_recall"] = round(
        c_dropped.join(u_dropped, "doc_id", "left_semi").count()
        / max(n_u_dropped, 1),
        6,
    )
    results["refine_dropped_doc_recall"] = round(
        r_dropped.join(u_dropped, "doc_id", "left_semi").count()
        / max(n_u_dropped, 1),
        6,
    )
    results["survivor_agreement"] = round(
        1.0
        - (
            c_clean.subtract(u_clean).count()
            + u_clean.subtract(c_clean).count()
        )
        / max(results["uncapped_clean_docs"], 1),
        6,
    )
    results["host_load_end"] = round(os.getloadavg()[0], 2)

    lines = [
        f"\n## dedup bucket-cap recall receipt n={results['n_docs']:,} docs "
        "(max_bucket=256 drop vs refine vs uncapped ground truth) — r13\n",
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
