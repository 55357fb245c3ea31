"""Capture .explain('formatted') for the dedup pipeline's verify stage
(jaccard_verify_pairs) — an operator receipt for plans/r14 (the stage is
benched via dedup_pipeline_full but is not itself a declared query).

Usage: python tools/capture_verify_plan.py <before|after> [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from duckdb_faiss_ext_spark.operators.dedup import (
        exact_dedup,
        jaccard_verify_pairs,
        minhash_lsh_pairs,
    )
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("capture-verify-plan")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = exact_dedup(docs0, "doc_id", "text")
    cand = minhash_lsh_pairs(
        docs, "doc_id", "text", 4, 2, shingle_n=3, max_bucket=256,
        cap_mode="refine",
    ).select("id_a", "id_b").distinct()
    ver = jaccard_verify_pairs(docs, cand, "doc_id", "text", n=3, threshold=0.8)
    txt = ver._sc._jvm.PythonSQLUtils.explainString(
        ver._jdf.queryExecution(), "formatted"
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"dedup_pipeline_jaccard_verify_{tag}.txt")
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
