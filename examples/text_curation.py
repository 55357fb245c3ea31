"""Text curation pipeline: the pre-tokenization passes an LLM corpus runs.

Chains the text operators (functions/text.py) over the documents table,
each stage one codegen scan — the shape that holds at 100 TB because
nothing here shuffles the text column except the vocabulary aggregation
(which moves O(vocab) rows, not the corpus):

  1. audit     — pii_count + quality_score + lang_id per doc (one scan);
                 documents over the PII budget or under the quality floor
                 are dropped WITH a recorded reason (curation must be
                 auditable — silent drops poison downstream statistics)
  2. scrub     — redact the surviving docs' remaining PII shapes
                 ([EMAIL]/[IP]/[SSN]/[CARD]/[PHONE] placeholders)
  3. vocabulary — corpus term/doc frequency in one scan + one aggregation
                 (33M tokens/s measured at 2M docs, SCALE.md r11);
                 boilerplate detector: tokens whose doc_freq ratio
                 exceeds BOILERPLATE_DF are reported
  4. chunk     — overlapping fixed-char windows sized for an embedding
                 model's context (NULL-text docs keep their id row)

Run:  python examples/text_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_PII = 3          # drop docs with more PII hits than this (audit trail)
MIN_QUALITY = 0.15   # drop docs under this quality score
BOILERPLATE_DF = 0.5  # report tokens present in over half the corpus
CHUNK_CHARS, OVERLAP = 512, 64


def run_pipeline(docs):
    from duckdb_faiss_ext_spark.functions.text import (
        chunk_text,
        lang_id,
        pii_count,
        quality_score,
        scrub_pii,
        vocab_stats,
    )

    # 1. audit: one scan computes every per-doc signal
    audited = docs.select(
        "doc_id",
        "text",
        pii_count("text").alias("pii_hits"),
        quality_score("text").alias("quality"),
        lang_id("text").alias("lang"),
    ).withColumn(
        "drop_reason",
        F.when(F.col("pii_hits") > MAX_PII, F.lit("pii_budget"))
        .when(F.col("quality") < MIN_QUALITY, F.lit("low_quality"))
        .otherwise(F.lit(None)),
    ).persist()
    dropped = (
        audited.filter("drop_reason IS NOT NULL")
        .groupBy("drop_reason")
        .count()
        .collect()
    )
    kept = audited.filter("drop_reason IS NULL")

    # 2. scrub the survivors
    clean = kept.select(
        "doc_id", "lang", "quality", scrub_pii("text").alias("text")
    )

    # 3. vocabulary + boilerplate report
    n_docs = kept.count()
    vocab = vocab_stats(clean, min_count=2)
    boilerplate = (
        vocab.filter(F.col("doc_freq") > BOILERPLATE_DF * n_docs)
        .orderBy(F.desc("doc_freq"))
        .limit(20)
        .collect()
    )

    # 4. chunk for embedding/tokenization
    chunks = chunk_text(clean, chunk_chars=CHUNK_CHARS, overlap=OVERLAP)

    return {
        "docs_in": docs.count(),
        "docs_kept": n_docs,
        "drops": {r["drop_reason"]: r["count"] for r in dropped},
        "vocab_size": vocab.count(),
        "boilerplate_tokens": [r["token"] for r in boilerplate],
        "chunks": chunks.count(),
    }


def main() -> None:
    from duckdb_faiss_ext_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("text-curation")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    stats = run_pipeline(docs.select("doc_id", "text"))
    import json

    print(json.dumps(stats))


if __name__ == "__main__":
    main()
