"""Text curation pipeline: the pre-tokenization passes an LLM corpus runs.

Chains the text operators over the documents table in the shape that
holds at 100 TB — per-document signals are codegen scans, the only
corpus-wide shuffles move O(vocab) / O(gram-count) rows, never the text:

  1. curate    — curate_text(policy): ONE pass computes length, language,
                 quality, PII and the Gopher repetition signals, and gives
                 every document a disposition (kept / filtered:<rule>) —
                 curation must be auditable, silent drops poison
                 downstream statistics
  2. decontam  — ngram_contamination vs an evaluation set: any training
                 document sharing a normalized 13-gram with the benchmark
                 is dropped (the GPT-3 appendix-C method); the eval side
                 broadcasts
  3. scrub     — redact the survivors' remaining PII shapes
                 ([EMAIL]/[IP]/[SSN]/[CARD]/[PHONE] placeholders)
  4. vocabulary — corpus term/doc frequency in one scan + one aggregation
                 (33M tokens/s measured at 2M docs, SCALE.md r11);
                 boilerplate detector: tokens whose doc_freq ratio
                 exceeds BOILERPLATE_DF are reported
  5. mix       — deterministic per-source sampling to a token budget
                 (mix_rates + sample_corpus_mix: reproducible md5 draws,
                 monotone under budget growth)
  6. chunk     — overlapping fixed-char windows sized for an embedding
                 model's context (NULL-text docs keep their id row)
  7. pack      — sequence packing: chunks fill ~budget-token training
                 windows per source (pack_chunks, one window cumsum)

Run:  python examples/text_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_PII = 3          # drop docs with more PII hits than this (audit trail)
MIN_QUALITY = 0.15   # drop docs under this quality score
CONTAM_N = 13        # GPT-3 decontamination n-gram size
BOILERPLATE_DF = 0.5  # report tokens present in over half the corpus
CHUNK_CHARS, OVERLAP = 512, 64
PACK_TOKENS = 128  # training-sequence token budget for the packing stage


def run_pipeline(docs, eval_df=None, source_df=None, token_budget=None):
    from duckdb_faiss_ext_spark.functions.curation import (
        TextPolicy,
        curate_text,
        mix_rates,
        ngram_contamination,
        pack_chunks,
        sample_corpus_mix,
    )
    from duckdb_faiss_ext_spark.functions.text import (
        chunk_text,
        regex_token_count,
        scrub_pii,
        vocab_stats,
    )

    # 1. one-pass policy curation: every doc keeps its signal vector and
    # disposition; the status histogram IS the curation report
    policy = TextPolicy(max_pii_count=MAX_PII, min_quality=MIN_QUALITY)
    curated = curate_text(docs, policy).persist()
    status_counts = {
        r["status"]: r["count"]
        for r in curated.groupBy("status").count().collect()
    }
    kept_ids = curated.filter("status = 'kept'").select("doc_id")
    kept = docs.join(kept_ids, on="doc_id", how="left_semi")

    # 2. benchmark decontamination (skippable when no eval set is given)
    contam_dropped = 0
    if eval_df is not None:
        flags = ngram_contamination(kept, eval_df, n=CONTAM_N)
        contam_dropped = flags.filter("is_contaminated").count()
        kept = kept.join(
            flags.filter("NOT is_contaminated").select("doc_id"),
            on="doc_id",
            how="left_semi",
        )

    # 3. scrub the survivors (lang/quality already live in `curated`)
    clean = kept.select("doc_id", scrub_pii("text").alias("text"))

    # 4. vocabulary + boilerplate report
    n_docs = clean.count()
    vocab = vocab_stats(clean, min_count=2)
    boilerplate = (
        vocab.filter(F.col("doc_freq") > BOILERPLATE_DF * max(n_docs, 1))
        .orderBy(F.desc("doc_freq"))
        .limit(20)
        .collect()
    )

    # 5. deterministic mix to a per-source token budget (skippable)
    rates = {}
    if source_df is not None and token_budget:
        sourced = clean.join(source_df, on="doc_id").withColumn(
            "n_tokens", regex_token_count("text")
        )
        targets = {
            r["source"]: token_budget
            for r in sourced.select("source").distinct().collect()
        }
        rates = mix_rates(sourced, targets, size_col="n_tokens")
        clean = sample_corpus_mix(sourced, rates).select("doc_id", "text", "source")

    # 6. chunk for embedding/tokenization
    chunks = chunk_text(clean, chunk_chars=CHUNK_CHARS, overlap=OVERLAP)

    # 7. pack chunks into ~PACK_TOKENS-token training sequences
    n_packs = None
    if source_df is not None and token_budget:
        packed = pack_chunks(
            chunks.join(source_df, on="doc_id").withColumn(
                "n_tokens", regex_token_count("chunk")
            ),
            budget=PACK_TOKENS,
        )
        n_packs = packed.select("source", "pack_id").distinct().count()

    return {
        "docs_in": docs.count(),
        "docs_kept": n_docs,
        "statuses": status_counts,
        "contam_dropped": contam_dropped,
        "vocab_size": vocab.count(),
        "boilerplate_tokens": [r["token"] for r in boilerplate],
        "mix_rates": {k: round(v, 4) for k, v in rates.items()},
        "chunks": chunks.count(),
        "packs": n_packs,
    }


def main() -> None:
    from duckdb_faiss_ext_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("text-curation")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # demo eval set: a slice of the corpus itself, so the decontamination
    # stage provably fires (those docs collide with themselves)
    eval_df = docs.filter("doc_id % 97 = 0").select("text")
    stats = run_pipeline(
        docs.select("doc_id", "text"),
        eval_df,
        source_df=docs.select("doc_id", "source"),
        token_budget=2000,
    )
    import json

    print(json.dumps(stats))


if __name__ == "__main__":
    main()
