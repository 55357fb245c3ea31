"""Text-pipeline operators at corpus scale (r11).

The text ops run in CORRECTNESS gates over 500-row fixtures; this probe
prices them where they matter — millions of documents — and specifically
exercises vocab_stats' distinct-aggregate under a Zipf-skewed vocabulary
(the regime where a naive plan's heaviest token dominates a partition).

Corpus: fully-codegen synthetic documents (no driver data, no UDF):
each doc = `words_per_doc` tokens drawn from a `vocab_n`-word synthetic
vocabulary with a power-law bias (idx = floor(vocab_n * h^3) — h uniform
-> ~cubic skew toward low indices, Zipf-ish), so a few tokens appear in
nearly every document while the tail is sparse.

Legs (each one full action + count/agg):
  gen_sec            materialize + cache the corpus
  vocab_sec          vocab_stats(): 1 scan, count + count_distinct
  vocab_rows         distinct tokens seen
  chunk_sec          chunk_text() explode, count of chunks
  scrub_sec          scrub_pii + pii_count over every doc
  quality_sec        quality_score + lang_id over every doc

Usage: python tools/text_scale_probe.py [n_docs] [words_per_doc] [out]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    wpd = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    out_path = (
        sys.argv[3] if len(sys.argv) > 3 else "tools/out_r11/text_scale.json"
    )
    vocab_n = 20_000

    from duckdb_faiss_ext_spark.functions.text import (
        chunk_text,
        lang_id,
        pii_count,
        quality_score,
        scrub_pii,
        vocab_stats,
    )
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark(
        "text-scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    def loadavg() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    # codegen word: "w" + zipf-ish index; codegen doc: wpd words joined
    def h(expr):
        s = F.sin(expr) * 43758.5453
        return s - F.floor(s)

    word = lambda j: F.concat(  # noqa: E731
        F.lit("w"),
        F.floor(
            F.pow(h(F.col("id") * 131 + j * 7919), 3.0) * vocab_n
        ).cast("int").cast("string"),
    )
    docs = (
        spark.range(0, n, 1, 64)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ", F.transform(F.sequence(F.lit(0), F.lit(wpd - 1)), word)
            ).alias("text"),
        )
        .persist()
    )
    out = {"n_docs": n, "words_per_doc": wpd, "vocab_n": vocab_n,
           "load_start": loadavg()}
    t0 = time.perf_counter()
    docs.count()
    out["gen_sec"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    vs = vocab_stats(docs, min_count=2)
    out["vocab_rows"] = vs.count()
    out["vocab_sec"] = round(time.perf_counter() - t0, 1)
    top = vs.orderBy(F.desc("doc_freq")).limit(3).collect()
    out["top_doc_freq"] = [
        {"token": r["token"], "tf": r["term_freq"], "df": r["doc_freq"]}
        for r in top
    ]

    t0 = time.perf_counter()
    out["chunk_rows"] = chunk_text(
        docs, chunk_chars=256, overlap=32
    ).count()
    out["chunk_sec"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    out["scrub_rows"] = docs.select(
        F.length(scrub_pii("text")).alias("L"), pii_count("text").alias("c")
    ).agg(F.sum("L"), F.sum("c")).collect()[0][0]
    out["scrub_sec"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    out["quality_rows"] = docs.select(
        quality_score("text").alias("q"), lang_id("text").alias("l")
    ).groupBy("l").agg(F.avg("q")).count()
    out["quality_sec"] = round(time.perf_counter() - t0, 1)

    out["tokens_total"] = n * wpd
    out["vocab_tokens_per_sec"] = round(n * wpd / max(out["vocab_sec"], 1e-9))
    out["load_end"] = loadavg()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
