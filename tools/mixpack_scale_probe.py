"""Mix + pack at corpus scale (r11): the two post-curation stages.

2M synthetic docs (tools/_synth.synth_docs corpus) -> per-source token
budgets -> mix_rates (one aggregation) -> sample_corpus_mix (codegen
filter) -> chunk_text -> pack_chunks (per-source window cumsum).
Records wall time per stage plus the invariants that make the numbers
trustworthy: sampled token mass lands within sqrt-noise of each budget,
and packs respect the budget up to one chunk tail.

Usage: python tools/mixpack_scale_probe.py [n_docs] [out]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else "tools/out_r11b/mixpack_scale.json"
    )

    from _synth import synth_docs

    from duckdb_faiss_ext_spark.functions.curation import (
        mix_rates,
        pack_chunks,
        sample_corpus_mix,
    )
    from duckdb_faiss_ext_spark.functions.text import (
        chunk_text,
        regex_token_count,
    )
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark(
        "mixpack-scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    def loadavg() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    out = {"n_docs": n, "load_start": loadavg()}
    # 16 synthetic sources via doc_id ranges; budget = 1M tokens each
    docs = (
        synth_docs(spark, n, 120)
        .withColumn(
            "source",
            F.concat(F.lit("s"), (F.col("doc_id") % 16).cast("string")),
        )
        .withColumn("n_tokens", regex_token_count("text"))
        .persist()
    )
    t0 = time.perf_counter()
    docs.count()
    out["gen_sec"] = round(time.perf_counter() - t0, 1)

    budget = 1_000_000
    targets = {f"s{i}": budget for i in range(16)}
    t0 = time.perf_counter()
    rates = mix_rates(docs, targets, size_col="n_tokens")
    out["rates_sec"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    sampled = sample_corpus_mix(docs, rates).persist()
    got = {
        r["source"]: r["t"]
        for r in sampled.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    out["sample_sec"] = round(time.perf_counter() - t0, 1)
    # budget accuracy: per-source sampled tokens within 5% of target
    # (Bernoulli noise at ~8.3k docs/source/rate is well under that)
    out["budget_rel_err_max"] = round(
        max(abs(v - budget) / budget for v in got.values()), 4
    )
    out["mix_docs_per_sec"] = round(n / max(out["sample_sec"], 1e-9))

    # exact-count mode (VERDICT r11 task 4): per-source integer targets,
    # row_number-prefix selection on the same md5 draw.  The call is eager
    # (prefilter='auto' verifies selected == min(k, n) per source and
    # raises on mismatch); the receipt re-counts independently anyway.
    k_per_src = 8_000
    ktargets = {f"s{i}": k_per_src for i in range(16)}
    t0 = time.perf_counter()
    ex = sample_corpus_mix(docs, ktargets, exact=True).persist()
    exact_got = {
        r["source"]: r["n"]
        for r in ex.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    out["exact_sample_sec"] = round(time.perf_counter() - t0, 1)
    out["exact_budget_err_max"] = max(
        abs(v - k_per_src) for v in exact_got.values()
    )
    out["exact_docs_per_sec"] = round(n / max(out["exact_sample_sec"], 1e-9))
    ex.unpersist()

    t0 = time.perf_counter()
    chunks = chunk_text(
        sampled.select("doc_id", "text"), chunk_chars=256, overlap=32
    ).join(sampled.select("doc_id", "source"), on="doc_id").withColumn(
        "n_tokens", regex_token_count("chunk")
    )
    packed = pack_chunks(chunks, budget=512)
    agg = packed.groupBy("source", "pack_id").agg(
        F.sum("n_tokens").alias("t"), F.max("n_tokens").alias("m")
    )
    bad = agg.filter(F.col("t") - F.col("m") >= 512).count()
    out["n_packs"] = agg.count()
    out["pack_sec"] = round(time.perf_counter() - t0, 1)
    out["pack_invariant_violations"] = bad
    out["chunks"] = packed.count()
    out["pack_chunks_per_sec"] = round(out["chunks"] / max(out["pack_sec"], 1e-9))

    out["load_end"] = loadavg()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
