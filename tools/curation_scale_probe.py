"""Curation operators at corpus scale (r11).

repetition_signals / ngram_contamination / curate_text run in pytest over
500-row fixtures; this probe prices them at millions of documents.  The
repetition pass is the expensive one by construction: with the default
Gopher n set (2,3,4 top + 5..10 dup) every document explodes into
~9x its token count of (doc, n, gram) rows before the partial aggregate
collapses them — the probe records the end-to-end rate so the 100 TB
sizing math has a measured constant.

Corpus: same fully-codegen Zipf-ish synthetic documents as
tools/text_scale_probe.py (no driver data, no UDFs), with every 1000th
document made degenerate ("spam spam spam ...") so the signals have
something to catch and the policy splits the corpus into real classes.

Legs (each one full action):
  gen_sec        materialize + cache the corpus
  rep_sec        repetition_signals, default Gopher n set, full agg
  contam_sec     ngram_contamination vs a 1k-doc eval slice (n=13)
  curate_sec     curate_text with the default TextPolicy, status counts

Usage: python tools/curation_scale_probe.py [n_docs] [words_per_doc] [out]
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
        sys.argv[3] if len(sys.argv) > 3 else "tools/out_r11b/curation_scale.json"
    )
    vocab_n = 20_000

    from duckdb_faiss_ext_spark.functions.curation import (
        TextPolicy,
        curate_text,
        ngram_contamination,
        repetition_signals,
    )
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark(
        "curation-scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    def loadavg() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    from _synth import synth_docs

    docs = synth_docs(
        spark, n, wpd, vocab_n=vocab_n, degenerate_every=1000
    ).persist()
    out = {"n_docs": n, "words_per_doc": wpd, "vocab_n": vocab_n,
           "load_start": loadavg()}
    t0 = time.perf_counter()
    docs.count()
    out["gen_sec"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    rep = repetition_signals(docs)
    flagged = rep.filter(F.col("top_2gram_char_frac") > 0.5).count()
    out["rep_sec"] = round(time.perf_counter() - t0, 1)
    out["rep_flagged_degenerate"] = flagged
    out["rep_expected_degenerate"] = (n + 999) // 1000
    out["rep_tokens_per_sec"] = round(n * wpd / max(out["rep_sec"], 1e-9))

    ev = docs.filter(F.col("doc_id") % 2111 == 0).select("text")
    t0 = time.perf_counter()
    cont = ngram_contamination(docs, ev, n=13)
    out["contam_flagged"] = cont.filter("is_contaminated").count()
    out["contam_sec"] = round(time.perf_counter() - t0, 1)
    out["contam_eval_docs"] = ev.count()
    out["contam_docs_per_sec"] = round(n / max(out["contam_sec"], 1e-9))

    t0 = time.perf_counter()
    cur = curate_text(docs, TextPolicy())
    counts = {
        r["status"]: r["count"]
        for r in cur.groupBy("status").count().collect()
    }
    out["curate_sec"] = round(time.perf_counter() - t0, 1)
    out["curate_statuses"] = counts
    out["curate_docs_per_sec"] = round(n / max(out["curate_sec"], 1e-9))

    out["load_end"] = loadavg()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
