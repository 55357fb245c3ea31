"""Graph re-compaction probe (VERDICT r4 task 2 / r5 task 2 criteria).

Streams ``n_total / batch`` micro-batch adds into an ``IDMap,HNSW32``
index and compares against the single-bulk-add build on THREE axes —
ingest cost, search latency (48 queries, efSearch=128), recall@10 vs
exact IP — under two compaction policies:

- ``micro_rebuild``  — the r6 engine: TIERED (LSM-style) compaction every
  MAX_SLICES adds — only geometrically-similar micro slices merge and
  rebuild their graphs; slices already holding full-size segments are
  untouched (plus one final explicit ``compact()``, the streaming steady
  state).  ``rebuilt_rows`` counts every row that passed through a merge
  rebuild; ``write_amplification`` = (initial builds + rebuilds)/n —
  linear-total-work means this stays a small constant as n grows (the r5
  whole-corpus policy grew it with stream length).
- ``micro_norebuild`` — the r4 behavior, reproduced by patching
  ``_compact_index`` to the persist-only path: micro-graphs accumulate
  (one per add between compactions), beam cost is paid per (query,
  segment).

Pass criteria: micro_rebuild search latency and recall within ~1.2x of
bulk, AND write_amplification a small constant (~2-3x, vs the r5 policy's
n/(MAX_SLICES*batch) growth).  (Reference contrast: faiss inserts into
ONE growing graph — faiss_extension.cpp:505-532 — so its streamed index
never fragments.)

Usage: python tools/compaction_probe.py [n_total] [batch] [dim]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark
    from tools._synth import synth_vectors

    spark = get_spark("compaction-probe")
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)

    corpus = synth_vectors(spark, n_total, dim).persist()
    corpus.count()
    queries = corpus.limit(48).select(
        F.col("label").alias("qid"), F.col("vector")
    ).cache()
    queries.count()

    # exact ground truth for recall@10
    eng.create("cp_flat", dim, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("cp_flat", corpus)
    exact = {
        (r["qid"], r["label"])
        for r in eng.search_flat("cp_flat", 10, queries).collect()
    }

    def search_stats(name: str) -> tuple[float, float]:
        run = lambda: eng.search_flat(  # noqa: E731
            name, 10, queries, params={"efSearch": 128, "bulk_queries": 0}
        )
        run().count()  # warm
        sec = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run().count()
            sec = min(sec, time.perf_counter() - t0)
        hits = {(r["qid"], r["label"]) for r in run().collect()}
        return sec, len(hits & exact) / max(len(exact), 1)

    def segments(name: str) -> int:
        return eng.registry.get(name).data.select("graph_seg").distinct().count()

    results = []

    # --- A: single bulk add -------------------------------------------------
    t0 = time.perf_counter()
    eng.create("cp_bulk", dim, "IDMap,HNSW32", metric_type="INNER_PRODUCT")
    eng.add("cp_bulk", corpus)
    build = time.perf_counter() - t0
    sec, rec = search_stats("cp_bulk")
    results.append(
        {
            "scenario": "bulk",
            "build_sec": round(build, 2),
            "segments": segments("cp_bulk"),
            "search_sec": round(sec, 3),
            "recall_at_10": round(rec, 4),
        }
    )
    print(json.dumps(results[-1]), flush=True)
    eng.destroy("cp_bulk")

    # --- B/C: micro-batch adds, with and without graph rebuild --------------
    slices = [
        corpus.filter((F.col("label") >= lo) & (F.col("label") < lo + batch))
        for lo in range(0, n_total, batch)
    ]

    def run_micro(name: str, rebuild: bool) -> dict:
        if not rebuild:
            # reproduce the r4 persist-only compaction for the A/B
            orig = FaissSparkEngine._compact_index

            def persist_only(self, idx, full=False):
                compacted = idx.data.persist()
                compacted.count()
                self._unpersist_slices(idx)
                idx.data = compacted
                idx.slices = [compacted]
                idx.slice_rows = [int(idx.count)]

            FaissSparkEngine._compact_index = persist_only
        rebuilt = []
        if rebuild:
            orig_rb = eng._rebuild_graph_over

            def counting(idx, df, n_rows, _o=orig_rb):
                rebuilt.append(int(n_rows))
                return _o(idx, df, n_rows)

            eng._rebuild_graph_over = counting
        try:
            t0 = time.perf_counter()
            eng.create(name, dim, "IDMap,HNSW32", metric_type="INNER_PRODUCT")
            for s in slices:
                eng.add(name, s, validate=False)
            if rebuild:
                eng.compact(name)  # streaming steady state ends on a compact
            build = time.perf_counter() - t0
        finally:
            if not rebuild:
                FaissSparkEngine._compact_index = orig
            else:
                eng._rebuild_graph_over = orig_rb
        sec, rec = search_stats(name)
        out = {
            "scenario": "micro_rebuild" if rebuild else "micro_norebuild",
            "n_adds": len(slices),
            "build_sec": round(build, 2),
            "segments": segments(name),
            "search_sec": round(sec, 3),
            "recall_at_10": round(rec, 4),
        }
        if rebuild:
            out["rebuilt_rows"] = sum(rebuilt)
            out["n_merges"] = len(rebuilt)
            out["write_amplification"] = round((n_total + sum(rebuilt)) / n_total, 2)
        eng.destroy(name)
        return out

    for rebuild in (False, True):
        results.append(run_micro(f"cp_micro_{int(rebuild)}", rebuild))
        print(json.dumps(results[-1]), flush=True)

    bulk, noreb, reb = results
    print(
        json.dumps(
            {
                "summary": {
                    "n_total": n_total,
                    "batch": batch,
                    "dim": dim,
                    "search_ratio_rebuild_vs_bulk": round(
                        reb["search_sec"] / max(bulk["search_sec"], 1e-9), 3
                    ),
                    "search_ratio_norebuild_vs_bulk": round(
                        noreb["search_sec"] / max(bulk["search_sec"], 1e-9), 3
                    ),
                    "recall_delta_rebuild": round(
                        reb["recall_at_10"] - bulk["recall_at_10"], 4
                    ),
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
