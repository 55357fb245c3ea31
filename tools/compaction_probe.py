"""Graph re-compaction probe (VERDICT r4 task 2 done-criterion).

Streams ``n_total / batch`` micro-batch adds into an ``IDMap,HNSW32``
index and compares against the single-bulk-add build on THREE axes —
ingest cost, search latency (48 queries, efSearch=128), recall@10 vs
exact IP — under two compaction policies:

- ``micro_rebuild``  — the r5 engine: every MAX_SLICES adds the union is
  materialized AND segment graphs are rebuilt over it (plus one final
  explicit ``compact()`` after the last add, the streaming steady state);
- ``micro_norebuild`` — the r4 behavior, reproduced by patching
  ``_compact_index`` to the persist-only path: micro-graphs accumulate
  (one per add between compactions), beam cost is paid per (query,
  segment).

Pass criterion: micro_rebuild search latency and recall within ~1.2x of
bulk.  (Reference contrast: faiss inserts into ONE growing graph —
faiss_extension.cpp:505-532 — so its streamed index never fragments.)

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

            def persist_only(self, idx):
                compacted = idx.data.persist()
                compacted.count()
                self._unpersist_slices(idx)
                idx.data = compacted
                idx.slices = [compacted]

            FaissSparkEngine._compact_index = persist_only
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
        sec, rec = search_stats(name)
        out = {
            "scenario": "micro_rebuild" if rebuild else "micro_norebuild",
            "n_adds": len(slices),
            "build_sec": round(build, 2),
            "segments": segments(name),
            "search_sec": round(sec, 3),
            "recall_at_10": round(rec, 4),
        }
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
