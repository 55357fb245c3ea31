"""Reference-scale corpus receipt: 8,841,823 x 1536 — the reference's own
bench shape (VERDICT r12 task 2).

The reference benches 8,841,823 x 1536 real embeddings
(go/benches_c.go:31,:87; BASELINE.md row 1) with `IVF2048_HNSW128,Flat` at
nprobe=15, k=10, plus a k=1000 / nprobe=32 conformance run
(go/cmd/create_trec/main.go:32).  Every receipt in SCALE.md so far tops out
at 1M x 1536 (wide) or 16M x 64 (narrow); this probe measures the exact
published configuration end-to-end, per storage tier:

  raw IVF2048      — build, skew receipt (max_share), warm, knn np4/15/16,
                     filtered p in {1, 50} at np16, exact (fullprobe)
                     ground truth, recall@10, k=1000/np32 conformance timing
  IVF2048,SQ8      — build, at-rest bytes (save), warm, knn np4/15/16,
                     filtered p in {1, 50}, recall@10 vs the raw exact
  IVF2048_HNSW32   — min_graph_rows=0 so per-cluster graphs ACTUALLY build
                     (~4.3k rows/cluster at 8.8M/2048; the default
                     threshold would silently degrade to plain IVF), knn
                     np15 (the reference's operating point), recall@10,
                     k=1000/np32 conformance timing.
                     Documented deviation from the reference's HNSW128
                     string: in FAISS that 128 is the COARSE QUANTIZER's
                     HNSW degree (a graph over the 2048 centroids); this
                     engine's IVFn_HNSWm builds per-cluster NSW graphs of
                     degree m over the CORPUS.  Degree-128 corpus graphs
                     cost 92.5 s/cluster single-core at 4318 x 1536
                     (measured; ~98 min for the stage) for no recall need
                     at 4.3k rows/cluster; degree 32 (7.2 s/cluster) is
                     the engine's operating point at this shape.

Feasibility bookkeeping (128 GiB host, ~80 GB free disk):
- The synth corpus is NOT persisted: 54 GB f32 would evict everything
  else; the mog generator is pure codegen (hash-sin per element) and a
  full recompute pass costs ~1-2 min — each tier's add() re-derives it.
- Tiers run SEQUENTIALLY with destroy() between: peak resident index is
  one tier (raw 54 GB spills politely under SPARK_DRIVER_MEMORY=96g).
- raw save() is SKIPPED (54 GB parquet against 80 GB free disk; the
  3.84x at-rest ratio is already pinned at 1M x 1536, SCALE.md r11);
  the SQ8 save (13.6 GB) runs and records at-rest bytes.
- Fit caps follow the wide1m precedent (train_points_per_centroid=32,
  train_max_iter=10 — documented deviation; recall is judged against the
  exact scan on the SAME corpus so a shallow fit shows up IN the numbers).
- Arrow maxRecordsPerBatch=8192 (the dim-64 default 65536 would be
  ~400 MB per in-flight batch at dim 1536).

Usage: SPARK_DRIVER_MEMORY=56g python tools/ref_scale_probe.py \
           [n] [dim] [nlist] [out_json] [tiers]
(<= 56g heap, r13 OOM lesson: the JVM heap + 32 python Arrow workers share
the 125 GiB host; let the index cache spill rather than page the host out.)
tiers = comma list from {raw,sq8,graph} (default all three).
Appends a receipt table to SCALE.md when all requested tiers complete.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

N_REF = 8_841_823  # go/benches_c.go:31


def du_bytes(path: str) -> int:
    return int(
        subprocess.run(
            ["du", "-sb", path], capture_output=True, text=True, check=True
        ).stdout.split()[0]
    )


def disk_free_gb(path: str = "/root") -> float:
    st = os.statvfs(path)
    return st.f_bavail * st.f_frsize / 1e9


# Per-tier working-set disk estimate at n x dim f32 (VERDICT r13 task 2b:
# run 2 died ENOSPC during the raw add — 54 GB persisted corpus + f32
# cluster shuffle vs ~80 GB free.  The guard records an honest skip
# instead of a dead run).  raw/graph persist the full f32 corpus in the
# index cache (spilled blocks land on disk under a <= 56g heap) plus
# roughly one corpus of range-shuffle files during layout (shuffle files
# stay on disk until context teardown — they are referenced by the cached
# frame's recompute lineage).  sq8 encodes BEFORE the layout shuffle
# (engine r14): the exchange and the cache both carry int8 codes, ~0.3x
# corpus each with row overhead.
def tier_disk_need_gb(tier: str, n: int, dim: int) -> float:
    corpus_gb = n * dim * 4 / 1e9
    return {
        "raw": 2.0 * corpus_gb,
        "graph": 2.1 * corpus_gb,  # + adjacency lists (~small at deg 32)
        "sq8": 0.7 * corpus_gb,
    }[tier]


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_REF
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 1536
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    out_path = (
        sys.argv[4] if len(sys.argv) > 4 else "tools/out_r14/ref_scale.json"
    )
    tiers = (
        sys.argv[5].split(",") if len(sys.argv) > 5 else ["raw", "sq8", "graph"]
    )

    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark
    from tools._synth import synth_clusterable

    spark = get_spark(
        "ref-scale-probe",
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = FaissSparkEngine(spark)
    fit_params = {"train_points_per_centroid": "32", "train_max_iter": "10"}

    out: dict = {
        "n": n, "dim": dim, "nlist": nlist, "params": fit_params,
        "tiers": {}, "load_start": loadavg(),
        "disk_free_start_gb": round(disk_free_gb(), 1),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    def flush():
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)

    # ground-truth sidecar (r14): the r13 probe stored exact_hits inside the
    # main JSON and popped it from the FINAL flush for readability — which
    # broke tier-by-tier resume (a completed sq8-only run left no ground
    # truth for a later graph-only invocation).  The sidecar is the durable
    # cross-invocation channel; the main file stays readable.
    hits_path = out_path + ".hits.json"

    def save_hits(hits: set) -> None:
        with open(hits_path, "w") as f:
            json.dump(sorted(hits), f)

    def load_hits() -> set:
        if os.path.exists(hits_path):
            with open(hits_path) as f:
                return {tuple(x) for x in json.load(f)}
        return set()

    def disk_ok(tier: str) -> bool:
        """Disk-budget guard (VERDICT r13 task 2b): refuse to start a tier
        whose working set exceeds free disk; the skip IS the receipt."""
        need = tier_disk_need_gb(tier, n, dim)
        free = disk_free_gb()
        if free < need:
            out["tiers"][tier] = {
                "skipped": "disk_budget",
                "free_gb": round(free, 1),
                "need_gb": round(need, 1),
                "detail": (
                    "working set (index cache spill + cluster-layout "
                    "shuffle files) exceeds free disk on this host; see "
                    "tier_disk_need_gb for the per-tier model"
                ),
            }
            flush()
            print(json.dumps({tier: out["tiers"][tier]}), flush=True)
            return False
        return True

    def corpus():  # unpersisted by design (module docstring)
        return synth_clusterable(spark, n, dim, n_clusters=1024)

    queries = synth_clusterable(
        spark, 256, dim, n_clusters=1024, lo=n, id_col="qid"
    ).cache()
    queries.count()
    q_conf = synth_clusterable(
        spark, 48, dim, n_clusters=1024, lo=n + 256, id_col="qid"
    ).cache()
    q_conf.count()

    exact: set = set()

    def searches(name: str, r: dict, conformance: bool) -> dict:
        hits = {}
        for np_ in (4, 15, 16):
            run = lambda: eng.search_flat(  # noqa: E731
                name, 10, queries, params={"nprobe": np_}
            )
            t0 = time.perf_counter()
            run().count()
            r[f"knn_np{np_}_sec"] = round(time.perf_counter() - t0, 2)
            hits[np_] = {
                (int(x["qid"]), int(x["label"])) for x in run().collect()
            }
        for p in (1, 50):
            allowed = corpus().filter(F.col("label") % 100 < p).select("label")
            t0 = time.perf_counter()
            eng.search_flat(
                name, 10, queries, params={"nprobe": 16}, allowed_df=allowed
            ).count()
            r[f"filtered_p{p}_np16_sec"] = round(time.perf_counter() - t0, 2)
        if conformance:
            # the reference's conformance shape: k=1000, nprobe=32
            # (go/cmd/create_trec/main.go:32); 48 queries keep the result
            # set (48k rows) comparable to its batch size
            t0 = time.perf_counter()
            eng.search_flat(
                name, 1000, q_conf, params={"nprobe": 32}
            ).count()
            r["conformance_k1000_np32_sec"] = round(
                time.perf_counter() - t0, 2
            )
        return hits

    # ------------------------------------------------------------------ raw
    if "raw" in tiers and not disk_ok("raw"):
        tiers = [t for t in tiers if t != "raw"]
    if "raw" in tiers:
        r: dict = {}
        t0 = time.perf_counter()
        eng.create(
            "ref_raw", dim, f"IDMap,IVF{nlist}", metric_type="L2",
            params=fit_params,
        )
        eng.add("ref_raw", corpus())
        r["build_sec"] = round(time.perf_counter() - t0, 1)
        r["build_load_1m"] = loadavg()
        r["nlist_live"] = len(eng.registry.get("ref_raw").centroids)
        out["tiers"]["raw"] = r
        flush()  # build receipt survives a later crash (r13 OOM lesson)
        # corpus-skew receipt (the r10 rebalance contract: max_share <= 4)
        r["corpus_max_share"] = eng.rebalance("ref_raw")["max_share"]
        flush()
        if not os.environ.get("SPARK_GRAFT_PROBE_NO_WARM"):
            # warm() re-materializes the whole cached index; at corpus >
            # heap it evicts as it pages (and OOM-killed the first 8.8M
            # attempt at 96g heap + 32 python workers) — skipped there,
            # so the search keys measure the spill-read steady state,
            # which IS the 100 TB regime
            r["warm_sec"] = round(eng.warm("ref_raw"), 1)
        hits = searches("ref_raw", r, conformance=True)
        flush()
        t0 = time.perf_counter()
        exact = {
            (int(x["qid"]), int(x["label"]))
            for x in eng.search_flat(
                "ref_raw", 10, queries, params={"nprobe": r["nlist_live"]}
            ).collect()
        }
        r["exact_fullprobe_sec"] = round(time.perf_counter() - t0, 2)
        save_hits(exact)  # ground truth for later tiers/invocations
        for np_ in (4, 15, 16):
            r[f"recall_np{np_}"] = round(len(hits[np_] & exact) / len(exact), 4)
        r["load_end"] = loadavg()
        out["tiers"]["raw"] = r
        flush()
        print(json.dumps({"raw": r}), flush=True)
        eng.destroy("ref_raw")
    elif os.path.exists(out_path):  # resuming: reload the ground truth
        with open(out_path) as f:
            prev = json.load(f)
        out["tiers"] = prev.get("tiers", {})
        exact = load_hits()

    # ------------------------------------------------------------------ sq8
    if "sq8" in tiers and not disk_ok("sq8"):
        tiers = [t for t in tiers if t != "sq8"]
    if "sq8" in tiers:
        r = {}
        t0 = time.perf_counter()
        eng.create(
            "ref_sq8", dim, f"IDMap,IVF{nlist},SQ8", metric_type="L2",
            params=fit_params,
        )
        eng.add("ref_sq8", corpus())
        r["build_sec"] = round(time.perf_counter() - t0, 1)
        r["build_load_1m"] = loadavg()
        out["tiers"]["sq8"] = r
        flush()
        with tempfile.TemporaryDirectory(prefix="ref_sq8_") as td:
            p = os.path.join(td, "idx")
            t0 = time.perf_counter()
            eng.save("ref_sq8", p)
            r["save_sec"] = round(time.perf_counter() - t0, 1)
            r["at_rest_bytes"] = du_bytes(p)
        if not os.environ.get("SPARK_GRAFT_PROBE_NO_WARM"):
            r["warm_sec"] = round(eng.warm("ref_sq8"), 1)
        # conformance on the sq8 tier too (r14): with raw host-limited at
        # this shape, sq8 carries the k=1000/np32 reference timing
        hits = searches("ref_sq8", r, conformance=True)
        if not exact:
            # no raw tier at this n (the f32 tier is host-limited at 8.8M:
            # 96g heap OOM-killed at warm, 56g heap ENOSPC'd the 54 GB
            # persist + 56 GB cluster shuffle on the 80 GB disk — both
            # receipts in tools/out_r13/).  TRUE f32 ground truth still
            # exists WITHOUT an index: stream the codegen synth through the
            # brute-force kernel — no persist, no shuffle beyond nq*k rows
            # per partition, one corpus pass per query block.
            from duckdb_faiss_ext_spark.operators.topk import exact_knn_flat

            t0 = time.perf_counter()
            exact = {
                (int(x["qid"]), int(x["label"]))
                for x in exact_knn_flat(
                    corpus(), queries, 10, metric="L2"
                ).collect()
            }
            r["exact_streamed_sec"] = round(time.perf_counter() - t0, 2)
            save_hits(exact)
            flush()
        if exact:
            for np_ in (4, 15, 16):
                r[f"recall_np{np_}"] = round(
                    len(hits[np_] & exact) / len(exact), 4
                )
        r["load_end"] = loadavg()
        out["tiers"]["sq8"] = r
        flush()
        print(json.dumps({"sq8": r}), flush=True)
        eng.destroy("ref_sq8")

    # ---------------------------------------------------------------- graph
    if "graph" in tiers and not disk_ok("graph"):
        tiers = [t for t in tiers if t != "graph"]
    if "graph" in tiers:
        r = {}
        t0 = time.perf_counter()
        eng.create(
            "ref_graph", dim, f"IDMap,IVF{nlist}_HNSW32", metric_type="L2",
            params={**fit_params, "min_graph_rows": "0"},
        )
        eng.add("ref_graph", corpus())
        r["build_sec"] = round(time.perf_counter() - t0, 1)
        r["build_load_1m"] = loadavg()
        out["tiers"]["graph"] = r
        flush()  # build receipt survives a later crash (r13 OOM lesson)
        if not os.environ.get("SPARK_GRAFT_PROBE_NO_WARM"):
            # same gate as raw: warm() re-materializes the whole f32 cache
            # — at corpus > heap it evicts as it pages (r13 OOM kill)
            r["warm_sec"] = round(eng.warm("ref_graph"), 1)
        # the reference's operating point: nprobe=15, k=10
        run = lambda: eng.search_flat(  # noqa: E731
            "ref_graph", 10, queries, params={"nprobe": 15}
        )
        t0 = time.perf_counter()
        run().count()
        r["knn_np15_sec"] = round(time.perf_counter() - t0, 2)
        if exact:
            g_hits = {
                (int(x["qid"]), int(x["label"])) for x in run().collect()
            }
            r["recall_np15"] = round(len(g_hits & exact) / len(exact), 4)
        t0 = time.perf_counter()
        eng.search_flat(
            "ref_graph", 1000, q_conf, params={"nprobe": 32}
        ).count()
        r["conformance_k1000_np32_sec"] = round(time.perf_counter() - t0, 2)
        r["load_end"] = loadavg()
        out["tiers"]["graph"] = r
        flush()
        print(json.dumps({"graph": r}), flush=True)
        eng.destroy("ref_graph")

    out["load_end"] = loadavg()
    flush()

    lines = [
        f"\n## r14 reference-shape receipt: {n:,} x {dim}, IVF{nlist} "
        "(go/benches_c.go:31 corpus; raw / SQ8 / per-cluster-graph tiers)\n",
        "| metric | " + " | ".join(out["tiers"]) + " |",
        "|---|" + "---|" * len(out["tiers"]),
    ]
    keys = sorted({k for t in out["tiers"].values() for k in t})
    for k in keys:
        row = [str(out["tiers"][t].get(k, "—")) for t in out["tiers"]]
        lines.append(f"| {k} | " + " | ".join(row) + " |")
    receipt = "\n".join(lines) + "\n"
    print(receipt)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SCALE.md"), "a") as f:
        f.write(receipt)


if __name__ == "__main__":
    main()
