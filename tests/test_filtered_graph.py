"""Filtered search on graph indexes keeps the graph (VERDICT r3 task 2).

The reference filters DURING HNSW traversal via an IDSelectorBitmap
(faiss_extension.cpp:959): the selector gates result admission, not
routing.  The engine mirrors that: the allowed set is stamped onto the
corpus as a broadcast marker column (no corpus shuffle — partition-aligned
graph segments survive) and the beam kernel admits only allowed nodes into
the result beam while routing over the full graph."""

import numpy as np
import pytest
import pyspark.sql.functions as F

from duckdb_faiss_ext_spark import FaissSparkEngine
from duckdb_faiss_ext_spark.operators import nsw as nsw_mod

from conftest import gen_vectors

N, DIM, K = 6000, 16, 10


@pytest.fixture(scope="module")
def fidx(spark):
    x = gen_vectors(N, DIM, 7)
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(N)],
        "label bigint, vector array<float>",
    ).repartition(4)
    eng = FaissSparkEngine(spark)
    eng.create("fgraph", DIM, "IDMap,HNSW16", metric_type="L2")
    eng.add("fgraph", df)
    yield eng, x
    eng.destroy("fgraph")


def _exact_filtered(x: np.ndarray, q: np.ndarray, allowed: np.ndarray, k: int):
    """Ground truth: k nearest ALLOWED labels under squared L2."""
    sub = np.where(allowed)[0]
    d = ((x[sub] - q[None, :]) ** 2).sum(1)
    order = np.lexsort((sub, d))[:k]
    return set(int(sub[i]) for i in order)


def _spy_nsw_topk(monkeypatch):
    calls = []
    real = nsw_mod.nsw_topk

    def spy(data, *a, **kw):
        calls.append({"cols": data.columns, "allowed_col": kw.get("allowed_col")})
        return real(data, *a, **kw)

    monkeypatch.setattr(nsw_mod, "nsw_topk", spy)
    return calls


@pytest.mark.parametrize("p", [1, 90])
def test_filtered_hnsw_beams_run_with_recall(spark, fidx, monkeypatch, p):
    """At p=1% and p=90% selectivity the graph path must run (beam kernel
    invoked with the allowed marker, neighbors retained — no exact-scan
    fallback) and recall vs the exact filtered ground truth must clear 0.9.

    graph_filter='beam' forces the masked-beam plan: at p=1% the auto cost
    model correctly prefers the (cheaper, recall-1.0) survivor scan, and
    this test pins the beam MACHINERY itself — the IDSelectorBitmap
    parity — at both selectivity extremes."""
    eng, x = fidx
    calls = _spy_nsw_topk(monkeypatch)
    allowed_mask = (np.arange(N) % 100) < p
    allowed_df = spark.range(N).filter(F.col("id") % 100 < p).select("id")
    qids = [11, 503, 1777]
    q = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in qids],
        "qid bigint, vector array<float>",
    )
    res = eng.search_flat(
        "fgraph", K, q,
        params={"efSearch": 128, "graph_filter": "beam"},
        allowed_df=allowed_df,
    ).collect()
    # beams ran: the kernel saw the graph AND the allowed marker
    assert calls, "graph kernel was not invoked (exact-scan fallback took over)"
    assert all("neighbors" in c["cols"] for c in calls)
    assert all(c["allowed_col"] == "_allowed" for c in calls)
    # every result obeys the filter
    for r in res:
        assert allowed_mask[r["label"]], r
    # recall floor per query
    for qid in qids:
        got = {r["label"] for r in res if r["qid"] == qid}
        truth = _exact_filtered(x, x[qid], allowed_mask, K)
        recall = len(got & truth) / len(truth)
        assert recall >= 0.9, (qid, p, recall)


def test_filtered_graph_auto_cost_model(spark, fidx, monkeypatch):
    """graph_filter='auto' (default) picks the physical plan by expected
    vector evaluations: the survivor exact scan at p=1% (beams widened by
    1/sel would evaluate ~30x more nodes — recall 1.0 either way) and
    masked beams at p=90% (the scan would touch ~the whole corpus).  Both
    choices return only allowed labels."""
    eng, x = fidx

    for p, expect_beam in ((1, False), (90, True)):
        calls = _spy_nsw_topk(monkeypatch)
        allowed_df = spark.range(N).filter(F.col("id") % 100 < p).select("id")
        q = spark.createDataFrame(
            [(11, [float(v) for v in x[11]])], "qid bigint, vector array<float>"
        )
        res = eng.search_flat(
            "fgraph", K, q, params={"efSearch": 128}, allowed_df=allowed_df
        ).collect()
        assert bool(calls) == expect_beam, (p, calls)
        assert res and all(r["label"] % 100 < p for r in res)
        if not expect_beam:
            # scan path is exact: matches the filtered ground truth
            truth = _exact_filtered(x, x[11], (np.arange(N) % 100) < p, K)
            assert {r["label"] for r in res} == truth
        monkeypatch.undo()


def test_graph_filter_rejects_unknown_mode(spark, fidx):
    """A typo'd graph_filter value must raise, not silently run 'auto' —
    a user who thinks they forced a plan must not measure the other one.
    The check runs on EVERY search (a typo baked into create-time params
    surfaces on first use, filter or not)."""
    from duckdb_faiss_ext_spark.errors import FaissSparkError

    eng, x = fidx
    allowed_df = spark.range(N).filter(F.col("id") % 2 == 0).select("id")
    q = spark.createDataFrame(
        [(1, [float(v) for v in x[1]])], "qid bigint, vector array<float>"
    )
    with pytest.raises(FaissSparkError, match="graph_filter"):
        eng.search_flat(
            "fgraph", K, q, params={"graph_filter": "beams"}, allowed_df=allowed_df
        )
    with pytest.raises(FaissSparkError, match="graph_filter"):
        eng.search_flat("fgraph", K, q, params={"graph_filter": "beams"})


def test_forced_beam_never_silently_downgrades(spark, fidx, monkeypatch):
    """graph_filter='beam' must raise when beams cannot run — allowed set
    over the broadcast cap, or a graphless index — never silently run the
    scan plan the caller explicitly opted out of."""
    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.errors import FaissSparkError

    eng, x = fidx
    q = spark.createDataFrame(
        [(1, [float(v) for v in x[1]])], "qid bigint, vector array<float>"
    )
    allowed_df = spark.range(N).filter(F.col("id") % 2 == 0).select("id")
    monkeypatch.setattr(FaissSparkEngine, "GRAPH_FILTER_BROADCAST_CAP", 16)
    with pytest.raises(FaissSparkError, match="broadcast cap"):
        eng.search_flat(
            "fgraph", K, q, params={"graph_filter": "beam"}, allowed_df=allowed_df
        )
    monkeypatch.undo()
    eng.create("nog", DIM, "IDMap,Flat", metric_type="L2")
    eng.add(
        "nog",
        spark.createDataFrame(
            [(int(i), [float(v) for v in x[i]]) for i in range(50)],
            "label bigint, vector array<float>",
        ),
    )
    with pytest.raises(FaissSparkError, match="no graphs"):
        eng.search_flat(
            "nog", K, q, params={"graph_filter": "beam"}, allowed_df=allowed_df
        )
    eng.destroy("nog")


def test_cost_model_prices_composite_by_probed_clusters(spark, fidx):
    """For IVF composites the model prices beams on the PROBED clusters'
    segments (and shrinks the scan side the same way) — an all-segments
    estimate pushed moderate-selectivity composite searches onto the scan."""
    eng, _ = fidx

    class _Spec:
        kind = "ivf"
        nlist = 16

    class _Idx:
        count = 1_000_000
        params: dict = {}
        spec = _Spec()

    win = eng._graph_filter_beam_wins(
        _Idx(), {"nprobe": 4, "efSearch": 128}, 10, 100_000
    )
    assert win  # p=10%: 4 probed segments of beams beat a 25k-row scan
    assert not eng._graph_filter_beam_wins(
        _Idx(), {"nprobe": 4, "efSearch": 128}, 10, 1_000
    )  # p=0.1%: ~62 allowed rows in probed clusters — scan is free


def test_packed_stream_rejects_null_and_ragged_vectors(spark):
    """The packed query stream must fail loud on null/ragged vectors:
    ListArray.flatten() drops null lists, so without the per-row length
    check a single null would silently shift every later vector."""
    from duckdb_faiss_ext_spark.operators import topk as T

    rows = [(i, [float(j) for j in range(8)]) for i in range(64)]
    rows[10] = (10, None)
    df = spark.createDataFrame(rows, "qid bigint, vector array<float>")
    with pytest.raises(Exception, match="null qid or vector"):
        list(T.iter_query_blocks(df, "qid", "vector", packed=True))
    rows2 = [(i, [float(j) for j in range(8 if i != 5 else 7)]) for i in range(64)]
    df2 = spark.createDataFrame(rows2, "qid bigint, vector array<float>")
    with pytest.raises(Exception, match="ragged query vectors"):
        list(T.iter_query_blocks(df2, "qid", "vector", packed=True))


def test_filtered_hnsw_large_set_falls_back_exact(spark, fidx, monkeypatch):
    """Allowed sets beyond the broadcast cap take the exact survivor-scan
    path (graphs dropped) — recall 1.0, never an OOM-sized broadcast."""
    eng, x = fidx
    calls = _spy_nsw_topk(monkeypatch)
    monkeypatch.setattr(FaissSparkEngine, "GRAPH_FILTER_BROADCAST_CAP", 16)
    allowed_df = spark.range(N).filter(F.col("id") % 2 == 0).select("id")
    q = spark.createDataFrame(
        [(42, [float(v) for v in x[42]])], "qid bigint, vector array<float>"
    )
    res = eng.search_flat("fgraph", K, q, allowed_df=allowed_df).collect()
    assert not calls, "expected exact fallback, but the graph kernel ran"
    got = {r["label"] for r in res}
    truth = _exact_filtered(x, x[42], np.arange(N) % 2 == 0, K)
    assert got == truth  # exact path: recall 1.0


def test_filtered_ivf_hnsw_composite_with_graphs(spark, monkeypatch):
    """Filter + nprobe routing + per-cluster graphs compose: the allowed
    marker rides the cluster-pruned corpus into the beam kernel, results
    obey the filter, and recall vs the exact filtered-and-probed baseline
    holds."""
    eng = FaissSparkEngine(spark)
    x = gen_vectors(2000, 16, 3)
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(2000)],
        "label bigint, vector array<float>",
    )
    eng.create(
        "fivfh", 16, "IDMap,IVF4_HNSW8", metric_type="L2",
        params={"min_graph_rows": 0},
    )
    eng.add("fivfh", df)
    calls = _spy_nsw_topk(monkeypatch)
    allowed_df = spark.range(2000).filter(F.col("id") % 2 == 0).select("id")
    q = spark.createDataFrame(
        [(7, [float(v) for v in x[7]])], "qid bigint, vector array<float>"
    )
    res = eng.search_flat(
        "fivfh", 5, q, params={"nprobe": 4, "efSearch": 64},
        allowed_df=allowed_df,
    ).collect()
    assert calls and all(c["allowed_col"] == "_allowed" for c in calls)
    assert len(res) == 5
    for r in res:
        assert r["label"] % 2 == 0, r
    # nprobe=4 == nlist: no cluster pruned, so the exact filtered top-k is
    # the ground truth
    truth = _exact_filtered(x, x[7], np.arange(2000) % 2 == 0, 5)
    got = {r["label"] for r in res}
    assert len(got & truth) / len(truth) >= 0.8, (got, truth)
    eng.destroy("fivfh")


def test_filtered_graph_allowed_duplicates_are_deduped(spark, fidx):
    """Duplicate ids in the allowed set must not duplicate corpus rows
    through the broadcast marker join (r4 review): results carry no
    duplicate (qid, label) pairs and match the dedup-safe run."""
    eng, x = fidx
    base_allowed = spark.range(N).filter(F.col("id") % 10 == 0).select("id")
    dup_allowed = base_allowed.union(base_allowed).union(base_allowed)
    q = spark.createDataFrame(
        [(3, [float(v) for v in x[3]])], "qid bigint, vector array<float>"
    )
    clean = eng.search_flat("fgraph", K, q, allowed_df=base_allowed).collect()
    dup = eng.search_flat("fgraph", K, q, allowed_df=dup_allowed).collect()
    labels = [r["label"] for r in dup]
    assert len(labels) == len(set(labels)), "duplicate labels in results"
    key = lambda rows: sorted((r["rank"], r["label"]) for r in rows)
    assert key(clean) == key(dup)
