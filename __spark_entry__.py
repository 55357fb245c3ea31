"""Driver contract for the spark-graft builder (PySpark target).

`queries()` covers SURVEY.md §2.3's declared obligations Q01-Q18 (relational
operator battery + exact/filtered kNN) and is extended as operators land.
Every entry has a DuckDB `oracle_sql()` twin unless marked rows-only.

Conventions for hash-stable parity (SURVEY.md §7 known-hard list):
- every computed column aliased identically on both sides;
- rank/count columns cast to BIGINT (DuckDB window/agg default);
- double-precision vector math with sequential accumulation on both sides
  (verified bitwise-equal against DuckDB's list_inner_product);
- distances rounded to 4 decimals AFTER ranking at full precision.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from duckdb_faiss_ext_spark.functions import vector as V


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark 4 refuses it unless
        # this (runtime-settable) conf maps nanos to BIGINT.  The engine's
        # own get_spark() sets it, but the driver's harness session may not —
        # set it here so every events query is session-agnostic.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------- relational


def q01_scan_filter(spark, sf):
    # Q01 scan+project+filter (faiss3.test:17)
    return (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


def q02_cast_modulo(spark, sf):
    # Q02 cast+arithmetic+modulo (benches_c.go:31,128); FLOOR pins the
    # double->bigint rounding mode identically on both engines
    o = _t(spark, sf, "orders")
    return o.filter(F.col("o_orderkey") % 100 < 7).select(
        "o_orderkey", F.floor("o_totalprice").cast("bigint").alias("tp")
    )


def q03_equi_join(spark, sf):
    # Q03 inner equi join (benches_c.go:128, ai.py:47)
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey).select("c_custkey", "o_orderkey")


def q04_join_groupby(spark, sf):
    # Q04 join + group-by count (faiss2.test:21, ai.py:54); broadcast the
    # 25-row nation dim — no shuffle of customer needed for the join
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
    )


def q05_agg_multi(spark, sf):
    # Q05 count/max/min/count-distinct aggregates (ai.py:39,54)
    return (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("cnt"),
            F.max("o_totalprice").alias("mx"),
            F.min("o_orderdate").alias("first_dt"),
            F.countDistinct("o_orderpriority").alias("nprio"),
        )
    )


def q06_argmax(spark, sf):
    # Q06 per-group argmax (ai.py:54-56): correlated subquery re-expressed as
    # a window max — one shuffle instead of a self-join
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("_mx", F.max("o_totalprice").over(w))
        .filter(F.col("o_totalprice") == F.col("_mx"))
        .groupBy("o_custkey")
        .agg(F.min("o_orderkey").alias("ok"))
    )


def q07_window_topk(spark, sf):
    # Q07 row_number window top-3 (ai.py:7; searchIntoVector rank :651-661)
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("o_orderkey", "o_custkey", "rk")
    )


def q08_topk_limit(spark, sf):
    # Q08 ORDER BY + LIMIT top-k (benches_c.go:207) — Catalyst plans
    # TakeOrderedAndProject, no full sort
    return (
        _t(spark, sf, "lineitem")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_extendedprice")
        .limit(100)
    )


def q09_except(spark, sf):
    # Q09 EXCEPT set op (ai.py:10) — subtract == EXCEPT DISTINCT
    c = _t(spark, sf, "customer").select("c_custkey")
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)


def q10_cte(spark, sf):
    # Q10 CTE (faiss2.test:18-20)
    return (
        _t(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 10)
    )


def q11_round_expr(spark, sf):
    # Q11 round + expression projection (faiss3.test:23)
    li = _t(spark, sf, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        V.round_half_up(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("net"),
    )


def q12_range(spark, sf):
    # Q12 range source (benches_c.go:31)
    return spark.range(0, 1000).select(
        F.col("id").alias("i"), (F.col("id") % 100).alias("sel")
    )


def curation_signals(spark, sf):
    """r11's flagship curation surface under the driver-level CORRECTNESS
    gate (VERDICT r11 task 3): Gopher repetition signals (line stats +
    top-2gram / dup-5gram character fractions, functions/curation.py Arrow
    kernel) plus the TextPolicy-default disposition, rounded half-up at
    1e4 like text_stats so the cross-engine hash is bit-stable.  Replaces
    q13_values (a 2-row VALUES scan whose machinery q12/q15 already cover;
    VALUES semantics stay pinned in tests/test_sources.py)."""
    from duckdb_faiss_ext_spark.functions.curation import repetition_signals

    d = _t(spark, sf, "documents").select("doc_id", "text")
    sig = repetition_signals(d, top_ns=(2,), dup_ns=(5,), impl="arrow")
    dlf, dlcf = F.col("dup_line_frac"), F.col("dup_line_char_frac")
    t2, d5 = F.col("top_2gram_char_frac"), F.col("dup_5gram_char_frac")
    # TextPolicy default caps, evaluated in field-declaration order on the
    # UNROUNDED fractions (ratios of integers: bit-identical across engines)
    disposition = (
        F.when(dlf > 0.30, F.lit("filtered:max_dup_line_frac"))
        .when(dlcf > 0.20, F.lit("filtered:max_dup_line_char_frac"))
        .when(t2 > 0.20, F.lit("filtered:max_top_ngram_frac_2"))
        .when(d5 > 0.15, F.lit("filtered:max_dup_ngram_frac_5"))
        .otherwise(F.lit("kept"))
    )
    return sig.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
        V.round_half_up(dlf, 4).alias("dup_line_frac"),
        V.round_half_up(dlcf, 4).alias("dup_line_char_frac"),
        V.round_half_up(t2, 4).alias("top_2gram_frac"),
        V.round_half_up(d5, 4).alias("dup_5gram_frac"),
        disposition.alias("disposition"),
    )


def _arr_canon(arr_col, scale: int = 10000):
    """Hash-stable serialization of a double array: each element rounded
    half-up at `scale` and rendered as an integer string, comma-joined.
    The driver's canonicalizer sorts result columns with pandas, which cannot
    hash list cells (r01: 'unhashable type: list'); integer-string encoding is
    bitwise identical on Spark and DuckDB (same FLOOR(x*s+0.5) on both sides),
    unlike engine-native float->string rendering."""
    return F.array_join(
        F.transform(
            arr_col,
            lambda x: F.floor(x.cast("double") * scale + F.lit(0.5))
            .cast("bigint")
            .cast("string"),
        ),
        ",",
    )


def q14_array_construct(spark, sf):
    # Q14 array construct (faiss.test:11 list_value) — elements double both
    # sides, serialized canonically (see _arr_canon)
    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _arr_canon(F.array("l_quantity", "l_discount", "l_tax")).alias("arr"),
    )


def corpus_mix_exact(spark, sf):
    """r12's exact-budget corpus-mix sampler under the driver-level
    CORRECTNESS gate (VERDICT r12 task 5): sample_corpus_mix(exact=True)
    over the documents table's real source column — the first k_s rows of
    each source in deterministic (mix_hash, doc_id) order, DuckDB twin =
    row_number() OVER (PARTITION BY source ORDER BY draw, doc_id) <= k.
    Targets exercise all three regimes: k < n (prefix), k > n (whole
    source), k = 0 (dropped).  Replaces q15_unnest (its explode machinery
    is fully covered by q14 + q23 + the knn UNNEST paths; explode-vs-UNNEST
    parity stays pinned in tests/test_sources.py)."""
    from duckdb_faiss_ext_spark.functions.curation import sample_corpus_mix

    d = _t(spark, sf, "documents")
    targets = {"src0": 9, "src1": 17, "src2": 40, "src3": 0, "src5": 5}
    sampled = sample_corpus_mix(d, targets, seed=11, exact=True)
    out = sampled.select("doc_id", "source")
    # ADVICE r13: exact=True returns a persisted sample; a harness that
    # never unpersists accumulates cached blocks across calls in a
    # long-lived session.  The sample is budget-bounded (sum(k) = 71 rows
    # here), so collect it off the hot cache, release the cache, and hand
    # the driver a local DataFrame with the identical schema.
    rows = out.collect()
    sampled.unpersist(blocking=False)
    return spark.createDataFrame(rows, schema=out.schema)


def q19_events_agg(spark, sf):
    # events-table aggregation: GROUP BY two keys + count/sum (ai.py:54 shape)
    return (
        _t(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"), V.round_half_up(F.sum("value"), 2).alias("sv"))
    )


# ------------------------------------------------------------------- vector


def _emb(spark, sf):
    return _t(spark, sf, "embeddings")


def knn_ip(spark, sf):
    """Q16: exact brute-force kNN, inner product, descending (faiss.test:17,
    benches_c.go:207).  Queries = vec_id<10, corpus = all, k=10.

    Plan: broadcast the 10-row query side; the corpus side streams through a
    codegen'd zip_with/aggregate dot product — no UDF, no corpus shuffle;
    the only shuffle is the per-qid top-k window over nq*k candidate rows."""
    e = _emb(spark, sf)
    t = e.select(F.col("vec_id").alias("id"), F.col("embedding").alias("tv"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    d = t.crossJoin(F.broadcast(q)).select(
        "qid", "id", V.inner_product("qv", "tv").alias("ip_full")
    )
    w = Window.partitionBy("qid").orderBy(F.col("ip_full").desc(), F.col("id"))
    return (
        d.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 10)
        .select("qid", "id", V.round_half_up("ip_full", 4).alias("ip"), "rk")
    )


def knn_l2(spark, sf):
    """Q17: exact kNN, squared-L2 ascending (FAISS L2 semantics, §1.3)."""
    e = _emb(spark, sf)
    t = e.select(F.col("vec_id").alias("id"), F.col("embedding").alias("tv"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    d = t.crossJoin(F.broadcast(q)).select(
        "qid", "id", V.l2sq("qv", "tv").alias("d_full")
    )
    w = Window.partitionBy("qid").orderBy(F.col("d_full").asc(), F.col("id"))
    return (
        d.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 10)
        .select("qid", "id", V.round_half_up("d_full", 4).alias("l2sq"), "rk")
    )


def knn_filtered(spark, sf):
    """Q18: filtered kNN = semi-join pre-filter then top-k
    (faiss_search_filter semantics, README.md:245; faiss3.test:47)."""
    e = _emb(spark, sf)
    # no broadcast hint on the allowed set — it's 50% of the corpus here and
    # would be at any scale; AQE picks the join strategy (VERDICT r1 #2)
    allowed = e.filter(F.col("vec_id") % 2 == 0).select(F.col("vec_id").alias("id"))
    t = e.select(F.col("vec_id").alias("id"), F.col("embedding").alias("tv")).join(
        allowed, "id", "left_semi"
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    d = t.crossJoin(F.broadcast(q)).select(
        "qid", "id", V.inner_product("qv", "tv").alias("ip_full")
    )
    w = Window.partitionBy("qid").orderBy(F.col("ip_full").desc(), F.col("id"))
    return (
        d.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select("qid", "id", "rk")
    )


def _exact_topk(e, k: int, score_col, desc: bool = True):
    """Exact top-k baseline for the ann_* recall columns: (qid, label) of the
    true k nearest rows for queries vec_id < 10 under ``score_col(qv, tv)``
    — the same crossJoin-window pattern the oracled knn_* entries use."""
    t = e.select(F.col("vec_id").alias("xid"), F.col("embedding").alias("tv"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    d = t.crossJoin(F.broadcast(q)).select(
        "qid", "xid", score_col(F.col("qv"), F.col("tv")).alias("s")
    )
    order = [F.col("s").desc() if desc else F.col("s").asc(), F.col("xid")]
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", F.col("xid").alias("label"))
    )


def _with_recall(flat, exact):
    """Attach per-qid recall vs the exact (qid, label) baseline as a column —
    self-evidence for the rows-only ann_* contract entries (the driver
    records the rows, so the recall floor is checkable from
    CORRECTNESS_r{N}.json alone).

    ``flat`` is referenced on both sides of the join below — persist it so
    the (expensive) ANN search executes once, not twice (r4 review).  The
    frame is nq*k rows; the cache is tiny and lives with the session."""
    flat = flat.persist()
    hits = (
        flat.select("qid", "label")
        .join(exact, ["qid", "label"], "inner")
        .groupBy("qid")
        .agg(F.count("*").alias("_hits"))
    )
    tot = exact.groupBy("qid").agg(F.count("*").alias("_tot"))
    rec = hits.join(tot, "qid").select(
        "qid", F.round(F.col("_hits") / F.col("_tot"), 4).alias("recall")
    )
    return flat.join(rec, "qid", "left").withColumn(
        "recall", F.coalesce(F.col("recall"), F.lit(0.0))
    )


# per-qid recall floors for the ann_* ORACLE rows (VERDICT r5 task 5):
# generous margins under the measured per-qid minima at sf0.001/sf0.01
# (IVF 0.4/0.6, LSH 1.0, HNSW 1.0, IVFPQ 0.3/0.5) — the MEAN floors in
# tests/test_ann_recall_floors.py stay the quality gate; these per-qid
# floors only need to hold deterministically so the invariant table
# hash-matches its constant oracle
ANN_QID_FLOORS = {
    "ann_ivf_knn": 0.2,
    "ann_lsh_knn": 0.7,
    "ann_hnsw_knn": 0.7,
    "ann_ivfpq_knn": 0.15,
}

# the constant oracle every ann_* invariant frame must hash-match: ten
# queries, k-padded to 10 rows each, recall floor met, admission invariant
# held — all deterministic given the seeded KMeans/hyperplanes
_ANN_ORACLE = (
    "SELECT CAST(qid AS BIGINT) AS qid, CAST(10 AS BIGINT) AS k_returned, "
    "TRUE AS recall_ok, TRUE AS admissible "
    "FROM (VALUES (0), (1), (2), (3), (4), (5), (6), (7), (8), (9)) AS t(qid) "
    "ORDER BY qid"
)


def _ann_invariant_frame(flat_recall, floor, admissible) -> DataFrame:
    """Collapse a recall-carrying ANN result into ONE deterministic row per
    query: (qid, k_returned, recall_ok, admissible).

    With seeded KMeans/hyperplanes the ANN searches are deterministic, so
    these booleans are CONSTANTS — which turns the former rows-only
    `no_oracle` entries into hash-green checks against a constant VALUES
    oracle (VERDICT r5 task 5): k-padding contract (k_returned), recall
    floor vs the exact top-k computed INSIDE the query (recall_ok), and an
    entry-specific admission invariant (admissible: from-probed-clusters-
    only for IVF/IVFPQ, exact-distance recompute for LSH/HNSW)."""
    per = flat_recall.groupBy("qid").agg(
        F.count("*").alias("k_returned"),
        F.min("recall").alias("_rec"),
    )
    return (
        per.join(admissible, "qid", "left")
        .select(
            F.col("qid").cast("bigint").alias("qid"),
            F.col("k_returned").cast("bigint").alias("k_returned"),
            (F.col("_rec") >= F.lit(floor)).alias("recall_ok"),
            F.coalesce(F.col("ok"), F.lit(False)).alias("admissible"),
        )
        .orderBy("qid")
    )


def _ivf_admissible(spark, eng, index_name, flat, q, nprobe: int, desc: bool) -> DataFrame:
    """(qid, ok): every returned label belongs to one of the qid's nprobe
    probed clusters — the IVF pruning-path admission invariant, recomputed
    independently from the trained centroids (tiny driver-side math: nq x
    nlist scores)."""
    import numpy as np

    idx = eng.registry.get(index_name)
    cents = idx.centroids  # (nlist, dim) float32
    qrows = q.collect()
    allowed = []
    for r in qrows:
        v = np.asarray(r["vector"], dtype=np.float32)
        if desc:  # INNER_PRODUCT: highest first
            scores = cents @ v
            top = np.argsort(-scores, kind="stable")[:nprobe]
        else:  # L2: nearest first
            d2 = ((cents - v) ** 2).sum(axis=1)
            top = np.argsort(d2, kind="stable")[:nprobe]
        allowed.extend((int(r["qid"]), int(c)) for c in top)
    allowed_df = spark.createDataFrame(allowed, "qid bigint, cluster_id int")
    lbl_cluster = idx.data.select("label", "cluster_id")
    hits = flat.select("qid", "label").join(lbl_cluster, "label")
    return (
        hits.join(
            F.broadcast(allowed_df.withColumn("_a", F.lit(1))),
            ["qid", "cluster_id"],
            "left",
        )
        .groupBy("qid")
        .agg((F.count("*") == F.count("_a")).alias("ok"))
    )


def _score_exact_admissible(flat, e, q, score_col, tol: float = 1e-3) -> DataFrame:
    """(qid, ok): every returned distance equals the metric recomputed from
    the raw corpus/query vectors within ``tol`` — the exact-scoring
    admission invariant for ANN paths that re-rank candidates exactly
    (LSH) or score true vectors (HNSW)."""
    corpus = e.select(F.col("vec_id").alias("label"), F.col("embedding").alias("_tv"))
    qv = q.select("qid", F.col("vector").alias("_qv"))
    j = (
        flat.select("qid", "label", "distance")
        .join(corpus, "label")
        .join(F.broadcast(qv), "qid")
        .withColumn("_s", score_col(F.col("_qv"), F.col("_tv")))
    )
    return j.groupBy("qid").agg(
        (F.max(F.abs(F.col("distance") - F.col("_s"))) < tol).alias("ok")
    )


def ann_ivf_knn(spark, sf, detail: bool = False):
    """ANN scale path: IVF(8) with nprobe=4 cluster pruning through the
    engine.  Returns the per-query invariant row (qid, k_returned,
    recall_ok, admissible) checked against a constant VALUES oracle:
    admissible = all hits from probed clusters only (recomputed from the
    trained centroids), recall_ok vs the exact IP top-k computed in-query.
    ``detail=True`` returns the raw (qid, rank, label, distance, recall)
    frame for the pytest mean-recall floor."""
    from duckdb_faiss_ext_spark import FaissSparkEngine

    e = _emb(spark, sf)
    eng = FaissSparkEngine(spark)
    eng.create("_entry_ivf", 64, "IDMap,IVF8,Flat", metric_type="INNER_PRODUCT")
    eng.add("_entry_ivf", e.select("vec_id", "embedding"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    flat = eng.search_flat("_entry_ivf", 10, q, params={"nprobe": 4})
    rec = _with_recall(flat, _exact_topk(e, 10, V.inner_product))
    if detail:
        return rec
    adm = _ivf_admissible(spark, eng, "_entry_ivf", flat, q, nprobe=4, desc=True)
    return _ann_invariant_frame(rec, ANN_QID_FLOORS["ann_ivf_knn"], adm)


def knn_majority_vote(spark, sf):
    """The reference's classification pipeline (examples/ai.py:45-56): k-NN
    search, join neighbor labels back, majority vote per query with the
    per-group-argmax pattern (count desc, label asc tie-break).  End-to-end:
    search -> UNNEST-join -> GROUP BY -> argmax, all one declarative plan."""
    e = _emb(spark, sf)
    t = e.select(F.col("vec_id").alias("id"), F.col("embedding").alias("tv"))
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    d = t.crossJoin(F.broadcast(q)).select(
        "qid", "id", V.inner_product("qv", "tv").alias("ip_full")
    )
    w = Window.partitionBy("qid").orderBy(F.col("ip_full").desc(), F.col("id"))
    nn = d.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
    # labels is corpus-sized (vec_id, label for every row) — no broadcast
    # hint; the nn side is nq*k rows, so AQE broadcasts THAT side instead
    labels = e.select(F.col("vec_id").alias("id"), F.col("label").cast("bigint").alias("nlabel"))
    votes = (
        nn.join(labels, "id")
        .groupBy("qid", "nlabel")
        .agg(F.count("*").alias("votes"))
    )
    vw = Window.partitionBy("qid").orderBy(F.col("votes").desc(), F.col("nlabel"))
    return (
        votes.withColumn("vr", F.row_number().over(vw))
        .filter(F.col("vr") == 1)
        .select("qid", F.col("nlabel").alias("pred"), "votes")
    )


def ann_lsh_knn(spark, sf, detail: bool = False):
    """ANN scale path #2: random-hyperplane LSH bucket-join ANN for cosine
    (approximate candidate set, exact re-ranked distances).  Unlike IVF
    this needs NO training pass — signatures are data-independent.
    Returns the per-query invariant row (see _ann_invariant_frame):
    admissible = every returned distance matches the exact cosine
    recomputed from raw vectors (the re-rank contract)."""
    from duckdb_faiss_ext_spark.operators.lsh import lsh_ann_cosine

    e = _emb(spark, sf)
    corpus = e.select(F.col("vec_id").alias("label"), F.col("embedding").alias("vector"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    flat = lsh_ann_cosine(corpus, q, 10, 64, n_planes=4, n_tables=8)
    rec = _with_recall(flat, _exact_topk(e, 10, V.cosine_similarity))
    if detail:
        return rec
    adm = _score_exact_admissible(flat, e, q, V.cosine_similarity)
    return _ann_invariant_frame(rec, ANN_QID_FLOORS["ann_lsh_knn"], adm)


def ann_hnsw_knn(spark, sf, detail: bool = False):
    """ANN scale path #4: the reference's HEADLINE index shape — HNSW graph
    search ('IDMap,HNSW128,Flat', Makefile:105; efSearch plumbing
    faiss_extension.cpp:691-702) as per-segment navigable-small-world graphs
    (operators/nsw.py): Malkov-diversified edges + reverse links, multi-entry
    beam honoring efSearch, bounded nq*k merge.  Returns the per-query
    invariant row (see _ann_invariant_frame): admissible = every returned
    distance matches the exact IP recomputed from raw vectors; recall
    floor and touched-fraction pinned in tests/test_nsw.py."""
    from duckdb_faiss_ext_spark import FaissSparkEngine

    e = _emb(spark, sf)
    eng = FaissSparkEngine(spark)
    eng.create("_entry_hnsw", 64, "IDMap,HNSW32", metric_type="INNER_PRODUCT")
    eng.add("_entry_hnsw", e.select("vec_id", "embedding"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    flat = eng.search_flat("_entry_hnsw", 10, q, params={"efSearch": "128"})
    rec = _with_recall(flat, _exact_topk(e, 10, V.inner_product))
    if detail:
        return rec
    adm = _score_exact_admissible(flat, e, q, V.inner_product)
    return _ann_invariant_frame(rec, ANN_QID_FLOORS["ann_hnsw_knn"], adm)


def ann_ivfpq_knn(spark, sf, detail: bool = False):
    """ANN scale path #3: IVF + PQ through the engine factory — the
    reference's 'IVFn,PQm' index strings (faiss::index_factory surface,
    faiss_extension.cpp:112; Makefile:105) re-expressed Spark-first: KMeans
    coarse quantizer prunes to nprobe clusters, rows store 8-byte PQ codes
    (32x compression), scoring is ADC lookup tables.  Returns the
    per-query invariant row (see _ann_invariant_frame): admissible = all
    hits from probed clusters only; recall and compression pinned in
    tests/test_pq.py."""
    from duckdb_faiss_ext_spark import FaissSparkEngine

    e = _emb(spark, sf)
    eng = FaissSparkEngine(spark)
    eng.create("_entry_ivfpq", 64, "IDMap,IVF8,PQ8", metric_type="L2")
    eng.add("_entry_ivfpq", e.select("vec_id", "embedding"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    flat = eng.search_flat("_entry_ivfpq", 10, q, params={"nprobe": 4})
    rec = _with_recall(flat, _exact_topk(e, 10, V.l2sq, desc=False))
    if detail:
        return rec
    adm = _ivf_admissible(spark, eng, "_entry_ivfpq", flat, q, nprobe=4, desc=False)
    return _ann_invariant_frame(rec, ANN_QID_FLOORS["ann_ivfpq_knn"], adm)


def vector_centroids(spark, sf):
    """Per-label centroid vectors (the IVF-training primitive as a query):
    posexplode -> per-(label, dim) mean -> re-assemble ordered array.
    Scales as one shuffle keyed on (label, dim) with partial aggregation."""
    e = _emb(spark, sf)
    per_dim = (
        e.select("label", F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "v"))
        .groupBy("label", "i")
        .agg(F.avg("v").alias("av"))
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "av"))), lambda s: s["av"]
            ).alias("centroid_raw")
        )
        .select("label", _arr_canon(F.col("centroid_raw"), 1000000).alias("centroid"))
    )


def q23_transform_lambda(spark, sf):
    """Higher-order lambda over arrays (README.md:58 'apply(list, x -> ...)');
    the mapped array is serialized canonically for the hash compare."""
    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 100)
    arr = F.array("l_quantity", "l_tax")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _arr_canon(F.transform(arr, lambda x: x * 2 + 1)).alias("mapped"),
        F.aggregate(arr, F.lit(0.0), lambda a, x: a + x).alias("arr_sum"),
    )


def q24_multiway_join(spark, sf):
    """3-way join + agg (TPC-H Q3 shape): customer x orders x lineitem.
    Plan: lineitem (largest) joins shuffle-hash on orderkey; customer side
    pre-filtered before its join — Catalyst orders by size with AQE."""
    c = _t(spark, sf, "customer").filter(F.col("c_nationkey") < 10)
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            V.round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


def q26_date_functions(spark, sf):
    """Date part extraction + grouping by year/month."""
    o = _t(spark, sf, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m"),
        )
        .agg(F.count("*").alias("cnt"), F.max("o_totalprice").alias("mx"))
    )


def q27_having_avg(spark, sf):
    """AVG + HAVING (post-aggregation filter)."""
    o = _t(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            V.round_half_up(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.count("*").alias("cnt"),
        )
        .filter(F.col("cnt") > 100)
    )


def q29_anti_join(spark, sf):
    """Anti-join: customers with no orders (ai.py:10 EXCEPT semantics as the
    join form; Catalyst plans broadcast-anti when the right side is small)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_nationkey")


def q30_rollup(spark, sf):
    """GROUP BY ROLLUP (hierarchical totals)."""
    o = _t(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
        .select("o_orderstatus", "o_orderpriority", "cnt")
    )


def q31_in_subquery(spark, sf):
    """IN-subquery (semi-join form of the reference's filtered selection)."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation").filter(F.col("n_regionkey") == 1)
    return c.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("c_nationkey"))),
        "c_nationkey",
        "left_semi",
    ).select("c_custkey", "c_nationkey")


def q32_case_agg(spark, sf):
    """Conditional aggregation (CASE WHEN inside SUM)."""
    o = _t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0))
        .cast("bigint")
        .alias("big"),
        F.count("*").alias("cnt"),
    )


def q33_string_ops(spark, sf):
    """String surface in one query (the driver caps the contract at 50
    entries, so the former q33 LIKE/UPPER/LENGTH and q34 SUBSTR/REPLACE/
    CONCAT merged): every string function the reference's examples exercise."""
    p = _t(spark, sf, "part")
    return p.filter(F.col("p_name").like("%red%")).select(
        "p_partkey",
        F.upper("p_name").alias("un"),
        F.length("p_name").cast("bigint").alias("ln"),
        F.substring("p_name", 1, 12).alias("head12"),
        F.concat(F.lit("part:"), F.col("p_partkey").cast("string")).alias("tag"),
        F.regexp_replace("p_name", " ", "_").alias("unders"),
    )


def q21_time_window(spark, sf):
    """Tumbling 1-hour window aggregation over the events stream table —
    the batch twin of streaming.windowed_event_counts (same plan runs under
    readStream with a watermark)."""
    from duckdb_faiss_ext_spark.streaming.ingest import (
        events_ts_as_timestamp,
        windowed_event_counts,
    )

    ev = events_ts_as_timestamp(_t(spark, sf, "events"))
    out = windowed_event_counts(ev, window="1 hour", watermark="2 hours")
    # window_start as epoch seconds: timestamp VALUES render through the
    # session timezone on collect, so a non-UTC harness session would
    # hash-mismatch the oracle; the underlying instant is tz-independent
    return out.select(
        F.unix_timestamp("window_start").alias("ws"),
        "event_type",
        "cnt",
        V.round_half_up("sum_value", 2).alias("sv"),
    )


def q22_lag_window(spark, sf):
    """LAG over an ordered per-user event stream (delta encoding — classic
    sessionization primitive)."""
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("dv"),
    )


def media_features(spark, sf):
    """Multimodal plumbing: synthesize binary payloads from document text
    (deterministic), run the Arrow-batched feature extractor.  The metadata
    columns (byte length, sha256 hex) have an exact DuckDB twin — the
    oracle hash-checks the extractor end-to-end; the numpy feature vector
    (no SQL twin) is pinned by pytest determinism tests instead."""
    from duckdb_faiss_ext_spark.operators.multimodal import extract_features

    d = _t(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return extract_features(d, dim=16).select(
        "media_id", "n_bytes", "content_hash"
    )


def media_jpeg_decode(spark, sf):
    """JPEG decode through the Spark pipeline (r7; progressive added r8):
    16 deterministic gradient images are JFIF-encoded (operators/jpeg.py —
    per-image canonical DHT, even rows 4:2:0-subsampled, ODD rows also
    encoded PROGRESSIVE/SOF2) and decoded back inside a mapInPandas pass;
    the emitted per-row INVARIANTS (shape preserved, reconstruction error
    under the quantization budget, progressive decode pixel-IDENTICAL to
    baseline on odd rows, non-empty payload) are deterministic, so the
    oracle is the constant-TRUE table — the same pattern the ann_* entries
    use for non-SQL-expressible kernels.  Pixel-exact decode behavior is
    golden-pinned in tests/test_jpeg.py."""
    import numpy as np
    import pandas as pd

    def run(it):
        from duckdb_faiss_ext_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        for pdf in it:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                h, w = 16 + (i % 3) * 8, 24 - (i % 2) * 8
                yy, xx = np.mgrid[0:h, 0:w]
                px = np.stack(
                    [
                        ((xx * (i + 2) + yy) % 256).astype(np.uint8),
                        ((yy * (i + 3)) % 256).astype(np.uint8),
                        ((xx + yy * 2 + i) % 256).astype(np.uint8),
                    ],
                    axis=2,
                )
                sub = i % 2 == 0
                payload = encode_jpeg(px, quant=1, subsample=sub)
                out = decode_jpeg(payload)
                err = float(np.abs(out.astype(float) - px.astype(float)).mean())
                # r8: odd rows also run the PROGRESSIVE (SOF2) path — same
                # coefficients through the shared encoder front half, so
                # the two decodes must be pixel-IDENTICAL
                if i % 2 == 1:
                    prog = decode_jpeg(
                        encode_jpeg_progressive(px, quant=1, subsample=sub)
                    )
                    decode_ok = bool(np.array_equal(out, prog)) and err < 3.0
                else:
                    # 4:2:0 averages chroma 2x2 on non-smooth patterns:
                    # wider budget (pytest pins the tight per-mode ones)
                    decode_ok = err < 40.0
                rows.append(
                    (
                        i,
                        out.shape == px.shape,
                        decode_ok,
                        len(payload) > 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["i", "shape_ok", "decode_ok", "nonempty"]
            )

    return (
        spark.range(16)
        .select(F.col("id").alias("i"))
        .mapInPandas(run, "i bigint, shape_ok boolean, decode_ok boolean, nonempty boolean")
    )


def similarity_join_topk(spark, sf):
    """similarity_join (M6): for each left row (vec_id < 8), the 4 nearest
    right rows by inner product.  Runs the distributed mapInArrow top-k
    kernel end-to-end in float64 so the actual scale path is oracle-checked
    (the float32 FAISS-parity twin is knn_engine_ip, rows-only)."""
    import numpy as np

    from duckdb_faiss_ext_spark.operators.simjoin import similarity_join

    e = _emb(spark, sf)
    out = similarity_join(
        e.filter(F.col("vec_id") < 8),
        e,
        4,
        metric="INNER_PRODUCT",
        left_id="vec_id",
        left_vec="embedding",
        right_id="vec_id",
        right_vec="embedding",
        dtype=np.float64,
    )
    return out.select(
        F.col("vec_id").alias("qid"),
        (F.col("rank") + 1).cast("bigint").alias("rk"),
        F.col("vec_id_right").alias("id"),
        V.round_half_up("distance", 4).alias("ip"),
    )


def sessionize_events(spark, sf):
    """Gap-based sessionization of the events stream (30-min gap): batch twin
    of streaming.sessionize_stream (applyInPandasWithState); identical
    semantics pinned by tests/test_sessionize.py.  events_ts_ms normalizes
    whatever physical ts type the parquet carries (bigint nanos,
    timestamp[us]/NTZ, timestamp) to exact epoch-ms — see
    streaming/ingest.py:_ts_micros_sql."""
    from duckdb_faiss_ext_spark.streaming.ingest import events_ts_ms
    from duckdb_faiss_ext_spark.streaming.sessionize import sessionize_batch

    raw = _t(spark, sf, "events")
    ev = raw.select("user_id", events_ts_ms(raw).alias("ts_ms"), "value")
    s = sessionize_batch(ev, gap_seconds=1800)
    return s.select(
        "user_id",
        "session_start_ms",
        "session_end_ms",
        "n_events",
        V.round_half_up("sum_value", 2).alias("sv"),
    )


def sessionize_native_q(spark, sf):
    """Catalyst-native gap sessionization (F.session_window) — the built-in
    session operator, same 30-min gap and same oracle as sessionize_events:
    two independent Spark implementations checked against one SQL truth."""
    from duckdb_faiss_ext_spark.streaming.ingest import events_ts_ms
    from duckdb_faiss_ext_spark.streaming.sessionize import sessionize_native

    raw = _t(spark, sf, "events")
    ev = raw.select("user_id", events_ts_ms(raw).alias("ts_ms"), "value")
    s = sessionize_native(ev, gap_seconds=1800)
    return s.select(
        "user_id",
        "session_start_ms",
        "session_end_ms",
        "n_events",
        V.round_half_up("sum_value", 2).alias("sv"),
    )


# ------------------------------------------------- LLM-pipeline: dedup/text


def dedup_exact(spark, sf):
    """Exact dedup groups keyed on md5(text) (min-id survivor)."""
    from duckdb_faiss_ext_spark.operators.dedup import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf, "documents"), "doc_id", "text")


def dedup_lsh_pairs(spark, sf):
    """MinHash LSH candidate pairs over 3-gram shingles (2 bands x 2 hashes) —
    the classic shingle->minhash->band->bucket-join pipeline."""
    from duckdb_faiss_ext_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf, "documents"), "doc_id", "text", 4, 2, shingle_n=3
    )


def dedup_jaccard_pairs(spark, sf):
    """Exact word-3-gram Jaccard pairs >= 0.05 (candidate verification)."""
    from duckdb_faiss_ext_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf, "documents"), "doc_id", "text", n=3, threshold=0.05
    )


def dedup_survivors(spark, sf):
    """Survivor selection (stage 5 of the dedup pipeline): drop every doc
    whose component min is another doc — chains collapse to one survivor
    (a~b, b~c keeps only min(a,b,c)).  Oracled end-to-end: the recursive
    CTE computes components AND applies the anti-join."""
    from duckdb_faiss_ext_spark.operators.dedup import (
        neardup_survivors,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.05)
    # strict + generous max_iter: the oracle computes the FULL transitive
    # closure, so a silently capped propagation would diverge cross-engine
    out = neardup_survivors(
        d, pairs.select("id_a", "id_b"), "doc_id", max_iter=100, strict=True
    )
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"))


def dedup_cosine(spark, sf):
    """Embedding-cosine near-dup pairs (> 0.4), double precision."""
    from duckdb_faiss_ext_spark.operators.dedup import cosine_neardup_pairs

    pairs = cosine_neardup_pairs(_emb(spark, sf), "vec_id", "embedding", 0.4)
    return pairs.select(
        "id_a", "id_b", V.round_half_up("cos_full", 4).alias("cos")
    )


def dedup_simhash(spark, sf):
    """SimHash fingerprints, oracle-portable construction: bit j = sign of
    the ±1 sum over words by the high bit of md5 hex nibble j — exactly
    replicable in DuckDB SQL, so the fingerprint hash-checks cross-engine.
    The scale path (simhash64: xxhash64, 64-bit) keeps pytest pinning."""
    from duckdb_faiss_ext_spark.operators.dedup import simhash32_md5

    return simhash32_md5(_t(spark, sf, "documents"), "doc_id", "text")


def text_stats(spark, sf):
    """Token / regex-token / char / punctuation counts + content fingerprints.

    r8: absorbed the former text_fingerprint contract row (normalized-md5 +
    min-shingle winnowing fingerprint) so the contract stays at EXACTLY 50
    entries with ann_hnsw_knn inside (VERDICT r7 task 1); the fingerprint
    functions keep their own pytest pins in tests/test_text.py."""
    from duckdb_faiss_ext_spark.functions import text as T

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        T.token_count("text").alias("tc"),
        T.regex_token_count("text").alias("rtc"),
        T.char_count("text").alias("cc"),
        T.punct_count("text").alias("pc"),
        T.fingerprint("text").alias("fp"),
        T.min_shingle_fingerprint("text", 5).alias("msfp"),
    )


def text_quality(spark, sf):
    """Deterministic quality score in [0,1]."""
    from duckdb_faiss_ext_spark.functions import text as T

    d = _t(spark, sf, "documents")
    return d.select("doc_id", V.round_half_up(T.quality_score("text"), 4).alias("q"))


def text_lang(spark, sf):
    """Stopword/codepoint language heuristic."""
    from duckdb_faiss_ext_spark.functions import text as T

    d = _t(spark, sf, "documents")
    return d.select("doc_id", T.lang_id("text").alias("lang_guess"))


# -------------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: vector search through the engine + relational join back to
    documents — the reference's canonical pipeline (search -> UNNEST -> JOIN,
    go/benches_c.go:128)."""
    from duckdb_faiss_ext_spark import FaissSparkEngine

    sf = "/root/testdata/sf0.001"
    e = _t(spark, sf, "embeddings")
    docs = _t(spark, sf, "documents")
    eng = FaissSparkEngine(spark)
    eng.create("flagship", 64, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("flagship", e.select("vec_id", "embedding"))
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    hits = eng.search_flat("flagship", 5, q)
    return (
        hits.join(F.broadcast(docs), hits.label == docs.doc_id, "left")
        .select("qid", "rank", "label", "distance", "lang", "source")
        .orderBy("qid", "rank")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """EXACTLY 50 entries — the driver harness records at most 50 CORRECTNESS
    rows (r01 ran a 55-entry contract and the last 5 dict keys got no row).
    Pruned/merged vs r01 so nothing falls off the end:
    - q34 merged into q33 (one string-surface query, same operators);
    - q28_union_all dropped (UNION ALL is not on the reference surface,
      SURVEY.md §2.2; exercised in tests/test_sql_surface.py);
    - q20_sample dropped (rows-only by design; exact-size seeded sampling is
      pinned in tests/test_sample.py instead);
    - knn_cosine dropped (COSINE kernel stays oracle-green via dedup_cosine
      and pytest metric goldens);
    - knn_engine_ip dropped (the engine float32 search path is exercised by
      ann_ivf_knn / ann_ivfpq_knn below and numpy-golden-pinned in
      tests/test_engine.py);
    - ann_pq_knn replaced by ann_ivfpq_knn (PQ now rides the engine factory);
    - q25_distinct_count folded into q05 (COUNT(DISTINCT) as a fourth agg)
      to make room for ann_hnsw_knn;
    - text_fingerprint folded into text_stats (r8) to make room for
      media_jpeg_decode while keeping ann_hnsw_knn inside the cap;
    - q13_values rotated to curation_signals (r12), q15_unnest rotated to
      corpus_mix_exact (r13) — both retirees keep direct DuckDB-parity
      pytest pins in tests/test_sources.py.
    Order: oracled queries first, rows-only (no-oracle) entries last, so a
    time-budgeted harness still hash-checks everything checkable."""
    return {
        "q01_scan_filter": q01_scan_filter,
        "q02_cast_modulo": q02_cast_modulo,
        "q03_equi_join": q03_equi_join,
        "q04_join_groupby": q04_join_groupby,
        "q05_agg_multi": q05_agg_multi,
        "q06_argmax": q06_argmax,
        "q07_window_topk": q07_window_topk,
        "q08_topk_limit": q08_topk_limit,
        "q09_except": q09_except,
        "q10_cte": q10_cte,
        "q11_round_expr": q11_round_expr,
        "q12_range": q12_range,
        "curation_signals": curation_signals,
        "q14_array_construct": q14_array_construct,
        # q15_unnest rotated out (r13): explode machinery stays oracled via
        # q14/q23/knn flattening; direct explode-vs-UNNEST parity pinned in
        # tests/test_sources.py.  Its slot now gates the exact-mix sampler.
        "corpus_mix_exact": corpus_mix_exact,
        "q19_events_agg": q19_events_agg,
        "q21_time_window": q21_time_window,
        "q22_lag_window": q22_lag_window,
        "q23_transform_lambda": q23_transform_lambda,
        "q24_multiway_join": q24_multiway_join,
        "q26_date_functions": q26_date_functions,
        "q27_having_avg": q27_having_avg,
        "q29_anti_join": q29_anti_join,
        "q30_rollup": q30_rollup,
        "q31_in_subquery": q31_in_subquery,
        "q32_case_agg": q32_case_agg,
        "q33_string_ops": q33_string_ops,
        # text/dedup contract rows (absent from r01's capped run — keep early)
        "text_stats": text_stats,
        "text_quality": text_quality,
        "text_lang": text_lang,
        # text_fingerprint merged into text_stats (r8): same table, same
        # functions — fp/msfp columns now hash-check inside text_stats and
        # keep direct pytest pins (tests/test_text.py:54,63)
        "dedup_exact": dedup_exact,
        # dedup_minhash_sig pruned from the 50-entry budget (r4): the
        # signature construction is transitively oracled inside
        # dedup_lsh_pairs and directly pytest-pinned (tests/test_dedup.py)
        "dedup_lsh_pairs": dedup_lsh_pairs,
        "dedup_jaccard_pairs": dedup_jaccard_pairs,
        # dedup_components pruned from the 50-entry budget (r4): the
        # component structure is transitively oracled by dedup_survivors
        # (same recursive-CTE twin, plus the anti-join application) and
        # pytest-pinned (tests/test_dedup.py chains test)
        "dedup_survivors": dedup_survivors,
        "dedup_cosine": dedup_cosine,
        # vector / pipeline (oracled)
        "knn_ip": knn_ip,
        "knn_l2": knn_l2,
        "knn_filtered": knn_filtered,
        "knn_majority_vote": knn_majority_vote,
        "similarity_join_topk": similarity_join_topk,
        "vector_centroids": vector_centroids,
        "sessionize_events": sessionize_events,
        "sessionize_native": sessionize_native_q,
        "media_features": media_features,
        "media_jpeg_decode": media_jpeg_decode,
        "dedup_simhash": dedup_simhash,
        # rows-only (no SQL oracle by design) — deliberately last
        "ann_ivf_knn": ann_ivf_knn,
        "ann_lsh_knn": ann_lsh_knn,
        "ann_ivfpq_knn": ann_ivfpq_knn,
        "ann_hnsw_knn": ann_hnsw_knn,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_scan_filter": (
            "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem "
            "WHERE l_quantity > 45"
        ),
        "q02_cast_modulo": (
            "SELECT o_orderkey, CAST(FLOOR(o_totalprice) AS BIGINT) AS tp "
            "FROM orders WHERE o_orderkey % 100 < 7"
        ),
        "q03_equi_join": (
            "SELECT c_custkey, o_orderkey FROM customer "
            "JOIN orders ON c_custkey = o_custkey WHERE o_totalprice > 150000"
        ),
        "q04_join_groupby": (
            "SELECT n_name, COUNT(*) AS cnt FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "q05_agg_multi": (
            "SELECT o_custkey, COUNT(*) AS cnt, MAX(o_totalprice) AS mx, "
            "MIN(o_orderdate) AS first_dt, "
            "COUNT(DISTINCT o_orderpriority) AS nprio "
            "FROM orders GROUP BY o_custkey"
        ),
        "q06_argmax": (
            "SELECT o_custkey, MIN(o_orderkey) AS ok FROM orders o "
            "WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2 "
            "WHERE o2.o_custkey = o.o_custkey) GROUP BY o_custkey"
        ),
        "q07_window_topk": (
            "SELECT o_orderkey, o_custkey, rk FROM ("
            "SELECT o_orderkey, o_custkey, ROW_NUMBER() OVER ("
            "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk "
            "FROM orders) t WHERE rk <= 3"
        ),
        "q08_topk_limit": (
            "SELECT l_orderkey, l_extendedprice FROM lineitem "
            "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100"
        ),
        "q09_except": (
            "SELECT c_custkey FROM customer "
            "EXCEPT SELECT o_custkey AS c_custkey FROM orders"
        ),
        "q10_cte": (
            "WITH big AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders "
            "GROUP BY o_custkey) SELECT k, c FROM big WHERE c > 10"
        ),
        "q11_round_expr": (
            "SELECT l_orderkey, FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) / 100.0 AS net "
            "FROM lineitem WHERE l_linenumber = 1"
        ),
        "q12_range": ("SELECT i, i % 100 AS sel FROM range(0, 1000) t(i)"),
        # exact DuckDB twin of the repetition Arrow kernel (same formulation
        # as tests/test_curation.py's _rep_oracle_sql, over the documents
        # view; gram positions come from unnest(generate_series(1, len(t)))
        # so the bound is derived per-row, never a fixture-dependent constant
        # (ADVICE r12: a hardcoded 128 would silently under-count grams the
        # day a fixture doc crosses it and fail as a confusing hash mismatch)
        "curation_signals": (
            "WITH base AS (SELECT doc_id, "
            "coalesce(length(text), 0) AS n_chars, "
            "list_filter(string_split(coalesce(text, ''), chr(10)), "
            "l -> length(trim(l)) > 0) AS lines, "
            "regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS t "
            "FROM documents), "
            "linesig AS (SELECT doc_id, n_chars, len(lines) AS n_lines, "
            "(len(lines) - len(list_distinct(lines))) "
            "/ greatest(len(lines), 1)::DOUBLE AS dlf, "
            "(coalesce(list_sum(list_transform(lines, l -> length(l))), 0) "
            "- coalesce(list_sum(list_transform(list_distinct(lines), "
            "l -> length(l))), 0)) "
            "/ greatest(coalesce(list_sum(list_transform(lines, "
            "l -> length(l))), 0), 1)::DOUBLE AS dlcf, t FROM base), "
            "grams AS (SELECT doc_id, n, "
            "array_to_string(t[i : i + n - 1], ' ') AS gram FROM ("
            "SELECT b.doc_id, nv.n, b.t, "
            "unnest(generate_series(1, len(b.t) - nv.n + 1)) AS i "
            "FROM linesig b JOIN (VALUES (2), (5)) nv(n) "
            "ON len(b.t) >= nv.n)), "
            "counted AS (SELECT doc_id, n, gram, count(*) AS cnt, "
            "count(*) * length(gram) AS cov FROM grams "
            "GROUP BY doc_id, n, gram), "
            "sig AS (SELECT b.doc_id, b.n_chars, b.n_lines, b.dlf, b.dlcf, "
            "coalesce(max(CASE WHEN c.n = 2 THEN "
            "{'cnt': c.cnt, 'cov': c.cov} END).cov "
            "/ greatest(b.n_chars, 1), 0.0) AS t2, "
            "coalesce(sum(CASE WHEN c.n = 5 AND c.cnt > 1 THEN c.cov END) "
            "/ greatest(b.n_chars, 1), 0.0) AS d5 "
            "FROM linesig b LEFT JOIN counted c USING (doc_id) "
            "GROUP BY b.doc_id, b.n_chars, b.n_lines, b.dlf, b.dlcf) "
            "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, "
            "CAST(n_lines AS BIGINT) AS n_lines, "
            "FLOOR(dlf * 10000.0 + 0.5) / 10000.0 AS dup_line_frac, "
            "FLOOR(dlcf * 10000.0 + 0.5) / 10000.0 AS dup_line_char_frac, "
            "FLOOR(t2 * 10000.0 + 0.5) / 10000.0 AS top_2gram_frac, "
            "FLOOR(d5 * 10000.0 + 0.5) / 10000.0 AS dup_5gram_frac, "
            "CASE WHEN dlf > 0.30 THEN 'filtered:max_dup_line_frac' "
            "WHEN dlcf > 0.20 THEN 'filtered:max_dup_line_char_frac' "
            "WHEN t2 > 0.20 THEN 'filtered:max_top_ngram_frac_2' "
            "WHEN d5 > 0.15 THEN 'filtered:max_dup_ngram_frac_5' "
            "ELSE 'kept' END AS disposition FROM sig"
        ),
        "q14_array_construct": (
            "SELECT l_orderkey, l_linenumber, "
            "array_to_string(list_transform([l_quantity, l_discount, l_tax], "
            "x -> CAST(CAST(FLOOR(x * 10000.0 + 0.5) AS BIGINT) AS VARCHAR)), ',') AS arr "
            "FROM lineitem WHERE l_orderkey < 100"
        ),
        # exact DuckDB twin of sample_corpus_mix(exact=True): same md5 draw
        # formula as mix_hash (first 8 hex chars / 2^32), same (draw, id)
        # order, row_number prefix per source.  rn <= CASE yields min(k, n)
        # for over-budget sources and drops zero/absent targets — identical
        # to the Spark sampler's contract.
        "corpus_mix_exact": (
            "WITH d AS (SELECT doc_id, source, "
            "('0x' || substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 8))"
            "::BIGINT / 4294967296.0 AS draw FROM documents), "
            "r AS (SELECT doc_id, source, row_number() OVER ("
            "PARTITION BY source ORDER BY draw, doc_id) AS rn FROM d) "
            "SELECT doc_id, source FROM r WHERE rn <= CASE source "
            "WHEN 'src0' THEN 9 WHEN 'src1' THEN 17 WHEN 'src2' THEN 40 "
            "WHEN 'src5' THEN 5 ELSE 0 END"
        ),
        "q19_events_agg": (
            "SELECT user_id, event_type, COUNT(*) AS cnt, "
            "FLOOR(SUM(value) * 100.0 + 0.5) / 100.0 AS sv FROM events GROUP BY user_id, event_type"
        ),
        "q23_transform_lambda": (
            "SELECT l_orderkey, l_linenumber, "
            "array_to_string(list_transform("
            "list_transform([l_quantity, l_tax], x -> x * 2 + 1), "
            "x -> CAST(CAST(FLOOR(x * 10000.0 + 0.5) AS BIGINT) AS VARCHAR)), ',') AS mapped, "
            "list_aggregate([l_quantity, l_tax], 'sum') + 0.0 AS arr_sum "
            "FROM lineitem WHERE l_orderkey < 100"
        ),
        "q24_multiway_join": (
            "SELECT o_orderkey, COUNT(*) AS n_lines, "
            "FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 "
            "AS revenue FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_nationkey < 10 GROUP BY o_orderkey"
        ),
        "q26_date_functions": (
            "SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y, "
            "CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m, "
            "COUNT(*) AS cnt, MAX(o_totalprice) AS mx FROM orders GROUP BY 1, 2"
        ),
        "q27_having_avg": (
            "SELECT o_orderpriority, "
            "FLOOR(AVG(o_totalprice) * 100.0 + 0.5) / 100.0 AS avg_price, "
            "COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority "
            "HAVING COUNT(*) > 100"
        ),
        "q29_anti_join": (
            "SELECT c_custkey, c_nationkey FROM customer "
            "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"
        ),
        "q30_rollup": (
            "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt "
            "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"
        ),
        "q31_in_subquery": (
            "SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey IN "
            "(SELECT n_nationkey FROM nation WHERE n_regionkey = 1)"
        ),
        "q32_case_agg": (
            "SELECT o_orderpriority, "
            "CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS big, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY o_orderpriority"
        ),
        "q33_string_ops": (
            "SELECT p_partkey, UPPER(p_name) AS un, "
            "CAST(LENGTH(p_name) AS BIGINT) AS ln, "
            "SUBSTR(p_name, 1, 12) AS head12, "
            "CONCAT('part:', CAST(p_partkey AS VARCHAR)) AS tag, "
            "REPLACE(p_name, ' ', '_') AS unders "
            "FROM part WHERE p_name LIKE '%red%'"
        ),
        "q21_time_window": (
            "SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', "
            "CAST(ts AS TIMESTAMP))) AS BIGINT) "
            "AS ws, event_type, COUNT(*) AS cnt, "
            "FLOOR(SUM(value) * 100.0 + 0.5) / 100.0 AS sv "
            "FROM events GROUP BY 1, 2"
        ),
        "q22_lag_window": (
            "SELECT event_id, user_id, "
            "value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv "
            "FROM events"
        ),
        "knn_ip": (
            "WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id < 10), "
            "t AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS tv "
            "FROM embeddings), "
            "d AS (SELECT qid, id, list_inner_product(qv, tv) AS ip_full "
            "FROM q CROSS JOIN t) "
            "SELECT qid, id, FLOOR(ip_full * 10000.0 + 0.5) / 10000.0 AS ip, rk FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY qid "
            "ORDER BY ip_full DESC, id) AS rk FROM d) WHERE rk <= 10"
        ),
        "knn_l2": (
            "WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id < 10), "
            "t AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS tv "
            "FROM embeddings), "
            "d AS (SELECT qid, id, list_distance(qv, tv) ** 2 AS d_full "
            "FROM q CROSS JOIN t) "
            "SELECT qid, id, FLOOR(d_full * 10000.0 + 0.5) / 10000.0 AS l2sq, rk FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY qid "
            "ORDER BY d_full ASC, id) AS rk FROM d) WHERE rk <= 10"
        ),
        "knn_filtered": (
            "WITH allowed AS (SELECT vec_id AS id FROM embeddings WHERE vec_id % 2 = 0), "
            "q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id < 10), "
            "t AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS tv "
            "FROM embeddings WHERE vec_id IN (SELECT id FROM allowed)), "
            "d AS (SELECT qid, id, list_inner_product(qv, tv) AS ip_full "
            "FROM q CROSS JOIN t) "
            "SELECT qid, id, rk FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY qid "
            "ORDER BY ip_full DESC, id) AS rk FROM d) WHERE rk <= 5"
        ),
        "knn_majority_vote": (
            "WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id < 20), "
            "t AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS tv "
            "FROM embeddings), "
            "d AS (SELECT qid, id, list_inner_product(qv, tv) AS ip_full "
            "FROM q CROSS JOIN t), "
            "nn AS (SELECT qid, id FROM (SELECT *, ROW_NUMBER() OVER ("
            "PARTITION BY qid ORDER BY ip_full DESC, id) AS rk FROM d) "
            "WHERE rk <= 5), "
            "v AS (SELECT nn.qid, CAST(e.label AS BIGINT) AS nlabel, "
            "CAST(COUNT(*) AS BIGINT) AS votes FROM nn "
            "JOIN embeddings e ON nn.id = e.vec_id GROUP BY nn.qid, e.label) "
            "SELECT qid, nlabel AS pred, votes FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY qid "
            "ORDER BY votes DESC, nlabel) AS vr FROM v) WHERE vr = 1"
        ),
        "similarity_join_topk": (
            "WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv "
            "FROM embeddings WHERE vec_id < 8), "
            "t AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS tv "
            "FROM embeddings), "
            "d AS (SELECT qid, id, list_inner_product(qv, tv) AS ip_full "
            "FROM q CROSS JOIN t) "
            "SELECT qid, rk, id, FLOOR(ip_full * 10000.0 + 0.5) / 10000.0 AS ip "
            "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid "
            "ORDER BY ip_full DESC, id) AS rk FROM d) WHERE rk <= 4"
        ),
        "sessionize_events": (
            "WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value "
            "FROM events), "
            "f AS (SELECT user_id, ts_ms, value, "
            "CASE WHEN ts_ms - LAG(ts_ms) OVER (PARTITION BY user_id "
            "ORDER BY ts_ms) > 1800000 THEN 1 ELSE 0 END AS nf FROM ev), "
            "s AS (SELECT user_id, ts_ms, value, SUM(nf) OVER ("
            "PARTITION BY user_id ORDER BY ts_ms) AS sid FROM f) "
            "SELECT user_id, MIN(ts_ms) AS session_start_ms, "
            "MAX(ts_ms) AS session_end_ms, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "FLOOR(SUM(value) * 100.0 + 0.5) / 100.0 AS sv "
            "FROM s GROUP BY user_id, sid"
        ),
        "sessionize_native": (
            "WITH ev AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value "
            "FROM events), "
            "f AS (SELECT user_id, ts_ms, value, "
            "CASE WHEN ts_ms - LAG(ts_ms) OVER (PARTITION BY user_id "
            "ORDER BY ts_ms) > 1800000 THEN 1 ELSE 0 END AS nf FROM ev), "
            "s AS (SELECT user_id, ts_ms, value, SUM(nf) OVER ("
            "PARTITION BY user_id ORDER BY ts_ms) AS sid FROM f) "
            "SELECT user_id, MIN(ts_ms) AS session_start_ms, "
            "MAX(ts_ms) AS session_end_ms, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "FLOOR(SUM(value) * 100.0 + 0.5) / 100.0 AS sv "
            "FROM s GROUP BY user_id, sid"
        ),
        "vector_centroids": (
            "WITH x AS (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v, "
            "generate_subscripts(embedding, 1) AS i FROM embeddings), "
            "per AS (SELECT label, i, AVG(v) AS av FROM x GROUP BY label, i) "
            "SELECT label, array_to_string(list("
            "CAST(CAST(FLOOR(av * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR) "
            "ORDER BY i), ',') AS centroid FROM per GROUP BY label"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS cnt "
            "FROM documents GROUP BY md5(text)"
        ),
        "dedup_lsh_pairs": (
            "WITH w AS (SELECT doc_id, list_transform("
            "generate_series(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1)), "
            "i -> md5(array_to_string((string_split_regex(trim(text), '\\s+'))[i:i+2], ' '))"
            ") AS gh FROM documents), "
            "sig AS (SELECT doc_id, "
            + ", ".join(
                f"list_min(list_transform(gh, x -> substr(x, {1 + 8 * i}, 8)))"
                f" AS mh_{i}"
                for i in range(4)
            )
            + " FROM w), "
            "bands AS ("
            "SELECT doc_id, 0 AS band, md5(concat(mh_0, mh_1)) AS bkey FROM sig "
            "UNION ALL "
            "SELECT doc_id, 1 AS band, md5(concat(mh_2, mh_3)) AS bkey FROM sig) "
            "SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.band AS band "
            "FROM bands a JOIN bands b "
            "ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id"
        ),
        "dedup_jaccard_pairs": (
            "WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws "
            "FROM documents), "
            "g AS (SELECT doc_id AS _id, unnest(list_distinct(list_transform("
            "generate_series(1, greatest(len(ws) - 2, 1)), "
            "i -> array_to_string(ws[i:i+2], ' ')))) AS gram FROM w), "
            "sizes AS (SELECT _id, COUNT(*) AS sz FROM g GROUP BY _id), "
            "inter AS (SELECT a._id AS id_a, b._id AS id_b, COUNT(*) AS inter "
            "FROM g a JOIN g b ON a.gram = b.gram AND a._id < b._id "
            "GROUP BY a._id, b._id) "
            "SELECT id_a, id_b, inter / (sa.sz + sb.sz - inter) AS jac "
            "FROM inter JOIN sizes sa ON sa._id = id_a "
            "JOIN sizes sb ON sb._id = id_b "
            "WHERE inter / (sa.sz + sb.sz - inter) >= 0.05"
        ),
        "dedup_survivors": (
            "WITH RECURSIVE w AS (SELECT doc_id, "
            "string_split_regex(trim(text), '\\s+') AS ws FROM documents), "
            "g AS (SELECT doc_id AS _id, unnest(list_distinct(list_transform("
            "generate_series(1, greatest(len(ws) - 2, 1)), "
            "i -> array_to_string(ws[i:i+2], ' ')))) AS gram FROM w), "
            "sizes AS (SELECT _id, COUNT(*) AS sz FROM g GROUP BY _id), "
            "inter AS (SELECT a._id AS id_a, b._id AS id_b, COUNT(*) AS inter "
            "FROM g a JOIN g b ON a.gram = b.gram AND a._id < b._id "
            "GROUP BY a._id, b._id), "
            "jac AS (SELECT id_a, id_b FROM inter "
            "JOIN sizes sa ON sa._id = id_a JOIN sizes sb ON sb._id = id_b "
            "WHERE inter / (sa.sz + sb.sz - inter) >= 0.05), "
            "edges AS (SELECT id_a AS a, id_b AS b FROM jac "
            "UNION SELECT id_b, id_a FROM jac), "
            "nodes AS (SELECT DISTINCT a AS id FROM edges), "
            "reach AS (SELECT id, id AS comp FROM nodes "
            "UNION SELECT e.b AS id, r.comp FROM reach r "
            "JOIN edges e ON e.a = r.id), "
            "comp AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id) "
            "SELECT doc_id FROM documents WHERE doc_id NOT IN "
            "(SELECT id FROM comp WHERE id <> comp)"
        ),
        "dedup_cosine": (
            "WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
            "FROM embeddings), "
            "p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "list_inner_product(a.v, b.v) / (sqrt(list_inner_product(a.v, a.v)) "
            "* sqrt(list_inner_product(b.v, b.v))) AS cos_full "
            "FROM t a JOIN t b ON a.vec_id < b.vec_id) "
            "SELECT id_a, id_b, FLOOR(cos_full * 10000.0 + 0.5) / 10000.0 AS cos "
            "FROM p WHERE cos_full > 0.4"
        ),
        "text_stats": (
            "WITH w AS (SELECT doc_id, text, "
            "string_split_regex(trim(text), '\\s+') AS ws FROM documents) "
            "SELECT doc_id, "
            "CAST(len(ws) AS BIGINT) AS tc, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS rtc, "
            "CAST(length(text) AS BIGINT) AS cc, "
            "CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS pc, "
            "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp, "
            "list_min(list_transform(generate_series(1, greatest(len(ws) - 4, 1)), "
            "i -> md5(array_to_string(ws[i:i+4], ' ')))) AS msfp "
            "FROM w"
        ),
        "text_quality": (
            "WITH s AS (SELECT doc_id, "
            "CAST(length(text) AS DOUBLE) AS chars, "
            "CAST(greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS DOUBLE) AS toks, "
            "CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct, "
            "CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
            "w -> list_contains(['the','a','and','of','to','is'], w))) AS DOUBLE) AS stop "
            "FROM documents) "
            "SELECT doc_id, FLOOR(("
            "0.5 * least(chars / 500.0, 1.0) "
            "+ 0.3 * (1.0 - least(punct / toks, 1.0)) "
            "+ 0.2 * least(stop / toks * 5.0, 1.0)"
            ") * 10000.0 + 0.5) / 10000.0 AS q FROM s"
        ),
        "text_lang": (
            "WITH s AS (SELECT doc_id, "
            "length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk, "
            "len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
            "w -> list_contains(['the','a','and','of','to','is'], w))) AS en, "
            "len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
            "w -> list_contains(['el','la','y','de','que','los'], w))) AS es, "
            "len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
            "w -> list_contains(['der','die','das','und','ist','ein'], w))) AS de, "
            "len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
            "w -> list_contains(['le','la','et','les','des','est'], w))) AS fr "
            "FROM documents) "
            "SELECT doc_id, CASE WHEN cjk > 0 THEN 'zh' "
            "WHEN en > 0 AND es <= en AND de <= en AND fr <= en THEN 'en' "
            "WHEN es > 0 AND en < es AND de <= es AND fr <= es THEN 'es' "
            "WHEN de > 0 AND en < de AND es < de AND fr <= de THEN 'de' "
            "WHEN fr > 0 AND en < fr AND es < fr AND de < fr THEN 'fr' "
            "ELSE 'und' END AS lang_guess FROM s"
        ),
        # the selected feature columns (byte length + sha256 hex) ARE
        # SQL-expressible even though the numpy feature vector is not —
        # the oracle checks the Arrow-batched extractor's metadata output
        "media_features": (
            "SELECT doc_id AS media_id, "
            "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
            "sha256(text) AS content_hash FROM documents"
        ),
        # bit-exact SimHash twin: same md5-nibble-high-bit construction as
        # operators/dedup.simhash32_md5
        "dedup_simhash": (
            "WITH w AS (SELECT doc_id AS _id, "
            "md5(unnest(string_split_regex(trim(text), '\\s+'))) AS hx "
            "FROM documents), "
            "s AS (SELECT _id, "
            + ", ".join(
                f"SUM(CASE WHEN strpos('89abcdef', substr(hx, {j + 1}, 1)) > 0 "
                f"THEN 1 ELSE -1 END) AS b{j}"
                for j in range(32)
            )
            + " FROM w GROUP BY _id) "
            "SELECT _id AS doc_id, CAST("
            + " + ".join(
                f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)"
                for j in range(32)
            )
            + " AS BIGINT) AS simhash FROM s"
        ),
        # ann_* entries: the query emits DETERMINISTIC per-query invariant
        # booleans (seeded KMeans/planes), so the oracle is the constant
        # TRUE table — k-padding + recall-floor + admission all hash-checked
        # (VERDICT r5 task 5; the approximate NEIGHBOR SETS themselves stay
        # non-oracled by nature, which is exactly what the booleans encode)
        # deterministic JPEG round-trip invariants (same constant-oracle
        # pattern as ann_*): DuckDB can't decode JFIF, but the booleans are
        # exact
        "media_jpeg_decode": (
            "SELECT CAST(i AS BIGINT) AS i, TRUE AS shape_ok, "
            "TRUE AS decode_ok, TRUE AS nonempty "
            "FROM range(16) t(i) ORDER BY i"
        ),
        "ann_ivf_knn": _ANN_ORACLE,
        "ann_lsh_knn": _ANN_ORACLE,
        "ann_hnsw_knn": _ANN_ORACLE,
        "ann_ivfpq_knn": _ANN_ORACLE,
    }
