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
    # Q05 count/max/min aggregates (ai.py:39,54)
    return (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("cnt"),
            F.max("o_totalprice").alias("mx"),
            F.min("o_orderdate").alias("first_dt"),
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


def q13_values(spark, sf):
    # Q13 VALUES inline table (faiss7.test:19-22)
    return spark.createDataFrame(
        [(231, 1, "x"), (232, 2, "y")], "id int, doc int, txt string"
    )


def q14_array_construct(spark, sf):
    # Q14 array construct (faiss.test:11 list_value) — elements double both sides
    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array("l_quantity", "l_discount", "l_tax").alias("arr"),
    )


def q15_unnest(spark, sf):
    # Q15 unnest/explode (faiss3.test:23 UNNEST)
    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 50)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.explode(F.array("l_quantity", "l_tax")).alias("v"),
    )


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
    allowed = e.filter(F.col("vec_id") % 2 == 0).select(F.col("vec_id").alias("id"))
    t = e.select(F.col("vec_id").alias("id"), F.col("embedding").alias("tv")).join(
        F.broadcast(allowed), "id", "left_semi"
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


def knn_engine_ip(spark, sf):
    """The engine's float32 Arrow/numpy fast path (FaissSparkEngine.search) —
    FAISS-parity float32 math, so no double-precision SQL oracle; the driver
    records a rows-only check and pytest pins numpy goldens."""
    from duckdb_faiss_ext_spark import FaissSparkEngine

    e = _emb(spark, sf)
    eng = FaissSparkEngine(spark)
    eng.create("_entry_ip", 64, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("_entry_ip", e.select("vec_id", "embedding"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    return eng.search_flat("_entry_ip", 10, q)


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
        "q13_values": q13_values,
        "q14_array_construct": q14_array_construct,
        "q15_unnest": q15_unnest,
        "q19_events_agg": q19_events_agg,
        "knn_ip": knn_ip,
        "knn_l2": knn_l2,
        "knn_filtered": knn_filtered,
        "knn_engine_ip": knn_engine_ip,
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
            "MIN(o_orderdate) AS first_dt FROM orders GROUP BY o_custkey"
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
        "q13_values": (
            "SELECT * FROM (VALUES (231, 1, 'x'), (232, 2, 'y')) v(id, doc, txt)"
        ),
        "q14_array_construct": (
            "SELECT l_orderkey, l_linenumber, "
            "[l_quantity, l_discount, l_tax] AS arr "
            "FROM lineitem WHERE l_orderkey < 100"
        ),
        "q15_unnest": (
            "SELECT l_orderkey, l_linenumber, UNNEST([l_quantity, l_tax]) AS v "
            "FROM lineitem WHERE l_orderkey < 50"
        ),
        "q19_events_agg": (
            "SELECT user_id, event_type, COUNT(*) AS cnt, "
            "FLOOR(SUM(value) * 100.0 + 0.5) / 100.0 AS sv FROM events GROUP BY user_id, event_type"
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
        # knn_engine_ip intentionally omitted: float32 FAISS-parity path,
        # rows-only check (see docstring)
    }
