"""Plan-shape regression tests: the physical properties that make these
queries survive a 100x scale-up.  Loose substring checks on the formatted
plan (resilient to cosmetic plan-format changes)."""

import pyspark.sql.functions as F

from duckdb_faiss_ext_spark.plans import explain_str as _plan
from duckdb_faiss_ext_spark.plans import scan_summary


def test_scan_pushdown_and_pruning(spark, sf_dir):
    import __spark_entry__ as e

    plan = _plan(e.q01_scan_filter(spark, sf_dir))
    assert "PushedFilters" in plan and "GreaterThan(l_quantity,45.0)" in plan
    # column pruning: only the 3 selected columns reach the scan
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double>" in plan


def test_knn_partial_topk_below_exchange(spark, sf_dir):
    """Top-k must be applied map-side (WindowGroupLimit) BEFORE the shuffle —
    the property that bounds shuffle volume to nq*k rows per partition."""
    import __spark_entry__ as e

    plan = _plan(e.knn_ip(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    pre, _, post = plan.partition("Exchange")
    assert "WindowGroupLimit" in pre or plan.count("WindowGroupLimit") >= 2


def test_small_dim_broadcast(spark, sf_dir):
    import __spark_entry__ as e

    plan = _plan(e.q04_join_groupby(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_partial_aggregation(spark, sf_dir):
    """groupBy must map-side combine (two HashAggregates around the shuffle)."""
    import __spark_entry__ as e

    plan = _plan(e.q05_agg_multi(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_topk_limit_is_take_ordered(spark, sf_dir):
    import __spark_entry__ as e

    plan = _plan(e.q08_topk_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no full sort for ORDER BY+LIMIT


def test_filtered_search_is_semi_join(spark, sf_dir):
    """Engine filtered search: the allowed-set restriction must appear as a
    semi-join before top-k, not a post-filter."""
    from duckdb_faiss_ext_spark import FaissSparkEngine

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.createOrReplaceTempView("plan_emb")
    eng = FaissSparkEngine(spark)
    eng.create("plan_idx", 64, "IDMap,Flat")
    eng.add("plan_idx", emb.select("vec_id", "embedding"))
    q = emb.limit(2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    flat = eng.search_flat(
        "plan_idx", 3, q,
        allowed_df=spark.sql("SELECT vec_id FROM plan_emb WHERE vec_id % 2 = 0"),
    )
    plan = _plan(flat)
    assert "LeftSemi" in plan
    eng.destroy("plan_idx")


def test_lsh_ann_bucket_join_not_cartesian(spark, sf_dir):
    """LSH candidate discovery must be an equi-join on (table, bucket) with
    the tiny query side broadcast — never a cartesian product."""
    from duckdb_faiss_ext_spark.operators.lsh import lsh_ann_cosine

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select(F.col("vec_id").alias("label"), F.col("embedding").alias("vector"))
    q = emb.limit(4).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("vector"))
    plan = _plan(lsh_ann_cosine(corpus, q, 5, 64))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_sessionize_partial_aggregation(spark, sf_dir):
    """Session aggregation must map-side combine: the post-window shuffle
    carries one partial row per (user, session), not one per event."""
    from duckdb_faiss_ext_spark.streaming.ingest import events_ts_ms
    from duckdb_faiss_ext_spark.streaming.sessionize import sessionize_batch

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = raw.select("user_id", events_ts_ms(raw).alias("ts_ms"), "value")
    plan = _plan(sessionize_batch(ev, gap_seconds=1800))
    assert plan.count("HashAggregate") >= 2


def test_scan_summary_structure(spark, sf_dir):
    """plans.scan_summary surfaces pushdown info per parquet scan."""
    import __spark_entry__ as e

    scans = scan_summary(e.q01_scan_filter(spark, sf_dir))
    assert len(scans) == 1
    assert "lineitem" in scans[0]["location"]
    assert "l_quantity" in (scans[0]["pushed_filters"] or "")


def test_dedup_lsh_self_join_is_hash_equi_join(spark, sf_dir):
    """MinHash LSH candidate generation must self-join on (band, bkey) as a
    hash equi-join — a cartesian of the exploded band table is the n²
    failure mode the banding exists to prevent."""
    from duckdb_faiss_ext_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(minhash_lsh_pairs(docs, "doc_id", "text", 4, 2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grouped_simjoin_is_equi_join_not_cartesian(spark, sf_dir):
    """similarity_join_grouped (the bulk-IVF shape) must join blocks on the
    group key — a cartesian/BNL of the block tables would defeat cluster
    pruning at scale."""
    from duckdb_faiss_ext_spark.operators.simjoin import similarity_join_grouped

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    left = emb.limit(20).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector"),
        (F.col("vec_id") % 4).alias("cluster_id"),
    )
    right = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector"),
        (F.col("vec_id") % 4).alias("cluster_id"),
    )
    plan = _plan(similarity_join_grouped(left, right, 3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
