"""Auto-routing of corpus-scale query sides onto the executor-side bulk
plans (VERDICT r4 task 1).

The reference's query side never serializes through a coordinator — it
arrives as DataChunks inside the host pipeline (faiss_extension.cpp:
913-916).  The engine must therefore pick the executor-side bulk plan for
a big query side WITHOUT the caller knowing the ``bulk_queries`` knob,
while an explicit 0/1 still overrides the estimate.
"""

import pyspark.sql.functions as F
import pytest

from duckdb_faiss_ext_spark import FaissSparkEngine
from duckdb_faiss_ext_spark.plans import explain_str as _plan


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture()
def eng(spark):
    e = FaissSparkEngine(spark)
    yield e
    for name in e.list_indexes():
        e.destroy(name)


def _rows(df):
    return sorted((r["qid"], r["rank"], r["label"]) for r in df.collect())


def test_large_query_side_auto_routes_to_bulk_join(eng, emb):
    """IVF search with a query side above the threshold and NO params must
    take the executor-side block equi-join (a join on the cluster id in the
    plan), with results identical to the driver block stream."""
    eng.create("route_ivf", 64, "IDMap,IVF4,Flat", metric_type="INNER_PRODUCT")
    eng.add("route_ivf", emb.select("vec_id", "embedding"))
    eng.BULK_QUERY_THRESHOLD = 32  # instance override for test scale
    q = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("vector"))
    auto = eng.search_flat("route_ivf", 5, q, params={"nprobe": 2})
    plan = _plan(auto)
    # the bulk grouped path equi-joins packed block tables on the group key
    assert "Join" in plan and "CartesianProduct" not in plan
    driver = eng.search_flat(
        "route_ivf", 5, q, params={"nprobe": 2, "bulk_queries": 0}
    )
    assert "Join" not in _plan(driver).replace("CartesianProduct", "")
    assert _rows(auto) == _rows(driver)


def test_explicit_zero_overrides_estimate(eng, emb):
    """bulk_queries=0 forces the driver stream even above the threshold."""
    eng.create("route_flat", 64, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("route_flat", emb.select("vec_id", "embedding"))
    eng.BULK_QUERY_THRESHOLD = 8
    q = emb.limit(64).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    forced = eng.search_flat("route_flat", 3, q, params={"bulk_queries": 0})
    assert "Join" not in _plan(forced)


def test_small_query_side_stays_on_driver_path(eng, emb):
    """A query side below the default threshold keeps the driver stream —
    and when the side is a limit/cache, routing costs ZERO extra jobs
    (Catalyst row-count statistics answer the estimate)."""
    eng.create("route_small", 64, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("route_small", emb.select("vec_id", "embedding"))
    q = emb.limit(4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    assert eng._query_rows_estimate(q, eng.BULK_QUERY_THRESHOLD) == 4
    out = eng.search_flat("route_small", 3, q)
    assert "Join" not in _plan(out)
    assert out.count() == 12


def test_flat_bulk_results_match_driver(eng, emb):
    """Flat-index bulk (block-nested-loop) returns the driver path's exact
    rows, including the (score, label) tie-break."""
    eng.create("route_bnl", 64, "IDMap,Flat", metric_type="L2")
    eng.add("route_bnl", emb.select("vec_id", "embedding"))
    eng.BULK_QUERY_THRESHOLD = 16
    q = emb.limit(40).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    bulk = eng.search_flat("route_bnl", 4, q)  # 40 > 16 -> auto bulk
    driver = eng.search_flat("route_bnl", 4, q, params={"bulk_queries": 0})
    assert _rows(bulk) == _rows(driver)


def test_limit_bigger_than_frame_does_not_force_bulk(eng, emb, spark):
    """ADVICE r5: maxRows/rowCount are UPPER bounds — queries.limit(200k)
    over a tiny frame must probe the real count and stay on the driver
    stream, not auto-route 40 rows onto the bulk plan."""
    eng.create("route_ub", 64, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("route_ub", emb.select("vec_id", "embedding"))
    q = (
        emb.limit(40)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("vector"))
        .limit(200_000)
    )
    assert eng._query_rows_estimate(q, 1000) == 40
    out = eng.search_flat("route_ub", 3, q)
    assert "Join" not in _plan(out)


def test_routing_probe_memoized_per_plan(eng, emb, spark):
    """VERDICT r5 task 4: the bounded limit(cap+1).count() routing probe
    runs AT MOST once per distinct query plan per session — the second
    search of the same frame launches no extra probe job."""
    eng.create("route_memo", 64, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("route_memo", emb.select("vec_id", "embedding"))
    # a frame with NO static row count (filter blocks limit/local stats)
    q = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    cap = eng.BULK_QUERY_THRESHOLD
    before = len(eng._route_cache)
    n1 = eng._query_rows_estimate(q, cap)
    assert len(eng._route_cache) == before + 1
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    n2 = eng._query_rows_estimate(q, cap)  # same plan -> cache hit
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    assert n2 == n1
    assert jobs_after == jobs_before  # zero extra Spark jobs


def test_exact_bigness_free_for_cached_frame(eng, emb, spark):
    """ADVICE r6: a materialized cached query side carries an EXACT Catalyst
    rowCount — bigness is proven without a probe job (the route cache stays
    empty because no probe ran)."""
    q = (
        emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("vector"))
        .cache()
    )
    try:
        n = q.count()  # materialize -> InMemoryRelation stats become exact
        before = len(eng._route_cache)
        assert eng._query_rows_estimate(q, cap=10) == n  # n > cap, still free
        assert len(eng._route_cache) == before  # no probe was memoized
    finally:
        q.unpersist()


def test_route_cache_cleared_on_add(eng, emb, spark):
    """ADVICE r6: index mutation invalidates memoized routing estimates so a
    growing query source gets re-probed on the next search."""
    eng.create("route_inv", 64, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("route_inv", emb.select("vec_id", "embedding"))
    q = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    eng._query_rows_estimate(q, eng.BULK_QUERY_THRESHOLD)
    assert len(eng._route_cache) == 1
    eng.add("route_inv", emb.limit(5).select("vec_id", "embedding"))
    assert len(eng._route_cache) == 0
