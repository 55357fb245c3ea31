"""Reference golden-fixture parity: replay the reference's OWN sqllogictests
(test/sql/faiss.test:17-38, faiss2.test:18-43, faiss3.test:23-68) against
this engine using the reference's actual fixtures —
test/sql/training.csv (1000x8) and test/sql/queries.csv (10x8).

The reference's default metric is METRIC_INNER_PRODUCT
(src/faiss_extension.cpp:105); its goldens are float32 FAISS distances,
descending within each query's k=2 ranks.  A user porting reference
workloads checks this first (r2 VERDICT missing #2)."""

import os

import pytest
import pyspark.sql.functions as F

from duckdb_faiss_ext_spark import FaissSparkEngine
from duckdb_faiss_ext_spark.sources.loaders import read_csv

REF_SQL = "/root/reference/test/sql"

# test/sql/faiss.test:17-38 — SELECT UNNEST(faiss_search('flat8', 2, ...))
# .distance FROM queries.csv; 20 rows in (query, rank) order.
GOLD_DISTANCES = [
    2.3337207, 2.2165565,
    3.5882926, 3.336133,
    4.2489142, 4.133893,
    3.3984408, 3.1702023,
    2.8143706, 2.7383637,
    3.7191334, 3.6072645,
    2.866281, 2.8265002,
    4.5306416, 4.3778625,
    4.809322, 4.7254314,
    5.233301, 5.0149097,
]

# test/sql/faiss3.test:23-45 — (rank, label) with the same distances, after
# IDMap add of (column0, vector).
GOLD_LABELS = [
    374, 59,
    374, 676,
    768, 880,
    374, 623,
    374, 623,
    59, 880,
    999, 904,
    374, 676,
    880, 955,
    943, 374,
]

# test/sql/faiss3.test:47-68 — faiss_search_filter(..., 'column0>100',
# 'column0', 'training'): (rank, label, round(distance, 5)).
GOLD_FILTERED = [
    (0, 374, 2.33372), (1, 676, 2.17094),
    (0, 374, 3.58829), (1, 676, 3.33613),
    (0, 768, 4.24891), (1, 880, 4.13389),
    (0, 374, 3.39844), (1, 623, 3.1702),
    (0, 374, 2.81437), (1, 623, 2.73836),
    (0, 880, 3.60726), (1, 374, 3.60568),
    (0, 999, 2.86628), (1, 904, 2.8265),
    (0, 374, 4.53064), (1, 676, 4.37786),
    (0, 880, 4.80932), (1, 955, 4.72543),
    (0, 943, 5.2333), (1, 374, 5.01491),
]

def _vec8():
    return F.array(*[F.col(f"_c{i}").cast("float") for i in range(1, 9)])


@pytest.fixture(scope="module")
def engine(spark):
    return FaissSparkEngine(spark)


needs_fixtures = pytest.mark.skipif(
    not os.path.exists(f"{REF_SQL}/training.csv"),
    reason="reference fixtures not present",
)


@pytest.fixture(scope="module")
def ref_frames(spark):
    # the reference CSVs are headerless: column0 = id, column1..8 = vector
    # (DuckDB names them columnN; Spark names them _cN)
    train = read_csv(spark, f"{REF_SQL}/training.csv", header=False).select(
        F.col("_c0").cast("bigint").alias("lbl"), _vec8().alias("emb")
    ).cache()
    queries = read_csv(spark, f"{REF_SQL}/queries.csv", header=False).select(
        F.col("_c0").cast("bigint").alias("qid"), _vec8().alias("vector")
    ).cache()
    assert train.count() == 1000 and queries.count() == 10
    return train, queries


@needs_fixtures
def test_faiss_test_distances(engine, ref_frames):
    """faiss.test:17-38: Flat (auto ids), k=2, default metric — the 20
    golden float32 inner-product distances, descending per query."""
    train, queries = ref_frames
    engine.create("ref_flat8", 8, "Flat")
    engine.add("ref_flat8", train.select("emb"))
    res = (
        engine.search_flat("ref_flat8", 2, queries)
        .orderBy("qid", "rank")
        .collect()
    )
    assert len(res) == 20
    for r, gold in zip(res, GOLD_DISTANCES):
        assert r["distance"] == pytest.approx(gold, rel=1e-5)


@needs_fixtures
def test_faiss3_test_labels_and_distances(engine, ref_frames):
    """faiss3.test:23-45 (and the faiss2.test:18-43 label-join form):
    IDMap,Flat labeled add, k=2 — golden (rank, label, distance) rows."""
    train, queries = ref_frames
    engine.create("ref_idmap8", 8, "IDMap,Flat")
    engine.add("ref_idmap8", train)
    res = (
        engine.search_flat("ref_idmap8", 2, queries)
        .orderBy("qid", "rank")
        .collect()
    )
    assert len(res) == 20
    for i, (r, gold_d) in enumerate(zip(res, GOLD_DISTANCES)):
        assert r["rank"] == i % 2
        assert r["label"] == GOLD_LABELS[i]
        assert r["distance"] == pytest.approx(gold_d, rel=1e-5)


@needs_fixtures
def test_faiss3_test_filtered(engine, spark, ref_frames):
    """faiss3.test:47-68: faiss_search_filter with 'column0>100' over the
    training table — golden (rank, label, distance-rounded-to-5) rows."""
    train, queries = ref_frames
    engine.create("ref_filt8", 8, "IDMap,Flat")
    engine.add("ref_filt8", train)
    train.select(F.col("lbl").alias("column0")).createOrReplaceTempView(
        "ref_training"
    )
    res = (
        engine.search_filter(
            "ref_filt8", 2, queries, "column0 > 100", "column0", "ref_training"
        )
        .select("qid", F.explode("result").alias("h"))
        .select("qid", "h.rank", "h.label", "h.distance")
        .orderBy("qid", "rank")
        .collect()
    )
    assert len(res) == 20
    for r, (gold_rank, gold_lbl, gold_d) in zip(res, GOLD_FILTERED):
        assert r["rank"] == gold_rank
        assert r["label"] == gold_lbl
        assert r["distance"] == pytest.approx(gold_d, abs=5e-5)


def test_faiss7_filter_empty_allowed_set(engine, spark):
    """faiss7.test: FAISS_SEARCH_FILTER with filter 'id%2==0' over a table
    whose only row (id 231) fails it — empty allowed set must return the
    k-padded empty result, not error.  Also covers the '==' filter syntax
    (DuckDB and Spark SQL both accept it)."""
    import pyspark.sql.functions as F

    engine.create("ref_demo", 2, "IDMap,Flat")
    engine.add(
        "ref_demo",
        spark.createDataFrame(
            [(231, [0.0040321066, 0.023423655])], "id bigint, vector array<float>"
        ),
    )
    spark.createDataFrame(
        [(231, 1, "~K~E~A", False)],
        "id bigint, document_id int, text string, indexed boolean",
    ).createOrReplaceTempView("ref_demo_table")
    q = spark.createDataFrame(
        [(0, [-0.04529257, 0.024853613])], "qid bigint, vector array<float>"
    )
    out = engine.search_filter(
        "ref_demo", 2, q, "id%2==0", "id", "ref_demo_table"
    ).collect()
    assert len(out) == 1
    hits = out[0]["result"]
    assert len(hits) == 2  # k-padded
    assert all(h["label"] == -1 for h in hits)  # nothing passes the filter


def test_faiss_add_ids_with_train_ivf1(engine, spark):
    """faiss_add_ids_with_train copy.test: IDMap,IVF1,Flat accepts a labeled
    single-vector add — train-on-first-add with nlist=1 and exactly one
    training point (n >= nlist boundary)."""
    engine.create("ref_ivf1", 2, "IDMap,IVF1,Flat")
    engine.add(
        "ref_ivf1",
        spark.createDataFrame(
            [(231, [0.0040321066, 0.023423655])], "id bigint, vector array<float>"
        ),
    )
    q = spark.createDataFrame(
        [(0, [0.004, 0.023])], "qid bigint, vector array<float>"
    )
    res = engine.search_flat("ref_ivf1", 1, q).collect()
    assert len(res) == 1 and res[0]["label"] == 231
