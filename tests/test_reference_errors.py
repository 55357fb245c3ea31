"""Reference error-path parity: replay the reference's statement-error
sqllogictests (test/sql/faiss4.test:19-22, faiss5.test, faiss6.test:7-10,
:28-37) against this engine using the reference's own training.csv fixture.

The reference asserts exact error strings through DuckDB's statement-error
blocks; here the parity contract is (a) the same action fails, (b) with the
engine's typed exception, and (c) the message carries the same actionable
hint (IDMap prefix / unknown metric name)."""

import os

import pytest
import pyspark.sql.functions as F

from duckdb_faiss_ext_spark import FaissSparkEngine
from duckdb_faiss_ext_spark.errors import InvalidMetric, NonIDMapLabels
from duckdb_faiss_ext_spark.sources.loaders import read_csv

REF_SQL = "/root/reference/test/sql"

needs_fixture = pytest.mark.skipif(
    not os.path.exists(f"{REF_SQL}/training.csv"),
    reason="reference fixture csv not present",
)


@pytest.fixture()
def training(spark):
    """The reference's training.csv as (column0 BIGINT, emb ARRAY<FLOAT>) —
    the list_value(column1..column8) shape faiss4/faiss6 build."""
    df = read_csv(spark, f"{REF_SQL}/training.csv", header=False)
    cols = df.columns
    return df.select(
        F.col(cols[0]).cast("bigint").alias("column0"),
        F.array(*[F.col(c).cast("float") for c in cols[1:9]]).alias("emb"),
    )


@needs_fixture
def test_faiss4_add_with_ids_on_non_idmap(spark, training):
    """faiss4.test:19-22 / faiss6.test:28-32: faiss_add with (id, vector) on a
    plain 'Flat' index is a statement error telling the user to prefix IDMap;
    the follow-up unlabeled add (:24-25 / :34-35) succeeds on the SAME index."""
    eng = FaissSparkEngine(spark)
    eng.create("flat8_f4", 8, "Flat")
    with pytest.raises(NonIDMapLabels, match="IDMap"):
        eng.add("flat8_f4", training.select("column0", "emb"))
    # reference continues: the unlabeled add is accepted afterwards
    eng.add("flat8_f4", training.select("emb"))
    assert eng.registry.get("flat8_f4").count == 1000
    eng.destroy("flat8_f4")


@needs_fixture
def test_faiss5_create_destroy_recreate(spark):
    """faiss5.test: create -> destroy -> create again under the same name is
    three statement-ok's (destroy releases the name)."""
    eng = FaissSparkEngine(spark)
    eng.create("demo_f5", 8, "IDMap,Flat")
    eng.destroy("demo_f5")
    eng.create("demo_f5", 8, "IDMap,Flat")  # must not raise
    eng.destroy("demo_f5")


def test_faiss6_unknown_metric(spark):
    """faiss6.test:7-10: metric_type='Invalid' is a statement error naming the
    metric; the same create with metric_type='L2' (:12-13) succeeds."""
    eng = FaissSparkEngine(spark)
    with pytest.raises(InvalidMetric, match="Invalid"):
        eng.create("flat8_f6", 8, "Flat", metric_type="Invalid")
    eng.create("flat8_f6", 8, "Flat", metric_type="L2")
    eng.destroy("flat8_f6")


@needs_fixture
def test_faiss6_create_params_hnsw(spark, training):
    """faiss6.test:15-16: faiss_create_params('hnsw16', 8, 'HNSW16',
    map{'efConstruction': 32}, metric_type='INNER_PRODUCT') is statement-ok
    and the index accepts adds + searches."""
    eng = FaissSparkEngine(spark)
    eng.create(
        "hnsw16_f6",
        8,
        "HNSW16",
        metric_type="INNER_PRODUCT",
        params={"efConstruction": "32"},
    )
    eng.add("hnsw16_f6", training.select("emb"))
    q = training.limit(2).select(
        F.col("column0").alias("qid"), F.col("emb").alias("vector")
    )
    rows = eng.search_flat("hnsw16_f6", 2, q).collect()
    assert len(rows) == 4
    eng.destroy("hnsw16_f6")


def test_faiss_to_gpu_error_order_matches_reference(spark):
    """faiss_to_gpu (faiss_extension.cpp:1044): unknown index raises ITS
    error before any GPU work (gpu.cpp:40 'Could not find index'); a known
    index raises a clear unsupported error — never a silent no-op."""
    import pytest

    from duckdb_faiss_ext_spark.errors import FaissSparkError, IndexNotFound

    eng = FaissSparkEngine(spark)
    with pytest.raises(IndexNotFound):
        eng.to_gpu("no_such_index")
    eng.create("gpu_probe", 4, "Flat")
    with pytest.raises(FaissSparkError, match="not supported"):
        eng.to_gpu("gpu_probe", device=0)
    eng.destroy("gpu_probe")
