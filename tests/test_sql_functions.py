import math

import pytest

from duckdb_faiss_ext_spark.functions.register import register_sql_functions


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    names = register_sql_functions(spark)
    assert "vec_inner_product" in names


def test_vector_sql_functions(spark):
    r = spark.sql(
        "SELECT vec_inner_product(array(1D,2D), array(3D,4D)) AS ip, "
        "vec_negative_inner_product(array(1D,2D), array(3D,4D)) AS nip, "
        "vec_l2sq(array(0D,0D), array(3D,4D)) AS l2, "
        "vec_cosine(array(1D,0D), array(1D,0D)) AS cos"
    ).first()
    assert r["ip"] == 11.0 and r["nip"] == -11.0
    assert r["l2"] == 25.0  # squared, FAISS convention
    assert r["cos"] == pytest.approx(1.0)


def test_sql_knn_end_to_end(spark, sf_dir):
    """The reference's SQL experience: brute-force kNN straight from SQL
    (benches_c.go:207 shape) using the registered functions."""
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView("sqlknn_emb")
    rows = spark.sql(
        """
        WITH scored AS (
          SELECT t.vec_id AS id,
                 vec_inner_product(CAST(q.embedding AS ARRAY<DOUBLE>),
                                   CAST(t.embedding AS ARRAY<DOUBLE>)) AS ip_full
          FROM sqlknn_emb t CROSS JOIN (SELECT * FROM sqlknn_emb WHERE vec_id = 0) q
        )
        SELECT id, round_half_up(ip_full, 4) AS ip FROM scored
        ORDER BY ip_full DESC, id LIMIT 3
        """
    ).collect()
    assert rows[0]["id"] == 0 and rows[0]["ip"] == pytest.approx(1.0, abs=1e-4)
    assert len(rows) == 3


def test_text_sql_functions(spark):
    r = spark.sql(
        "SELECT text_token_count('  a b   c ') AS tc, "
        "text_fingerprint('Hello   World') AS f1, "
        "text_fingerprint('hello world') AS f2"
    ).first()
    assert r["tc"] == 3
    assert r["f1"] == r["f2"]


def test_similarity_join(spark, sf_dir):
    import pyspark.sql.functions as F

    from duckdb_faiss_ext_spark.operators.simjoin import similarity_join

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    left = emb.limit(5).select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    right = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vector"))
    out = similarity_join(left, right, k=2)
    rows = out.collect()
    assert len(rows) == 10
    top = {r["id"]: r["id_right"] for r in rows if r["rank"] == 0}
    assert all(lid == rid for lid, rid in top.items())  # self at rank 0
