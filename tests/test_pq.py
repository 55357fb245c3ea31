import numpy as np
import pyspark.sql.functions as F
import pytest

from duckdb_faiss_ext_spark.operators.pq import pq_encode, pq_search, pq_train
from duckdb_faiss_ext_spark.operators.topk import exact_knn_flat


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("label"), F.col("embedding").alias("vector")
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, dim=64, m=8, sample=512)


def test_train_shapes_and_determinism(emb, books):
    assert books.shape == (8, 256, 8)
    again = pq_train(emb, dim=64, m=8, sample=512)
    assert np.array_equal(books, again)


def test_encode_compression_and_range(spark, emb, books):
    codes = pq_encode(emb, books)
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r["code"]) == 8
        assert all(0 <= c < 256 for c in r["code"])


def test_adc_recall_vs_exact(spark, emb, books):
    """ADC is approximate, but on 500 vectors with 8x8 codebooks recall@10
    against the exact L2 kernel must clear 0.5, and self-hit (rank 0 = the
    query itself) must hold for most queries."""
    codes = pq_encode(emb, books).cache()
    codes.count()
    q = emb.filter(F.col("label") < 20).select(
        F.col("label").alias("qid"), F.col("vector")
    )
    approx = pq_search(codes, q, books, 10, metric="L2")
    a_hits = {(r["qid"], r["label"]) for r in approx.collect()}
    exact = exact_knn_flat(emb, q, 10, metric="L2")
    e_hits = {(r["qid"], r["label"]) for r in exact.collect()}
    recall = len(a_hits & e_hits) / len(e_hits)
    assert recall >= 0.5, recall
    top1 = {
        r["qid"]: r["label"]
        for r in approx.collect()
        if r["rank"] == 0
    }
    self_hits = sum(1 for qid, lab in top1.items() if qid == lab)
    assert self_hits >= 15, top1


def test_adc_scores_close_to_true_l2(spark, emb, books):
    """ADC distance approximates true squared L2 within quantization error
    (relative error bounded on normalized vectors)."""
    codes = pq_encode(emb, books)
    q = emb.filter(F.col("label") == 0).select(
        F.col("label").alias("qid"), F.col("vector")
    )
    adc = {r["label"]: r["distance"] for r in pq_search(codes, q, books, 5, metric="L2").collect()}
    true = {
        r["label"]: r["distance"]
        for r in exact_knn_flat(emb, q, 5, metric="L2").collect()
    }
    common = set(adc) & set(true)
    assert common
    for lab in common:
        assert abs(adc[lab] - true[lab]) < 0.5, (lab, adc[lab], true[lab])
