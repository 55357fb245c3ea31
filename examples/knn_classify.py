"""End-to-end k-NN classification pipeline — the Spark re-expression of the
reference's examples/ai.py (cit: /root/reference/examples/ai.py:7-60).

Reference flow: CSV -> row_number ids -> seeded reservoir samples (train /
held-out test, EXCEPT dedup) -> sbert embed -> FAISS_CREATE/ADD ->
FAISS_SEARCH(k=5) -> UNNEST -> join labels back -> majority vote -> accuracy.

This version runs on the driver testdata (documents + embeddings tables;
no transformer in the container, embeddings are precomputed) and uses the
engine's public API for every step.  Run:

    python examples/knn_classify.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F
from pyspark.sql import Window

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark

    spark = get_spark("knn-classify")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    # seeded exact-size samples (ai.py:9 'USING SAMPLE 500 (reservoir, 42)');
    # EXCEPT keeps test disjoint from training (ai.py:10)
    train = emb.orderBy(F.rand(42)).limit(400).cache()
    test = emb.subtract(train).orderBy(F.rand(43)).limit(50).cache()

    eng = FaissSparkEngine(spark)
    dim = len(emb.select("embedding").first()[0])  # ai.py:39 max(length(emb))
    eng.create("clf", dim, "IDMap,Flat", metric_type="INNER_PRODUCT")
    eng.add("clf", train.select("vec_id", "embedding"))

    # search + explode = FAISS_SEARCH + UNNEST (ai.py:45)
    q = test.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("vector"))
    hits = eng.search_flat("clf", 5, q)

    # join neighbor labels back (ai.py:47)
    train_labels = train.select(
        F.col("vec_id").alias("label"), F.col("label").alias("neighbor_class")
    )
    votes = (
        hits.join(F.broadcast(train_labels), "label")
        .groupBy("qid", "neighbor_class")
        .agg(F.count("*").alias("sentiment_count"))
    )

    # majority vote via the per-group-argmax pattern (ai.py:54-56's correlated
    # subquery, idiomatic-Spark form: window max + filter + min tie-break)
    w = Window.partitionBy("qid")
    pred = (
        votes.withColumn("mx", F.max("sentiment_count").over(w))
        .filter(F.col("sentiment_count") == F.col("mx"))
        .groupBy("qid")
        .agg(F.min("neighbor_class").alias("predicted"))
    )

    # accuracy vs ground truth (ai.py:60)
    truth = test.select(F.col("vec_id").alias("qid"), F.col("label").alias("actual"))
    scored = pred.join(truth, "qid").withColumn(
        "correct", (F.col("predicted") == F.col("actual")).cast("int")
    )
    n, correct = scored.count(), scored.agg(F.sum("correct")).first()[0]
    print(f"classified {n} held-out docs, accuracy = {correct / n:.3f}")
    assert n == 50
    spark.stop()


if __name__ == "__main__":
    main()
