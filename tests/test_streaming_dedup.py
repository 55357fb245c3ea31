import os
import time

import pyspark.sql.functions as F

from duckdb_faiss_ext_spark.streaming.dedup import dedup_stream, with_content_key


def _rows():
    # doc 0 and 2 share identical text; doc 4 duplicates doc 1
    return [
        (0, "2024-01-01 00:00:01", "the quick brown fox"),
        (1, "2024-01-01 00:00:02", "lorem ipsum dolor"),
        (2, "2024-01-01 00:00:03", "the quick brown fox"),
        (3, "2024-01-01 00:00:04", "unique document"),
        (4, "2024-01-01 00:00:05", "lorem ipsum dolor"),
    ]


def test_batch_dedup_semantics(spark):
    df = spark.createDataFrame(_rows(), "doc_id bigint, ts string, text string").select(
        "doc_id", F.col("ts").cast("timestamp").alias("ts"), "text"
    )
    out = dedup_stream(df).collect()
    assert len(out) == 3
    assert len({r["text"] for r in out}) == 3


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    df = spark.createDataFrame(_rows(), "doc_id bigint, ts string, text string").select(
        "doc_id", F.col("ts").cast("timestamp").alias("ts"), "text"
    )
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id bigint, ts timestamp, text string").parquet(src)
    out = dedup_stream(stream, watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM dedup_out").collect()
    finally:
        q.stop()
    assert len(got) == 3
    assert len({r["text"] for r in got}) == 3


def test_content_key_matches_batch_dedup_operator(spark, sf_dir):
    """Same md5 identity as operators/dedup.exact_dedup_groups: group count
    over content_key equals that operator's group count."""
    from duckdb_faiss_ext_spark.operators.dedup import exact_dedup_groups

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keyed = with_content_key(docs)
    n_keys = keyed.select("content_key").distinct().count()
    n_groups = exact_dedup_groups(docs, "doc_id", "text").count()
    assert n_keys == n_groups
