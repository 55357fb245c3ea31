"""Streaming ingestion walkthrough: file source -> dedup -> sessionize ->
live vector-index ingest, each stage the engine's real streaming operator.

  1. watermarked content dedup   — dropDuplicatesWithinWatermark on a
                                   content key (state bounded by watermark)
  2. event-time sessionization   — session_window aggregation with late-data
                                   watermark (Catalyst-native state)
  3. streaming index ingest      — foreachBatch -> engine.add (O(batch) per
                                   micro-batch; the index grows live and is
                                   searchable between batches)

Sources here are file streams over the driver testdata (this container has
no Kafka), but every stage is source-agnostic — `readStream.format("kafka")`
drops in unchanged.  Run:  python examples/streaming_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from duckdb_faiss_ext_spark import FaissSparkEngine
    from duckdb_faiss_ext_spark.session import get_spark
    from duckdb_faiss_ext_spark.streaming.dedup import dedup_stream
    from duckdb_faiss_ext_spark.streaming.ingest import stream_add
    from duckdb_faiss_ext_spark.streaming.sessionize import sessionize_native

    spark = get_spark("streaming-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stream_demo_")
    try:
        # stage the batch testdata as file-stream sources (one file = one
        # micro-batch's worth; a real deployment points at kafka/object-store)
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        docs.withColumn("ts", F.current_timestamp()).write.parquet(
            os.path.join(work, "docs_src")
        )
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        emb.write.parquet(os.path.join(work, "emb_src"))
        events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        dim = len(emb.select("embedding").first()[0])

        # 1. watermarked streaming dedup ------------------------------------
        doc_stream = spark.readStream.schema(
            "doc_id bigint, text string, ts timestamp"
        ).parquet(os.path.join(work, "docs_src"))
        deduped = dedup_stream(doc_stream, "text", watermark="10 minutes")
        q1 = (
            deduped.writeStream.format("memory")
            .queryName("clean_docs")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

        # 2. event-time sessionization (batch twin of the stateful stream) --
        from duckdb_faiss_ext_spark.streaming.ingest import events_ts_ms

        sessions = sessionize_native(
            events.select(
                "user_id", events_ts_ms(events).alias("ts_ms"), "value"
            ),
            gap_seconds=30 * 60,
        )

        # 3. live index ingest ----------------------------------------------
        eng = FaissSparkEngine(spark)
        eng.create("live", dim, "IDMap,Flat", metric_type="INNER_PRODUCT")
        vec_stream = spark.readStream.schema(
            "vec_id bigint, embedding array<float>"
        ).parquet(os.path.join(work, "emb_src"))
        q3 = stream_add(
            eng,
            "live",
            vec_stream.select(
                F.col("vec_id").alias("label"), F.col("embedding").alias("vector")
            ),
            checkpointLocation=os.path.join(work, "ckpt"),
        )

        q1.awaitTermination(120)
        q3.processAllAvailable()
        q3.stop()

        n_clean = spark.sql("SELECT COUNT(*) c FROM clean_docs").first()["c"]
        print(f"deduped docs streamed:  {n_clean}")
        print(f"sessions (event-time):  {sessions.count()}")
        probe = emb.limit(4).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
        )
        hits = eng.search_flat("live", 3, probe)
        self_hits = hits.filter(F.col("rank") == 0).filter(
            F.col("qid") == F.col("label")
        )
        print(f"live index self-hits:   {self_hits.count()}/4 (IP rank-0)")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
