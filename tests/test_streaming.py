import time

import numpy as np
import pytest
import pyspark.sql.functions as F

from duckdb_faiss_ext_spark import FaissSparkEngine
from duckdb_faiss_ext_spark.streaming.ingest import (
    events_ts_as_timestamp,
    stream_add,
    windowed_event_counts,
)


def test_windowed_counts_batch_semantics(spark, sf_dir):
    """Same plan runs batch & stream; pin batch values on real events data."""
    ev = events_ts_as_timestamp(spark.read.parquet(f"{sf_dir}/events.parquet"))
    out = windowed_event_counts(ev, window="1 hour", watermark="2 hours")
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["window_end"] > r["window_start"] for r in rows)
    total = sum(r["cnt"] for r in rows)
    assert total == ev.count()  # tumbling windows partition the stream


def test_stream_add_microbatch(spark, tmp_path):
    """foreachBatch ingestion: rows appended by the stream become searchable."""
    src = str(tmp_path / "stream_src")
    import os

    os.makedirs(src, exist_ok=True)
    eng = FaissSparkEngine(spark)
    eng.create("stream_idx", 4, "IDMap,Flat", metric_type="L2")

    rows = [(int(i), [float(i), 0.0, 0.0, 0.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "label bigint, vector array<float>")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("label bigint, vector array<float>").parquet(src)
    q = stream_add(eng, "stream_idx", stream,
                   checkpointLocation=str(tmp_path / "ckpt"))
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            if eng.registry.get("stream_idx").count >= 8:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert eng.registry.get("stream_idx").count == 8
    qdf = spark.createDataFrame([(0, [3.0, 0.0, 0.0, 0.0])], "qid bigint, vector array<float>")
    res = eng.search_flat("stream_idx", 1, qdf).collect()
    assert res[0]["label"] == 3 and res[0]["distance"] == 0.0


def test_stream_add_into_pretrained_ivfpq(spark, tmp_path):
    """Streaming micro-batches into a PRE-TRAINED IVFPQ index: each batch
    assigns clusters + encodes residual codes (the trained fast path —
    no retraining per batch), and the compressed index stays searchable."""
    import os

    import numpy as np

    from conftest import gen_vectors

    src = str(tmp_path / "pq_stream_src")
    os.makedirs(src, exist_ok=True)
    eng = FaissSparkEngine(spark)
    x = gen_vectors(600, 8, 9)
    train = spark.createDataFrame(
        [([float(v) for v in x[i]],) for i in range(600)], "vector array<float>"
    )
    eng.create("pq_stream", 8, "IDMap,IVF4,PQ4", metric_type="L2")
    eng.manual_train("pq_stream", train)

    rows = [(int(i), [float(v) for v in x[i]]) for i in range(64)]
    spark.createDataFrame(rows, "label bigint, vector array<float>").coalesce(
        1
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("label bigint, vector array<float>").parquet(src)
    q = stream_add(eng, "pq_stream", stream,
                   checkpointLocation=str(tmp_path / "pq_ckpt"))
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            if eng.registry.get("pq_stream").count >= 64:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    idx = eng.registry.get("pq_stream")
    assert idx.count == 64
    assert "code" in idx.data.columns and "vector" not in idx.data.columns
    qdf = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in (5, 40)],
        "qid bigint, vector array<float>",
    )
    res = eng.search_flat("pq_stream", 3, qdf, params={"nprobe": 4}).collect()
    assert len(res) == 6
    self_hits = sum(1 for r in res if r["rank"] == 0 and r["qid"] == r["label"])
    assert self_hits >= 1  # ADC approximation


def test_stream_add_graph_index_tiered_compaction(spark, tmp_path):
    """Micro-batch stream into an HNSW index: every batch builds its own
    micro-segments and the tiered auto-compaction merges them (VERDICT r5
    task 2 steady state) — the stream's graph stays searchable and the
    slice bookkeeping stays consistent throughout."""
    import os

    src = str(tmp_path / "gstream_src")
    os.makedirs(src, exist_ok=True)
    eng = FaissSparkEngine(spark)
    eng.MAX_SLICES = 3  # compact early at test scale
    eng.create(
        "gstream_idx", 4, "IDMap,HNSW8", metric_type="L2",
        params={"graph_partition_rows": "16"},
    )
    n_batches, batch = 4, 8
    for b in range(n_batches):
        rows = [
            (b * batch + i, [float(b * batch + i), 0.0, 0.0, 0.0])
            for i in range(batch)
        ]
        spark.createDataFrame(rows, "label bigint, vector array<float>").coalesce(
            1
        ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("label bigint, vector array<float>")
        .option("maxFilesPerTrigger", 1)  # one true micro-batch per file
        .parquet(src)
    )
    q = stream_add(eng, "gstream_idx", stream,
                   checkpointLocation=str(tmp_path / "gckpt"))
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            q.processAllAvailable()
            if eng.registry.get("gstream_idx").count >= n_batches * batch:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    idx = eng.registry.get("gstream_idx")
    assert idx.count == n_batches * batch
    assert sum(idx.slice_rows) == n_batches * batch
    assert len(idx.slices) < n_batches  # tiered compaction merged micros
    # graph stream steady state: explicit compact, then every row reachable
    eng.compact("gstream_idx")
    qdf = spark.createDataFrame(
        [(i, [float(i * 7), 0.0, 0.0, 0.0]) for i in range(4)],
        "qid bigint, vector array<float>",
    )
    res = eng.search_flat("gstream_idx", 1, qdf, params={"efSearch": 32}).collect()
    assert all(r["label"] == r["qid"] * 7 and r["distance"] == 0.0 for r in res)
