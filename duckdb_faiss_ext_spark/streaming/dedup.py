"""Streaming deduplication — watermark-bounded exact dedup for ingest feeds.

The reference has no streaming surface (SURVEY.md §2.2), but a training-data
ingest pipeline at 100 TB/day is a stream, and its first operator is dedup.
This is the streaming twin of operators/dedup.exact_dedup_groups: the same
content key (md5 of the raw text) decides identity; state is bounded by the
event-time watermark so the dedup map cannot grow without limit.

Scale design: ``dropDuplicatesWithinWatermark`` keeps one state entry per
distinct key within the watermark horizon, partitioned by key hash across
executors — no driver state, no unbounded growth.  Batch DataFrames run the
same helper with a plain dropDuplicates (identical semantics when the whole
input is one "batch").
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_content_key(
    df: DataFrame, text_col: str = "text", key_col: str = "content_key"
) -> DataFrame:
    """Content-identity key: md5 of the raw bytes (operators/dedup parity)."""
    return df.withColumn(key_col, F.md5(F.col(text_col)))


def dedup_stream(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first document per content key within the watermark horizon.

    Works on both streaming and batch DataFrames: streams get
    ``withWatermark`` + ``dropDuplicatesWithinWatermark`` (state bounded by
    the horizon); batch frames use plain ``dropDuplicates`` on the same key
    (a batch has a single global horizon), so tests can pin semantics in
    batch mode and the streaming plan is identical modulo state expiry.
    """
    keyed = with_content_key(df, text_col)
    if keyed.isStreaming:
        return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_key"]
        )
    return keyed.dropDuplicates(["content_key"])
