"""Structured Streaming integration.

The reference has NO streaming operators (SURVEY.md §2.2: grep of src/ is
empty); its incremental ``faiss_add`` is micro-batch append, which maps
directly onto ``foreachBatch``.  This module provides that mapping plus the
standard streaming pieces a training-data pipeline needs over the ``events``
table shape (watermark + windowed aggregation).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_add(engine, index_name: str, stream_df: DataFrame, **write_opts) -> StreamingQuery:
    """Micro-batch append into a vector index: each micro-batch runs the
    engine's (batch) add — the Spark-native version of incremental
    faiss_add (faiss_extension.cpp:475-547, trained fast path).

    Per-batch cost is O(batch): add() persists/counts only the new slice.
    For long-lived streams create the index with
    ``params={'storage_path': dir}`` — each micro-batch then appends one
    parquet slice and the index keeps a FLAT lineage (a single scan node)
    no matter how many batches arrive; memory-mode indexes instead grow a
    lazy union compacted TIERED every MAX_SLICES adds (only small slices
    merge and rebuild graphs, so total build work over the stream's life
    is O(n log n) — steady-state contract in README 'Streaming adds into
    graph indexes')."""

    def feed(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        engine.add(index_name, batch_df, validate=False)

    return (
        stream_df.writeStream.foreachBatch(feed)
        .outputMode("append")
        .options(**write_opts)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the canonical
    late-data-tolerant streaming aggregation.  Works on a readStream or batch
    DataFrame (batch ignores the watermark), so tests can pin values in batch
    mode and streams reuse the identical plan."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def _ts_micros_sql(events: DataFrame, ts_col: str) -> str:
    """SQL expression yielding epoch MICROSECONDS (bigint) for ``ts_col``,
    whatever physical type the parquet writer chose.  The driver's testdata
    has stored events.ts as parquet TIMESTAMP(NANOS) (read as BIGINT nanos
    under ``nanosAsLong``) in one round and timestamp[us] (read as
    TIMESTAMP_NTZ) in the next — the engine's contract is to accept any of
    bigint-nanos / TIMESTAMP_NTZ / TIMESTAMP and normalize identically.

    Integer arithmetic throughout (DIV / timestampdiff), never float
    division: epoch-ns (~1.7e18) exceeds double's 2^53 exact range and a
    ±1us wobble shifts window/session boundaries off the DuckDB oracle.
    The NTZ branch measures from the NTZ epoch literal so no session
    timezone is ever consulted — matching DuckDB's epoch_us(ts) view of a
    naive timestamp."""
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    dt = events.schema[ts_col].dataType
    if isinstance(dt, LongType):  # TIMESTAMP(NANOS) via nanosAsLong
        return f"{ts_col} DIV 1000"
    if isinstance(dt, TimestampNTZType):  # parquet timestamp[us]
        return (
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        )
    if isinstance(dt, TimestampType):
        return f"unix_micros({ts_col})"
    raise TypeError(
        f"events.{ts_col} has unsupported dtype {dt}; expected "
        "bigint (nanos), timestamp_ntz, or timestamp"
    )


def events_ts_micros(events: DataFrame, ts_col: str = "ts"):
    """Column: epoch microseconds of ``ts_col`` (dtype-adaptive, exact)."""
    return F.expr(_ts_micros_sql(events, ts_col))


def events_ts_ms(events: DataFrame, ts_col: str = "ts"):
    """Column: epoch milliseconds of ``ts_col`` (dtype-adaptive, exact floor
    division — the sessionization operators key on ms)."""
    return F.expr(f"({_ts_micros_sql(events, ts_col)}) DIV 1000")


def events_ts_as_timestamp(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize ``ts_col`` to a proper TIMESTAMP column (microsecond
    precision) for windowing, regardless of the parquet physical type —
    see ``_ts_micros_sql`` for the accepted dtypes and exactness rules."""
    return events.withColumn(
        ts_col, F.timestamp_micros(events_ts_micros(events, ts_col))
    )
