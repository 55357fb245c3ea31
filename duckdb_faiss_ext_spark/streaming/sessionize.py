"""Custom stateful streaming operator: gap-based sessionization.

The canonical ``applyInPandasWithState`` example of a stateful operator Spark
doesn't ship: group events by user, close a session when no event arrives
within ``gap`` seconds (event time), emit one row per closed session.

State per user = (session_start_ms, last_seen_ms, n_events, sum_value).
Timeout-driven: sessions close either because a newer event proves the gap
passed, or because the processing-time timeout fires with no new data.

`sessionize_batch` is the batch-mode twin (pure DataFrame ops) with identical
semantics — tests pin values in batch mode and cross-check the streaming
operator against it.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start_ms", LongType(), False),
        StructField("session_end_ms", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType(), False),
        StructField("last_ms", LongType(), False),
        StructField("n", LongType(), False),
        StructField("sv", DoubleType(), False),
    ]
)


def _sessionize_fn(gap_ms: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        rows = pd.concat(list(pdfs)) if not state.hasTimedOut else pd.DataFrame()
        closed = []
        if state.exists:
            start_ms, last_ms, n, sv = state.get
        else:
            start_ms = None
        if state.hasTimedOut:
            if start_ms is not None:
                closed.append((user_id, start_ms, last_ms, n, sv))
            state.remove()
        elif len(rows) > 0:
            rows = rows.sort_values("ts_ms")
            for ts_ms, value in zip(rows["ts_ms"], rows["value"]):
                ts_ms = int(ts_ms)
                if start_ms is None:
                    start_ms, last_ms, n, sv = ts_ms, ts_ms, 1, float(value)
                elif ts_ms - last_ms > gap_ms:
                    closed.append((user_id, start_ms, last_ms, n, sv))
                    start_ms, last_ms, n, sv = ts_ms, ts_ms, 1, float(value)
                else:
                    last_ms = max(last_ms, ts_ms)
                    n += 1
                    sv += float(value)
            state.update((start_ms, last_ms, n, sv))
            state.setTimeoutDuration(gap_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start_ms",
                    "session_end_ms",
                    "n_events",
                    "sum_value",
                ],
            )

    return fn


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 300, ts_ms_col: str = "ts_ms"
) -> DataFrame:
    """Streaming sessionization: events(user_id, ts_ms, value) -> one row per
    CLOSED session.  Requires update output mode."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds * 1000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def _sessionize_event_time_fn(gap_ms: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed = []
        if state.hasTimedOut:
            # the WATERMARK passed last_ms + gap: the session is provably
            # closed no matter how slowly (or fast) wall-clock batches run
            if state.exists:
                start_ms, last_ms, n, sv = state.get
                closed.append((user_id, start_ms, last_ms, n, sv))
            state.remove()
        else:
            start_ms = None
            if state.exists:
                start_ms, last_ms, n, sv = state.get
            rows = pd.concat(list(pdfs))
            rows = rows.sort_values("ts_ms")
            for ts_ms, value in zip(rows["ts_ms"], rows["value"]):
                ts_ms = int(ts_ms)
                if start_ms is None:
                    start_ms, last_ms, n, sv = ts_ms, ts_ms, 1, float(value)
                elif ts_ms - last_ms > gap_ms:
                    closed.append((user_id, start_ms, last_ms, n, sv))
                    start_ms, last_ms, n, sv = ts_ms, ts_ms, 1, float(value)
                else:
                    last_ms = max(last_ms, ts_ms)
                    n += 1
                    sv += float(value)
            state.update((start_ms, last_ms, n, sv))
            # close when the watermark proves no on-time event can extend the
            # session.  Spark requires a timeout strictly beyond the current
            # watermark; a session already older than the watermark (late
            # burst) is clamped to wm+1 so it fires in the very next batch.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(last_ms + gap_ms, wm + 1))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start_ms",
                    "session_end_ms",
                    "n_events",
                    "sum_value",
                ],
            )

    return fn


def sessionize_stream_event_time(
    events: DataFrame,
    gap_seconds: int = 300,
    ts_ms_col: str = "ts_ms",
    late_seconds: int = 0,
) -> DataFrame:
    """Streaming sessionization closed by EVENT-TIME watermark, not wall
    clock: a session emits when the watermark (max event time seen minus
    ``late_seconds``) passes session_end + gap — the correct late-data
    semantics for replayed/bursty/backfilled streams, where processing-time
    timeouts close sessions that are still live in event time (or hold open
    ones hostage to trigger cadence).  Late events beyond ``late_seconds``
    are dropped by the watermark before reaching the state function.

    Same output contract as ``sessionize_stream``; cross-checked against
    ``sessionize_batch`` in tests/test_sessionize.py."""
    ev = events.withColumn("_ts", F.timestamp_millis(F.col(ts_ms_col))).withWatermark(
        "_ts", f"{late_seconds} seconds"
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _sessionize_event_time_fn(gap_seconds * 1000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_native(
    events: DataFrame, gap_seconds: int = 300, ts_ms_col: str = "ts_ms"
) -> DataFrame:
    """Catalyst-native sessionization via ``F.session_window`` — the built-in
    gap-session operator (works on batch AND streaming DataFrames; streams
    add ``withWatermark`` upstream and Spark manages session state/merging
    natively, no Python state function).

    Output schema matches ``sessionize_batch`` exactly (epoch-ms bounds, not
    timestamps, so results hash identically under any session timezone);
    tests pin equivalence between the two implementations row-for-row.
    """
    ev = events.withColumn("_ts", F.timestamp_millis(F.col(ts_ms_col)))
    # boundary parity verified empirically: session_window merges when
    # diff <= gap (inclusive window-adjacency), identical to the batch twin's
    # "diff > gap splits" — no off-by-one adjustment needed
    return (
        ev.groupBy(
            F.session_window("_ts", f"{gap_seconds} seconds").alias("w"),
            "user_id",
        )
        .agg(
            F.min(ts_ms_col).alias("session_start_ms"),
            F.max(ts_ms_col).alias("session_end_ms"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id", "session_start_ms", "session_end_ms", "n_events", "sum_value"
        )
    )


def sessionize_batch(
    events: DataFrame, gap_seconds: int = 300, ts_ms_col: str = "ts_ms"
) -> DataFrame:
    """Batch twin with identical semantics (ALL sessions, including the last
    open one — a completed batch has no 'still open' notion): classic
    gap-and-island via window functions, fully shuffle-scalable."""
    gap_ms = gap_seconds * 1000
    w = Window.partitionBy("user_id").orderBy(ts_ms_col)
    with_flag = events.withColumn(
        "_new_session",
        F.when(
            F.col(ts_ms_col) - F.lag(ts_ms_col).over(w) > gap_ms, 1
        ).otherwise(0),
    ).withColumn("_session_id", F.sum("_new_session").over(w))
    return (
        with_flag.groupBy("user_id", "_session_id")
        .agg(
            F.min(ts_ms_col).alias("session_start_ms"),
            F.max(ts_ms_col).alias("session_end_ms"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id", "session_start_ms", "session_end_ms", "n_events", "sum_value"
        )
    )
