import os
import time

import pytest

from duckdb_faiss_ext_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)


@pytest.fixture()
def events_rows():
    # user 1: two sessions (gap 10s, events 2s apart); user 2: one session
    return [
        (1, 0, 1.0),
        (1, 2_000, 2.0),
        (1, 4_000, 3.0),
        (1, 60_000, 4.0),  # > 10s gap -> new session
        (1, 61_000, 5.0),
        (2, 0, 10.0),
        (2, 1_000, 10.0),
    ]


def test_sessionize_batch_semantics(spark, events_rows):
    df = spark.createDataFrame(events_rows, "user_id bigint, ts_ms bigint, value double")
    out = {(r["user_id"], r["session_start_ms"]): r
           for r in sessionize_batch(df, gap_seconds=10).collect()}
    assert len(out) == 3
    s1 = out[(1, 0)]
    assert s1["session_end_ms"] == 4_000 and s1["n_events"] == 3 and s1["sum_value"] == 6.0
    s2 = out[(1, 60_000)]
    assert s2["session_end_ms"] == 61_000 and s2["n_events"] == 2 and s2["sum_value"] == 9.0
    s3 = out[(2, 0)]
    assert s3["n_events"] == 2 and s3["sum_value"] == 20.0


def test_sessionize_stream_matches_batch(spark, events_rows, tmp_path):
    """Feed the same events through the stateful streaming operator.  Sessions
    close two ways: a later event proves the gap passed (in-batch), or the
    processing-time timeout fires (open tail).  Poll the sink with a deadline —
    `processAllAvailable()` never settles because state-cleanup batches keep
    the trigger active indefinitely under ProcessingTimeTimeout."""
    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    df = spark.createDataFrame(events_rows, "user_id bigint, ts_ms bigint, value double")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("user_id bigint, ts_ms bigint, value double").parquet(src)
    out = sessionize_stream(stream, gap_seconds=10)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        expected = {
            (r["user_id"], r["session_start_ms"]): r
            for r in sessionize_batch(df, gap_seconds=10).collect()
        }
        deadline = time.time() + 120
        got = {}
        while time.time() < deadline and len(got) < len(expected):
            if not q.isActive:  # surfaces the stream's exception, if any
                raise AssertionError(f"stream died: {q.exception()}")
            time.sleep(2)
            got = {
                (r["user_id"], r["session_start_ms"]): r
                for r in spark.sql("SELECT * FROM sessions_out").collect()
            }
    finally:
        q.stop()
    assert set(got) == set(expected)
    for key, exp in expected.items():
        g = got[key]
        assert g["session_end_ms"] == exp["session_end_ms"]
        assert g["n_events"] == exp["n_events"]
        assert g["sum_value"] == exp["sum_value"]


def test_sessionize_batch_on_real_events(spark, sf_dir):
    """Real events table: sessions partition the event stream exactly."""
    from duckdb_faiss_ext_spark.streaming.ingest import events_ts_ms
    import pyspark.sql.functions as F

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = raw.select("user_id", events_ts_ms(raw).alias("ts_ms"), "value")
    sessions = sessionize_batch(ev, gap_seconds=3600)
    n_events = ev.count()
    assert sessions.agg(F.sum("n_events")).first()[0] == n_events
    bad = sessions.filter(F.col("session_end_ms") < F.col("session_start_ms")).count()
    assert bad == 0


def test_sessionize_native_equals_batch(spark, sf_dir):
    """F.session_window (Catalyst-native) must agree row-for-row with the
    gap-and-islands batch twin on real events, including the diff == gap
    boundary (session_window adjacency is inclusive, matching `> gap` splits)."""
    from duckdb_faiss_ext_spark.streaming.ingest import events_ts_ms
    from duckdb_faiss_ext_spark.streaming.sessionize import sessionize_native

    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = raw.select("user_id", events_ts_ms(raw).alias("ts_ms"), "value")
    a = sessionize_batch(ev, gap_seconds=1800)
    b = sessionize_native(ev, gap_seconds=1800)
    cols = ["user_id", "session_start_ms", "session_end_ms", "n_events"]
    assert a.select(cols).subtract(b.select(cols)).count() == 0
    assert b.select(cols).subtract(a.select(cols)).count() == 0
    assert a.count() == b.count()


def test_sessionize_native_boundary_exact_gap(spark):
    """diff == gap stays one session in both implementations."""
    import pyspark.sql.functions as F

    from duckdb_faiss_ext_spark.streaming.sessionize import sessionize_native

    # diffs: 10_000 (== gap, same session) then 10_001 (> gap, splits)
    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 10_000, 1.0), (1, 20_001, 1.0)],
        "user_id bigint, ts_ms bigint, value double",
    )
    a = {(r["session_start_ms"], r["n_events"])
         for r in sessionize_batch(df, gap_seconds=10).collect()}
    b = {(r["session_start_ms"], r["n_events"])
         for r in sessionize_native(df, gap_seconds=10).collect()}
    assert a == b == {(0, 2), (20_001, 1)}


def test_sessionize_event_time_closes_by_watermark(spark, tmp_path):
    """EventTimeTimeout variant: sessions close when the WATERMARK passes
    session_end + gap — driven here by a later file whose high event time
    advances the watermark, not by wall-clock waiting.  Covers both closure
    modes: in-batch (a later event proves the gap) and watermark timeout
    (the open tail of user 1)."""
    from duckdb_faiss_ext_spark.streaming.sessionize import (
        sessionize_stream_event_time,
    )

    src = str(tmp_path / "et_src")
    os.makedirs(src)
    schema = "user_id bigint, ts_ms bigint, value double"
    # ts offsets start at 100s: a ts at epoch 0 equals the INITIAL watermark
    # and is discarded as late before reaching the state function
    phase1 = [
        (1, 100_000, 1.0),
        (1, 102_000, 2.0),
        (1, 104_000, 3.0),
        (2, 100_000, 10.0),
    ]
    spark.createDataFrame(phase1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stream_event_time(stream, gap_seconds=10)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_et")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "et_ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if not q.isActive:
                raise AssertionError(f"stream died: {q.exception()}")
            if spark.sql("SELECT * FROM sessions_et").count() == 0:
                time.sleep(1)
            else:  # nothing may close yet: watermark is only at 104s
                break
        # phase 2: a 220s event for user 2 pushes the watermark past
        # 104s + 10s, closing user 1's open session by EVENT time; it also
        # proves user 2's first session closed (in-batch gap detection)
        spark.createDataFrame([(2, 220_000, 5.0)], schema).coalesce(
            1
        ).write.mode("append").parquet(src)
        expected = {
            (1, 100_000): (104_000, 3, 6.0),
            (2, 100_000): (100_000, 1, 10.0),
        }
        got = {}
        deadline = time.time() + 120
        while time.time() < deadline and len(got) < len(expected):
            if not q.isActive:
                raise AssertionError(f"stream died: {q.exception()}")
            time.sleep(2)
            got = {
                (r["user_id"], r["session_start_ms"]): (
                    r["session_end_ms"],
                    r["n_events"],
                    r["sum_value"],
                )
                for r in spark.sql("SELECT * FROM sessions_et").collect()
            }
    finally:
        q.stop()
    assert got == expected  # user 2's 220s session stays OPEN (no watermark
    # beyond it) — event-time semantics, not trigger cadence
