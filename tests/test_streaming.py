"""Event-time windowing: batch semantics vs pure-Python oracle, and
batch/streaming parity (the same logical query over readStream with
availableNow must equal the batch result)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from peregrine_spark.streaming.windows import (
    run_stream_to_memory,
    session_agg_batch,
    sliding_agg,
    stream_from_parquet,
    tumbling_agg,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(i, minutes, user, etype, value):
    return (i, T0 + dt.timedelta(minutes=minutes), user, etype, value, "{}")

EVENTS = [
    _ev(0, 0, 1, "click", 1.0),
    _ev(1, 10, 1, "click", 2.0),
    _ev(2, 65, 1, "view", 3.0),   # new hour, and >30min gap -> new session
    _ev(3, 70, 2, "click", 4.0),
    _ev(4, 200, 2, "view", 5.0),  # new session for user 2
]

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(EVENTS, SCHEMA)


def test_tumbling_agg(events):
    rows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_agg(events, "1 hour").collect()
    }
    assert rows[(T0, "click")] == (2, 3.0)
    assert rows[(T0 + dt.timedelta(hours=1), "view")] == (1, 3.0)
    assert rows[(T0 + dt.timedelta(hours=1), "click")] == (1, 4.0)
    assert rows[(T0 + dt.timedelta(hours=3), "view")] == (1, 5.0)


def test_sliding_agg_covers_each_event_twice(events):
    rows = sliding_agg(events, "1 hour", "30 minutes").collect()
    assert sum(r["n_events"] for r in rows) == 2 * len(EVENTS)


def test_session_agg_batch(events):
    rows = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in session_agg_batch(events, "30 minutes").collect()
    }
    # user 1: [0,10] then [65]; user 2: [70] then [200]
    assert rows[(1, T0)] == (T0 + dt.timedelta(minutes=10), 2)
    assert rows[(1, T0 + dt.timedelta(minutes=65))][1] == 1
    assert rows[(2, T0 + dt.timedelta(minutes=70))][1] == 1
    assert rows[(2, T0 + dt.timedelta(minutes=200))][1] == 1
    assert len(rows) == 4


def test_stream_batch_parity(spark, events, tmp_path):
    src = str(tmp_path / "events_parquet")
    events.write.parquet(src)

    stream = stream_from_parquet(spark, src, watermark="1 day")
    agg = tumbling_agg(stream, "1 hour")
    q = run_stream_to_memory(agg, "tumbling_test")
    try:
        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM tumbling_test").collect()
        }
    finally:
        q.stop()
    expect = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_agg(spark.read.parquet(src), "1 hour").collect()
    }
    assert got == expect


def test_streaming_exact_dedup_stateful(spark, tmp_path):
    """applyInPandasWithState custom operator: first-seen dedup across
    micro-batches (state survives batch boundaries)."""
    from peregrine_spark.streaming.stateful import streaming_exact_dedup

    d = tmp_path / "docs"
    d.mkdir()
    schema = "doc_id long, content_hash string"
    # batch 1: keys a (ids 1,2) and b (id 3); batch 2: a again (id 0 --
    # smaller, must NOT win: first-seen), plus new key c
    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], schema
    ).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(
        [(0, "a"), (4, "c")], schema
    ).coalesce(1).write.parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["key"]: r["keep_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()
    }
    # one row per distinct key; 'a' keeps an id from its FIRST batch (1),
    # not the later smaller id 0
    assert set(got) == {"a", "b", "c"}
    assert got["b"] == 3 and got["c"] == 4
    assert got["a"] == 1


def test_first_seen_stream_batch_parity(spark, tmp_path):
    """The streaming stateful first-seen operator equals its batch form
    (the oracled entry `events_first_seen`) when micro-batches arrive in
    event-time order — the production log-ingest shape. Three files split
    by ts bucket, one per micro-batch."""
    from peregrine_spark.streaming.stateful import (
        first_seen_events,
        streaming_first_seen_events,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = tmp_path / "ev"
    d.mkdir()
    bounds = [r[0] for r in events.selectExpr(
        "percentile_approx(ts, array(0.33, 0.66))"
    ).collect()][0]
    parts = [
        events.where(F.col("ts") <= bounds[0]),
        events.where((F.col("ts") > bounds[0]) & (F.col("ts") <= bounds[1])),
        events.where(F.col("ts") > bounds[1]),
    ]
    # file order == event-time order (maxFilesPerTrigger consumes files in
    # path order, so name them 0,1,2)
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(d / f"{i}"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    q = (
        streaming_first_seen_events(stream)
        .writeStream.format("memory")
        .queryName("first_seen_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["event_type"]): (r["first_event_id"], r["first_ts_us"])
        for r in spark.sql("SELECT * FROM first_seen_stream").collect()
    }
    want = {
        (r["user_id"], r["event_type"]): (r["first_event_id"], r["first_ts_us"])
        for r in first_seen_events(events).collect()
    }
    assert got == want and len(want) > 0
