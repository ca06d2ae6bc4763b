"""Event-time windows + watermark: streaming result equals batch oracle."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_connect_opensearch_spark.streaming.windows import (
    run_windowed_stream,
    windowed_counts,
)

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _events(spark, n=300):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(seconds=17 * i),
            ["click", "view", "error"][i % 3],
            float(i % 7),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_windowed_counts_batch(spark):
    ev = _events(spark)
    out = windowed_counts(ev, window_duration="5 minutes").collect()
    # manual oracle for one window/key
    want = ev.filter(
        (F.col("ts") >= "2024-01-01 00:00:00")
        & (F.col("ts") < "2024-01-01 00:05:00")
        & (F.col("event_type") == "click")
    ).count()
    got = [
        r["n"]
        for r in out
        if str(r["window_start"]) == "2024-01-01 00:00:00"
        and r["event_type"] == "click"
    ]
    assert got == [want]
    # windows tile the time range: total n equals input count
    assert sum(r["n"] for r in out) == 300


def test_streaming_equals_batch(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)
    q = run_windowed_stream(
        spark, src, SCHEMA, str(tmp_path / "ckpt"), str(tmp_path / "out"),
        window_duration="5 minutes", watermark_delay="1 minute",
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    want = windowed_counts(ev, window_duration="5 minutes")
    # append mode emits only watermark-closed windows — the final (open)
    # window may be absent; everything emitted must match the batch oracle
    w = {(str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"])
         for r in want.collect()}
    emitted = got.collect()
    assert len(emitted) >= 0.8 * len(w)  # all but the tail window(s)
    for r in emitted:
        assert w[(str(r["window_start"]), r["event_type"])] == (
            r["n"], r["total_value"],
        )


@pytest.mark.parametrize("slide", ["2 minutes"])
def test_sliding_windows(spark, slide):
    ev = _events(spark, 100)
    out = windowed_counts(ev, window_duration="4 minutes", slide=slide)
    rows = out.collect()
    # each event lands in window_duration/slide = 2 windows
    assert sum(r["n"] for r in rows) == 200


def test_stateful_sessionization_stream_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: every emitted session row must
    be a session the batch twin computes, and every session provably
    closed within the data must have been emitted (cross-batch state +
    event-time timeout both exercised via two arriving files)."""
    import datetime as dt

    from kafka_connect_opensearch_spark.streaming.sessions import (
        closed_sessions_batch,
        sessionize_batch,
        sessionize_stream,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(4):
        # session 0: 3 events, 5 min apart; session 1 after a 2h gap
        for k in range(3):
            rows.append((eid, user, base + dt.timedelta(minutes=5 * k + user)))
            eid += 1
        for k in range(2):
            rows.append(
                (eid, user,
                 base + dt.timedelta(hours=2, minutes=5 * k + user))
            )
            eid += 1
    # sentinel far in the future pushes the watermark past all timeouts
    rows.append((eid, 99, base + dt.timedelta(days=2)))
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")

    src = str(tmp_path / "src")
    ev.filter(F.col("ts") < base + dt.timedelta(hours=1)).coalesce(1).write.parquet(
        src, mode="append"
    )
    ev.filter(F.col("ts") >= base + dt.timedelta(hours=1)).coalesce(1).write.parquet(
        src, mode="append"
    )

    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark_delay="1 minute")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r["user_id"], r["session_id"], r["n_events"],
         r["session_start"], r["session_end"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch_all = {
        (r["user_id"], r["session_id"], r["n_events"],
         r["session_start"], r["session_end"])
        for r in sessionize_batch(ev, gap_minutes=30).collect()
    }
    batch_closed = {
        (r["user_id"], r["session_id"], r["n_events"],
         r["session_start"], r["session_end"])
        for r in closed_sessions_batch(ev, gap_minutes=30).collect()
    }
    assert got <= batch_all          # nothing fabricated
    assert batch_closed <= got       # every provably-closed session emitted
    # the 4 users' first sessions are closed by the 2h gap: 3 events each
    assert sum(1 for g in got if g[2] == 3) >= 4
