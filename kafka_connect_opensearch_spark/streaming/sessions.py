"""Sessionization: gap-timeout session windows over an event stream.

The custom-stateful-operator slot (SURVEY.md §2.8 notes the reference has
no event-time processing; a streaming ingest pipeline needs it):

- ``sessionize_batch`` — the declarative batch twin: session id = running
  count of gap breaks per key (lag + cumulative sum window functions, all
  codegen). Used for oracle comparison and backfills.
- ``sessionize_stream`` — the same semantics as a custom stateful operator
  via ``applyInPandasWithState``: per-key open-session state, sessions
  emitted when a gap closes them (new event past the gap) or when the
  state times out past the watermark.

State at scale: one open session per key (a few scalars), bounded by key
cardinality — the watermark timeout reaps idle keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "session_start timestamp, session_end timestamp"
)


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions per key: a new session starts when the time since
    the previous event exceeds the gap. Two window passes (lag, running
    sum) — one shuffle on the key."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    epoch = F.unix_timestamp(F.col(ts_col))  # TIMESTAMP_NTZ-safe seconds
    breaks = events.withColumn(
        "_new_session",
        F.when(epoch - F.lag(epoch).over(w) > gap_s, F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    with_sid = breaks.withColumn(
        "session_id", F.sum("_new_session").over(w).cast("long")
    )
    return (
        with_sid.groupBy(key_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            F.col(key_col).alias("user_id"),
            "session_id",
            "n_events",
            "session_start",
            "session_end",
        )
    )


def closed_sessions_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Sessions that are provably closed within the data: every session of
    a key except its last (the stream's open state). This is what the
    stateful operator has emitted once it has seen the same events."""
    s = sessionize_batch(events, gap_minutes, key_col, ts_col)
    w = Window.partitionBy("user_id")
    return (
        s.withColumn("_max_sid", F.max("session_id").over(w))
        .filter(F.col("session_id") < F.col("_max_sid"))
        .drop("_max_sid")
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Custom stateful operator: per-key open session in GroupState.

    Emits a session row when (a) an in-batch or cross-batch gap closes it,
    or (b) the state times out past the watermark (idle key). Session ids
    are per-key counters, matching the batch twin's running-sum ids."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    gap_s = gap_minutes * 60

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        out = []
        if state.hasTimedOut:
            if state.exists:
                sid, n, start_us, end_us = state.get
                out.append((user_id, sid, n, start_us, end_us))
                state.remove()
        else:
            rows = pd.concat(list(pdfs))
            ts = rows[ts_col].sort_values()
            ts_us = (ts.astype("int64") // 1000).to_numpy()  # microseconds
            if state.exists:
                sid, n, start_us, end_us = state.get
            else:
                sid, n, start_us, end_us = 0, 0, None, None
            for t_np in ts_us:
                t = int(t_np)  # state serializes as JSON — no numpy scalars
                if n and t - end_us > gap_s * 1_000_000:
                    out.append((user_id, sid, n, start_us, end_us))
                    sid, n, start_us = sid + 1, 0, None
                if n == 0:
                    start_us, end_us = t, t
                else:
                    # late-but-within-watermark events from a later
                    # micro-batch may carry t < end_us: session bounds only
                    # widen (the gap check above uses the true max end)
                    start_us = min(start_us, t)
                    end_us = max(end_us, t)
                n += 1
            state.update((int(sid), int(n), int(start_us), int(end_us)))
            state.setTimeoutTimestamp(
                int(end_us) // 1000 + gap_s * 1000
            )  # epoch ms
        if not out:
            yield pd.DataFrame(
                columns=[
                    "user_id", "session_id", "n_events",
                    "session_start", "session_end",
                ]
            )
            return
        pdf = pd.DataFrame(
            out,
            columns=[
                "user_id", "session_id", "n_events",
                "session_start", "session_end",
            ],
        )
        pdf["session_start"] = pd.to_datetime(pdf["session_start"], unit="us")
        pdf["session_end"] = pd.to_datetime(pdf["session_end"], unit="us")
        yield pdf

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType="sid long, n long, start_us long, end_us long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
