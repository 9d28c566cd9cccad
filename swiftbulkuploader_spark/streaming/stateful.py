"""Custom stateful streaming operator: gap-based sessionization with
`applyInPandasWithState` (SURVEY.md §2.7 — the reference has no stateful
operators; this is the north-star custom-operator shape).

Semantics match operators/sessions.py::sessionize exactly (same gap rule),
so the batch query's DuckDB oracle doubles as the spec for this stream.

State per user_id: (session_no, last_ts_us, session_start_us, n_events,
total_value). Event-time timeout closes idle sessions: when the watermark
passes last_ts + gap, the session is emitted and state cleared — bounded
state no matter how many users, the thing the reference's grow-forever
Manager list could never do.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MINUTES = 30

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_no", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("closed_by", T.StringType()),  # gap | timeout
])

STATE_SCHEMA = T.StructType([
    T.StructField("session_no", T.LongType()),
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

_GAP_US = GAP_MINUTES * 60 * 1_000_000


def _sessionize_group(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    out_rows: list[tuple] = []

    if state.hasTimedOut:
        sess_no, start_us, last_us, n, total = state.get
        out_rows.append((user_id, sess_no, start_us, last_us, n, total, "timeout"))
        state.remove()
    else:
        if state.exists:
            sess_no, start_us, last_us, n, total = state.get
        else:
            sess_no, start_us, last_us, n, total = 0, None, None, 0, 0.0
        events = pd.concat(list(pdfs))
        events = events.sort_values(["ts", "event_id"])
        for row in events.itertuples(index=False):
            ts_us = int(row.ts.value // 1000)  # pandas ns -> us
            if last_us is not None and ts_us - last_us > _GAP_US:
                out_rows.append((user_id, sess_no, start_us, last_us, n, total, "gap"))
                sess_no, start_us, n, total = sess_no + 1, ts_us, 0, 0.0
            if start_us is None:
                sess_no, start_us = sess_no + 1, ts_us
            last_us = ts_us
            n += 1
            total += float(row.value)
        state.update((sess_no, start_us, last_us, n, total))
        # close the session once event time passes last_ts + gap
        state.setTimeoutTimestamp(last_us // 1000 + _GAP_US // 1000)

    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=["user_id", "session_no", "start_us", "last_us", "n_events",
                     "total_value", "closed_by"],
        ).assign(
            session_start=lambda d: pd.to_datetime(d.pop("start_us"), unit="us"),
            session_end=lambda d: pd.to_datetime(d.pop("last_us"), unit="us"),
        )[["user_id", "session_no", "session_start", "session_end", "n_events",
           "total_value", "closed_by"]]


def stream_sessions(events_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """events stream (event_id, ts, user_id, value, ...) -> closed sessions.

    Requires `ts` watermarked; sessions emit when a gap-break is observed or
    when event time moves past last_ts + gap (timeout)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
