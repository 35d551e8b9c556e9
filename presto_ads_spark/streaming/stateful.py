"""Custom stateful streaming operator: per-user session aggregation via
``applyInPandasWithState`` (Arrow-batched, schema-declared state).

This is the pattern for operators Structured Streaming doesn't ship: keep
typed state per key, advance it batch-by-batch, emit on watermark-driven
timeout. Batch twin: streaming.sessionize (window functions) — the two are
compared in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("total_value", DoubleType()),
    ]
)

# state: (session_start_us, session_end_us, n_events, total_value) —
# microseconds, matching the event-time precision exactly.
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", IntegerType()),
        StructField("total", DoubleType()),
    ]
)

GAP_US = 30 * 60 * 1000 * 1000


def _sessionize_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_us, end_us, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
                "total_value": [total],
            }
        )
        return

    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    ts_us = (rows["ts"].astype("int64") // 1_000).to_numpy()
    vals = rows["value"].to_numpy()

    out = []
    if state.exists:
        start_us, end_us, n, total = state.get
        fresh = False
    else:
        start_us, end_us, n, total = ts_us[0], ts_us[0], 0, 0.0
        fresh = True

    for t, v in zip(ts_us, vals):
        if not fresh and t - end_us > GAP_US:
            out.append((start_us, end_us, n, total))
            start_us, end_us, n, total = t, t, 1, float(v)
        else:
            fresh = False
            end_us = max(end_us, t)
            n += 1
            total += float(v)
    state.update((int(start_us), int(end_us), int(n), float(total)))
    # GroupState timeouts are in event-time *milliseconds*.
    state.setTimeoutTimestamp(int(end_us) // 1000 + GAP_US // 1000)

    if out:
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "session_start": [pd.Timestamp(s, unit="us") for s, *_ in out],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in out],
                "n_events": [n_ for *_, n_, _t in out],
                "total_value": [t_ for *_, t_ in out],
            }
        )


def streaming_sessionize(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Session aggregates over a stream: one output row per closed session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUTPUT,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
