"""Custom stateful streaming operator: per-user session aggregation via
applyInPandasWithState (the Spark-native equivalent of a hand-written
stateful operator — reference has none; SURVEY §2.6 extension).

Sessions close after `gap` of event-time inactivity; each emitted row is
one closed (or final) session: (user_id, session_start_ms,
session_end_ms, n_events, total_value).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

GAP_MS = 30 * 60 * 1000


def _make_update(gap_ms: int, idle_timeout_ms: int):
    """Build the stateful update fn with the gap/timeout baked into the
    closure (applyInPandasWithState has no side-channel for params)."""

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        chunks = [c for c in pdfs if len(c)]  # empty when a timeout fires
        if chunks:
            rows = pd.concat(chunks).sort_values("ts_ms")
        else:
            rows = pd.DataFrame({"ts_ms": [], "value": []})
        if state.exists:
            start, end, n, total = state.get
        else:
            start = end = None
            n, total = 0, 0.0
        out = []
        for ts, val in zip(rows["ts_ms"], rows["value"]):
            ts = int(ts)
            if start is None:
                start, end, n, total = ts, ts, 1, float(val)
            elif ts - end > gap_ms:
                out.append((user_id, start, end, n, total))
                start, end, n, total = ts, ts, 1, float(val)
            else:
                end, n, total = ts, n + 1, total + float(val)
        if state.hasTimedOut:
            # idle key: flush the trailing session and drop the state —
            # this completes the "closed (or final) session" contract and
            # keeps state size bounded on long-running streams
            if start is not None:
                out.append((user_id, start, end, n, total))
            state.remove()
        elif start is not None:
            state.update((start, end, n, total))
            state.setTimeoutDuration(idle_timeout_ms)  # re-arm the idle timer
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return _update


def sessionize_stream(
    events: DataFrame,
    gap_ms: int = GAP_MS,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """events (with ts timestamp, user_id, value) -> closed sessions.

    ProcessingTimeTimeout fires after ``idle_timeout_ms`` (default: the
    session gap) of wall-clock inactivity on a key, emitting the final
    session and clearing its state — idle users no longer pin state
    forever. Event-time gaps within arriving data still close sessions
    immediately.

    Note: processing-time timeouts make the engine run empty micro-batches
    to give timers a chance to fire, so `shouldRunAnotherBatch` is always
    true — run this query with a processing-time trigger interval in
    production, and poll the sink rather than `processAllAvailable()` in
    tests (which would block forever).
    """
    from pyspark.sql import functions as F

    prepped = events.select(
        "user_id", F.unix_millis("ts").alias("ts_ms"), "value"
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _make_update(gap_ms, idle_timeout_ms if idle_timeout_ms is not None else gap_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
