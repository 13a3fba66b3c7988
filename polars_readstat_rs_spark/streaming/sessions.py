"""Custom stateful streaming operator: per-user session aggregation via
applyInPandasWithState (the Spark-native equivalent of a hand-written
stateful operator — reference has none; SURVEY §2.6 extension).

Sessions close after `gap` of event-time inactivity; each emitted row is
one closed (or final) session: (user_id, session_start_ms,
session_end_ms, n_events, total_value).

Termination contract: timers are EVENT-time (setTimeoutTimestamp =
session_end + gap), so the operator is deterministic — a session flushes
exactly when the watermark passes its gap, never on wall clock. A
bounded stream therefore terminates under plain processAllAvailable()
once something advances the watermark past the last trailing timer;
windows.events_stream(sentinel=True) provides that final watermark push.
(The previous design used ProcessingTimeTimeout + sink polling, which
both never terminated under processAllAvailable and raced q.stop()
against in-flight state-store commits — round-2's s02 failure mode.)
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
        # exact integer cents: float accumulation order would make
        # total_value depend on arrival batching; integer sums are
        # associative, so the emitted double equals the batch engine's
        # exact DECIMAL sum bit-for-bit (values are 2-decimal by contract)
        T.StructField("total_cents", T.LongType()),
    ]
)

GAP_MS = 30 * 60 * 1000


def _make_update(gap_ms: int):
    """Build the stateful update fn with the gap baked into the closure
    (applyInPandasWithState has no side-channel for params)."""

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        chunks = [c for c in pdfs if len(c)]  # empty when a timeout fires
        if chunks:
            rows = pd.concat(chunks).sort_values("ts_ms")
        else:
            rows = pd.DataFrame({"ts_ms": [], "value": []})
        if state.exists:
            start, end, n, cents = state.get
        else:
            start = end = None
            n, cents = 0, 0
        out = []
        for ts, val in zip(rows["ts_ms"], rows["value"]):
            ts = int(ts)
            fv = float(val)
            # NULL value (e.g. the termination sentinel row) -> 0, matching
            # SQL SUM's null-skipping; real events carry non-null values
            c = int(round(fv * 100)) if fv == fv else 0
            if start is None:
                start, end, n, cents = ts, ts, 1, c
            elif ts - end > gap_ms:
                out.append((user_id, start, end, n, cents / 100.0))
                start, end, n, cents = ts, ts, 1, c
            else:
                end, n, cents = ts, n + 1, cents + c
        if state.hasTimedOut:
            # watermark passed end+gap: the trailing session is final by
            # event time — flush it and drop the state (bounded state on
            # long-running streams)
            if start is not None:
                out.append((user_id, start, end, n, cents / 100.0))
            state.remove()
        elif start is not None:
            state.update((start, end, n, cents))
            # event-time timer: fire when the watermark passes the gap.
            # Spark requires the timestamp to sit above the current
            # watermark; a key whose gap already elapsed (late-ish data)
            # flushes at the next watermark tick instead.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(end + gap_ms, wm + 1))
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return _update


def sessionize_stream(
    events: DataFrame,
    gap_ms: int = GAP_MS,
    watermark: str = "0 seconds",
) -> DataFrame:
    """events (with ts timestamp, user_id, value) -> closed sessions.

    Event-time gaps within arriving data close sessions immediately;
    each key's trailing session flushes via an EventTimeTimeout once the
    watermark (``ts`` minus ``watermark`` delay) passes its gap. Pair
    with events_stream(sentinel=True) on bounded streams so the final
    watermark advance (and with it the last flush batch) always happens;
    drop windows.SENTINEL_USER rows from the result.
    """
    from pyspark.sql import functions as F

    prepped = events.withWatermark("ts", watermark).select(
        "user_id", "ts", F.unix_millis("ts").alias("ts_ms"), "value"
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _make_update(gap_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
