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


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = pd.concat(list(pdfs)).sort_values("ts_ms")
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
        elif ts - end > GAP_MS:
            out.append((user_id, start, end, n, total))
            start, end, n, total = ts, ts, 1, float(val)
        else:
            end, n, total = ts, n + 1, total + float(val)
    if state.hasTimedOut:
        if start is not None:
            out.append((user_id, start, end, n, total))
        state.remove()
    else:
        state.update((start, end, n, total))
    yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events (with ts timestamp, user_id, value) -> closed sessions."""
    from pyspark.sql import functions as F

    prepped = events.select(
        "user_id", F.unix_millis("ts").alias("ts_ms"), "value"
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
