"""foreachBatch incremental materialized-view maintenance.

The one streaming API surface the window/session/join/dedup operators
don't exercise: ``foreachBatch`` hands each micro-batch to arbitrary
batch code, which is how production pipelines maintain upsert state in
a table store. Here the state is an additive aggregate (per-key counts
and decimal-exact sums): each batch is pre-aggregated map-side, merged
into the accumulator with one union+groupBy, and the accumulator is
``localCheckpoint``-ed so the logical plan stays O(1) deep across
batches (the same flat-plan discipline as dedup.neardup_components —
without it, N batches nest N AQE subplans and the driver dies
re-rendering them).

Decimal sums make the merge order-independent, so the drained result is
bitwise equal to the one-shot batch aggregate regardless of micro-batch
boundaries. At scale the accumulator would live in a transactional
table (Delta/Iceberg MERGE) instead of an in-memory checkpoint; the
merge plan is identical.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stage_chunked_events(spark: SparkSession, sf_dir: str, n_chunks: int = 4) -> str:
    """Split the events table into ``n_chunks`` parquet files in a
    staging dir (row-range split via pyarrow, written once) so the file
    stream source delivers a genuine multi-batch stream."""
    import pyarrow.parquet as pq

    from .windows import _src_fingerprint

    src = f"{sf_dir}/events.parquet"
    tag = sf_dir.strip("/").replace("/", "_") + "_" + _src_fingerprint(src)
    stage = os.path.join(tempfile.gettempdir(), f"events_chunks_{tag}_{n_chunks}")
    done = os.path.join(stage, "_STAGED")
    if os.path.exists(done):
        return stage
    os.makedirs(stage, exist_ok=True)
    table = pq.read_table(src)
    n = table.num_rows
    step = max(1, (n + n_chunks - 1) // n_chunks)
    for i, lo in enumerate(range(0, n, step)):
        tmp = os.path.join(stage, f"chunk_{i:03d}.parquet.tmp")
        pq.write_table(table.slice(lo, step), tmp)
        os.replace(tmp, os.path.join(stage, f"chunk_{i:03d}.parquet"))
    with open(done, "w") as fh:
        fh.write(str(n))
    return stage


def incremental_event_totals(spark: SparkSession, sf_dir: str, n_chunks: int = 4) -> DataFrame:
    """Maintain per-(user_id, event_type) event counts and decimal-exact
    value totals across a micro-batched events stream via foreachBatch;
    returns the final accumulator state (== the one-shot batch
    aggregate)."""
    stage = stage_chunked_events(spark, sf_dir, n_chunks)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(stage)
    )
    state: dict[str, DataFrame] = {}

    def merge_batch(batch: DataFrame, _batch_id: int) -> None:
        part = batch.groupBy("user_id", "event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("_total_dec"),
        )
        acc = state.get("acc")
        merged = part if acc is None else acc.unionByName(part)
        merged = merged.groupBy("user_id", "event_type").agg(
            F.sum("n").alias("n"),
            F.sum("_total_dec").alias("_total_dec"),
        )
        # flat-plan discipline: state never nests more than one groupBy
        state["acc"] = merged.localCheckpoint()

    q = raw.writeStream.foreachBatch(merge_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    acc = state.get("acc")
    if acc is None:  # empty source
        return spark.createDataFrame(
            [], "user_id bigint, event_type string, n bigint, total_value double"
        )
    return acc.select(
        "user_id",
        "event_type",
        "n",
        F.col("_total_dec").cast("double").alias("total_value"),
    )
