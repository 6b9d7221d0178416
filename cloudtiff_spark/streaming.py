"""Structured Streaming extension (SURVEY.md §2.9).

The reference is strictly batch (no streaming operators exist in cloudtiff;
examples/poll.rs is an IO latency probe). But the engine's analyze + tile
assignment + cell keying stages are STATELESS per-row maps, so they stream
for free: this module runs the exact same column expressions from
operators/meta.py over a streaming source — the shape a production
ingest-time tiler would use (new images land in the Iceberg table; each
micro-batch is assigned tiles + cells incrementally).

Also: a watermarked sliding-window arrival counter as the canonical
stateful-op example over the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.meta import tile_assignments


def stream_tile_assignments(
    spark: SparkSession, meta_dir: str, schema: str | None = None
) -> DataFrame:
    """readStream over a directory of images_meta parquet -> the SAME
    tile-assignment plan as the batch path (operators/meta.py). Returns the
    streaming DataFrame; callers attach a sink (tests use a memory sink with
    trigger(availableNow=True))."""
    if schema is None:
        schema = spark.read.parquet(meta_dir).schema
    stream = spark.readStream.schema(schema).parquet(meta_dir)
    return tile_assignments(stream)


def stream_sessionize(
    spark: SparkSession, events_dir: str, gap_s: int = 1800, max_files: int | None = None
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: incremental
    per-user sessionization with a `gap_s` inactivity rule — the streaming
    twin of the batch sessionize query (__spark_entry__.q_sessionize).

    State per user: (last_ts_us, n_sessions, n_events, n_late), carried
    across micro-batches; each batch emits the user's updated totals
    (update output mode).

    CONTRACT — in-order ingestion across micro-batches: state keeps only
    the per-user last_ts, so an event arriving in a LATER micro-batch with
    ts <= last_ts cannot be merged into the already-counted session
    history (it might split or merge sessions relative to the batch
    query). Such cross-batch late events are DETECTED (ts < last_ts at the
    head of a batch), counted in ``n_late``, and still folded into the
    totals best-effort; equality with the batch query is guaranteed only
    when n_late == 0. The pytest replays time-ordered splits (n_late == 0
    path) through >=2 micro-batches and asserts exact equality; a second
    test feeds an out-of-order split and asserts the late counter fires.
    """
    import pandas as pd

    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    ev = reader.parquet(events_dir)
    ev = ev.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp_ltz")))

    gap_us = gap_s * 1_000_000

    def update(key, pdfs, state) -> "pd.DataFrame":
        (user_id,) = key
        last_ts, n_sessions, n_events, n_late = (
            state.get if state.exists else (None, 0, 0, 0)
        )
        rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        if last_ts is not None:
            # cross-micro-batch late arrivals: the in-order assumption is
            # violated for these rows — count them (totals stay
            # best-effort; only in-batch order is reconstructible)
            n_late += int((rows["ts_us"] < last_ts).sum())
        for ts in rows["ts_us"]:
            ts = int(ts)
            if last_ts is None or ts - last_ts > gap_us:
                n_sessions += 1
            last_ts = max(ts, last_ts) if last_ts is not None else ts
            n_events += 1
        state.update((last_ts, n_sessions, n_events, n_late))
        # contract: the function YIELDS pandas DataFrames (iterator shape)
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_sessions": n_sessions,
                    "n_events": n_events,
                    "n_late": n_late,
                }
            ]
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_sessions long, n_events long, n_late long",
        stateStructType="last_ts long, n_sessions long, n_events long, n_late long",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def stream_event_counts(
    spark: SparkSession, events_dir: str, window: str = "10 minutes", late: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window event counts per type (late data beyond
    the watermark is dropped — the standard Structured Streaming contract).
    """
    schema = spark.read.parquet(events_dir).schema
    ev = spark.readStream.schema(schema).parquet(events_dir)
    return (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", late)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )
