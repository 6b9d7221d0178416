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
