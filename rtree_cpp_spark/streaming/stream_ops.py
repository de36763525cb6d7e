"""Structured Streaming twins of the batch operators.

The reference is batch-only (SURVEY.md section 2.10), so these extend it:
a continuously-arriving document stream gets tile assignments, and an
event stream gets watermarked windowed rollups — the shapes a 100 TB
ingest pipeline actually runs.  Tested with ``availableNow`` triggers
(bounded replay) against the batch operators' output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rtree_cpp_spark.functions.cells import Grid
from rtree_cpp_spark.operators.tiles import primary_tiles
from rtree_cpp_spark.sources.extract import rects_only
from rtree_cpp_spark.sources.synth import DOC_SCHEMA


def stream_docs(spark: SparkSession, docs_dir: str) -> DataFrame:
    """readStream over a parquet directory of interleaved docs."""
    return spark.readStream.schema(DOC_SCHEMA).parquet(docs_dir)


def stream_tiles(docs_stream: DataFrame, grid: Grid) -> DataFrame:
    """Streaming primary-tile assignment: stateless projection — runs
    per micro-batch with no state store."""
    return primary_tiles(rects_only(docs_stream), grid)


def run_stream_tiles_once(
    spark: SparkSession, docs_dir: str, out_dir: str, checkpoint_dir: str, grid: Grid
) -> None:
    """Drain everything currently in docs_dir into a parquet tile table
    (availableNow), exactly-once via the checkpoint."""
    q = (
        stream_tiles(stream_docs(spark, docs_dir), grid)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_events_hourly(events_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup: late events beyond the
    watermark are dropped; state is bounded by watermark horizon."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value")
    )


def run_stream_events_once(
    spark: SparkSession, events_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    events = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(events_dir)
    q = (
        stream_events_hourly(events)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
