"""Streaming event-time analytics (SURVEY.md §2.8 ST6 north star).

The reference has no event-time windows (WAL order is total, no late
data); these are the beyond-reference streaming surface: watermarked
tumbling/sliding windows and session windows over the `events` table,
with batch twins in ozone_spark.operators.events (the invariant tests
assert stream(AvailableNow drain) == batch on the same input).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_events_stream(spark: SparkSession, events_dir_or_file: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of the events table (ns timestamps handled the
    same way as the batch loader).  The streaming file source requires a
    directory; a bare parquet file is staged via symlink."""
    path = events_dir_or_file
    if os.path.isfile(path):
        staged = tempfile.mkdtemp(prefix="ozs_events_src_")
        os.symlink(os.path.abspath(path),
                   os.path.join(staged, os.path.basename(path)))
        path = staged
    schema = spark.read.parquet(path).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # withWatermark requires TIMESTAMP (with local tz); the NTZ→TZ cast
        # keeps the wall-clock instant in the session tz, so window starts
        # and date_format day strings match the batch twin reading NTZ.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def streaming_tumbling_daily(events_stream: DataFrame,
                             watermark: str = "1 day") -> DataFrame:
    """Watermarked tumbling-window twin of operators.events.tumbling_daily:
    late rows beyond the watermark are dropped; in append mode a window
    only emits once it is sealed."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
                "event_type", "n_events", "total_value")
    )


def streaming_sessionize(events_stream: DataFrame, gap_minutes: int = 30,
                         watermark: str = "1 hour") -> DataFrame:
    """Session windows per user via session_window() — the stateful
    streaming twin of the batch lag/cumsum sessionization."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
                 "user_id")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select("user_id",
                F.unix_millis(F.col("w.start")).alias("session_start_ms"),
                F.unix_millis(F.col("w.end")).alias("session_end_ms"),
                "n_events", "total_value")
    )


def drain_to_memory(stream_df: DataFrame, spark: SparkSession,
                    name: str, checkpoint_dir: str,
                    output_mode: str = "complete") -> DataFrame:
    """Run an AvailableNow drain of a streaming aggregation into an
    in-memory sink and return the result table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
