"""Event-time analytics over the `events` stream table (SURVEY.md §2.8
ST6 north-star surface; the reference's one time-bucketed table is
CLUSTER_GROWTH_DAILY — UtilizationSchemaDefinition.java:75-83).

Batch equivalents of the streaming windows (streaming/windows.py runs
the same logic with readStream + watermark; the invariant tests assert
batch == streaming results on the same input).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def tumbling_daily(events: DataFrame) -> DataFrame:
    """Per-day per-type counts + value sum (CLUSTER_GROWTH_DAILY shape)."""
    return (
        events.groupBy(
            F.date_format(F.window("ts", "1 day").start, "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("day", "event_type")
    )


def sliding_hourly(events: DataFrame) -> DataFrame:
    """6h windows sliding every 3h: event counts (late-data-tolerant in
    the streaming variant via watermark)."""
    return (
        events.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.unix_millis(F.col("w.start")).alias("window_start_ms"),
                F.unix_millis(F.col("w.end")).alias("window_end_ms"), "n_events")
        .orderBy("window_start_ms")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows per user (gap-based): batch formulation via
    lag + cumulative session counter — the classic sessionization
    window-function program; streaming twin uses session_window()."""
    gap_s = gap_minutes * 60
    by_user = Window.partitionBy("user_id").orderBy("ts")
    gapped = (
        F.when(
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(by_user)) > gap_s, 1)
        .otherwise(0)
    )
    sess = (
        events.withColumn("new_sess", gapped)
        .withColumn("session_id",
                    F.sum("new_sess").over(
                        by_user.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"),
             (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
             .alias("duration_s"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("user_id", "session_id")
    )


def top_users_per_type(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k users by total value within each event type (rank window)."""
    totals = (
        events.groupBy("event_type", "user_id")
        .agg(F.round(F.sum("value"), 4).alias("total_value"),
             F.count("*").alias("n_events"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), F.asc("user_id"))
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("event_type", "rank")
    )
