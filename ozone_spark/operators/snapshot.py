"""Snapshot diff (SURVEY.md §2.3 J2, §2.6 E1/E2).

Reference: SnapshotDiffManager.java:994-1230 — full-outer join of two
snapshot key tables on objectId, classified into CREATE / DELETE /
MODIFY / RENAME (rename = same objectId, different key name).

Scale notes: the reference walks a compaction DAG to diff via sequential
SST reads (efficient-snapdiff.md:34-35); the Spark-native equivalent is
a shuffle join on object_id.  At 100 TB both snapshot tables would be
bucketed by object_id on write so the join is co-partitioned (no
shuffle); AQE handles the residual skew.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DIFF_COLS = ["object_id", "diff_type", "old_key", "new_key",
             "old_size", "new_size"]


def snapshot_diff(snap_from: DataFrame, snap_to: DataFrame) -> DataFrame:
    """J2/E1: classify namespace changes between two snapshot versions."""
    a = snap_from.select(
        "object_id",
        F.col("key_name").alias("old_key"),
        F.col("data_size").alias("old_size"),
    )
    b = snap_to.select(
        "object_id",
        F.col("key_name").alias("new_key"),
        F.col("data_size").alias("new_size"),
    )
    j = a.join(b, "object_id", "full_outer")
    diff_type = (
        F.when(F.col("new_key").isNull(), "DELETE")
        .when(F.col("old_key").isNull(), "CREATE")
        .when(F.col("old_key") != F.col("new_key"), "RENAME")
        .when(F.col("old_size") != F.col("new_size"), "MODIFY")
        .otherwise("NONE")
    )
    return (
        j.withColumn("diff_type", diff_type)
        .where(F.col("diff_type") != "NONE")
        .select(*DIFF_COLS)
    )


def snapshot_diff_summary(snap_from: DataFrame, snap_to: DataFrame) -> DataFrame:
    """Diff class cardinalities + byte delta (delta-file computation
    analog, SnapshotDiffManager.java:1215-1230)."""
    d = snapshot_diff(snap_from, snap_to)
    return (
        d.groupBy("diff_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(F.col("new_size"), F.lit(0))
                  - F.coalesce(F.col("old_size"), F.lit(0))).alias("bytes_delta"),
        )
        .orderBy("diff_type")
    )
