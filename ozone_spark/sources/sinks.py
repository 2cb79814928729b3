"""Result sinks (SURVEY.md §2.1 S11): the reference serves query results
as REST JSON, persists views to RocksDB/Derby, and runs async
export-to-file jobs for oversized result sets
(ContainerEndpoint.java:543-608).  Spark-native: `df.write` in the
format the consumer needs; the async export job is just a separate
action on the same plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def export_parquet(df: DataFrame, path: str, sort_cols: list[str] | None = None,
                   partition_cols: list[str] | None = None) -> int:
    """Persist a result/view (the Recon-store analog).  Sorting before
    write gives parquet min/max stats their pruning power on re-read."""
    w = df
    if sort_cols:
        w = w.sortWithinPartitions(*sort_cols)
    writer = w.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
    return df.sparkSession.read.parquet(path).count()


def export_json(df: DataFrame, path: str) -> int:
    """REST-JSON-shaped export (ldb --compact / Recon response analog)."""
    df.write.mode("overwrite").json(path)
    return df.sparkSession.read.json(path).count()


def export_csv(df: DataFrame, path: str) -> int:
    """The async CSV export job (unhealthy-container export analog)."""
    df.write.mode("overwrite").option("header", True).csv(path)
    return df.sparkSession.read.option("header", True).csv(path).count()


def to_json_rows(df: DataFrame, limit: int = 1000) -> DataFrame:
    """Row-wise JSON rendering (to_json over the struct of all columns) —
    the inline REST response shape without leaving the JVM."""
    return df.limit(limit).select(
        F.to_json(F.struct(*df.columns)).alias("json"))
