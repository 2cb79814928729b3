"""Physical table layout policy (SURVEY.md §4): how the namespace is
laid out at real scale so Catalyst gets the reference's hand-rolled
optimizations for free.

  - keys: partitioned by volume, each file sorted by db_key.  A prefix
    listing then prunes partitions (volume) and skips files/row-groups
    via parquet min/max on db_key — the Spark analog of the RocksDB
    `seekKey` (OmMetadataManagerImpl.java:1102-1112) and of the "early
    exit when prefix exhausted" loop (:1165-1169).
  - snapshots: bucketed by object_id so snapshot diff (J2) is a
    co-partitioned join with no shuffle — the analog of the reference's
    sequential-IO SST diff (efficient-snapdiff.md:34-35).
  - locations: bucketed by container_id for shuffle-free container joins.

At 100 TB these writes happen once at ingest; every query in the
operator library then plans against the laid-out tables.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_keys_layout(keys: DataFrame, out_dir: str,
                      files_per_partition: int = 4) -> None:
    """Partition by volume, sort within files by db_key (gives parquet
    row-group min/max stats their pruning power for prefix scans)."""
    (
        keys.repartition(files_per_partition, "volume", "bucket")
        .sortWithinPartitions("db_key")
        .write.mode("overwrite")
        .partitionBy("volume")
        .parquet(out_dir)
    )


def read_keys_layout(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(out_dir)


def list_keys_pruned(spark: SparkSession, out_dir: str, volume: str,
                     prefix: str, max_keys: int = 1000) -> DataFrame:
    """The scale-path listing: the volume equality prunes partitions,
    the prefix pushes to the parquet scan, orderBy+limit compiles to
    TakeOrderedAndProject (per-file top-k, driver merge)."""
    df = read_keys_layout(spark, out_dir)
    return (
        df.where((F.col("volume") == volume)
                 & F.col("db_key").startswith(prefix))
        .select("db_key", "object_id", "data_size")
        .orderBy("db_key")
        .limit(max_keys)
    )


def compact_table(spark: SparkSession, path: str,
                  target_file_bytes: int = 128 * 1024 * 1024,
                  sort_cols: list[str] | None = None) -> int:
    """Small-file compaction: rewrite a parquet table into
    size-appropriate files (and re-sort, restoring min/max pruning
    power).  The operational sibling of the reference's RocksDB
    compactions — at 100 TB streaming sinks and incremental stores
    accrete small files that this job folds back into scan-efficient
    ones.  Returns the new file count."""
    import glob as _glob

    df = spark.read.parquet(path)
    total = sum(os.path.getsize(f)
                for f in _glob.glob(f"{path}/**/*.parquet", recursive=True))
    n_files = max(1, round(total / target_file_bytes))
    w = df.repartition(n_files)
    if sort_cols:
        w = w.sortWithinPartitions(*sort_cols)
    tmp = path + ".compact"
    w.write.mode("overwrite").parquet(tmp)
    out = spark.read.parquet(tmp)
    out.write.mode("overwrite").parquet(path)
    import shutil as _shutil
    _shutil.rmtree(tmp, ignore_errors=True)
    return len(_glob.glob(f"{path}/*.parquet"))


def write_bucketed_snapshots(snap1: DataFrame, snap2: DataFrame,
                             spark: SparkSession, n_buckets: int = 8,
                             prefix: str = "ozs") -> tuple[str, str]:
    """Persist both snapshot versions bucketed+sorted by object_id; the
    diff join then needs no shuffle (co-partitioned scans)."""
    import shutil

    names = (f"{prefix}_snap1_b", f"{prefix}_snap2_b")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    warehouse = warehouse.removeprefix("file:")
    for df, name in ((snap1, names[0]), (snap2, names[1])):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a DROP in a fresh metastore won't clear a location left behind
        # by an earlier session — remove it physically
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, "object_id")
            .sortBy("object_id")
            .saveAsTable(name)
        )
    return names


def zorder_key(a: F.Column, b: F.Column, bits: int = 16) -> F.Column:
    """Morton/Z-order interleave of two columns (each clamped to `bits`
    bits): the multi-dimensional clustering key.  Sorting a table by
    this key gives parquet min/max stats pruning power on BOTH columns
    at once — the Spark-side analog of Delta/Iceberg OPTIMIZE ZORDER,
    and the right layout for tables queried by more than one axis
    (e.g. events by user AND by time window).

    Pure bit arithmetic on longs: whole-stage codegen, no UDF."""
    a = F.when(a < 0, 0).otherwise(
        F.when(a >= (1 << bits), (1 << bits) - 1).otherwise(a)).cast("long")
    b = F.when(b < 0, 0).otherwise(
        F.when(b >= (1 << bits), (1 << bits) - 1).otherwise(b)).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i)
             + F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    return z


def write_events_zorder(events: DataFrame, out_dir: str,
                        n_files: int = 8) -> None:
    """Lay out events Z-ordered on (user_id, event-day): range-partition
    by the z key, sort within files.  Point/range predicates on either
    axis then skip most files via footer min/max — without committing
    the layout to a single sort axis."""
    day = (F.unix_timestamp("ts") / 86400).cast("long")
    z = zorder_key(F.col("user_id"), day)
    (
        events.withColumn("z", z)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite").parquet(out_dir)
    )
