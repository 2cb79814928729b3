"""Incremental namespace rollup as a custom stateful streaming operator
(SURVEY.md §2.4 A4 + §2.8 ST4 — the one piece Catalyst does not give us
for free, per §4).

Reference: NSSummaryTaskDbEventHandler.java:128-161 (per-event handlers)
and :426-449 (propagateSizeUpwards) — every key PUT/DELETE updates the
NSSummary node of each ancestor directory.  The reference walks parent
pointers per event against RocksDB; the Spark-native operator instead:

  1. explodes each CDC event into (ancestor dir_path, signed deltas) —
     the propagation set, computed declaratively;
  2. groups the stream by dir_path and folds the deltas into per-key
     state with applyInPandasWithState (the mapGroupsWithState analog,
     Arrow-batched);
  3. emits the updated NSSummary row for every touched directory each
     micro-batch.

State is partitioned by dir_path — at 100 TB the state store shards
across executors with no skew beyond the namespace's own shape (bucket
roots are the hottest keys, bounded by #buckets).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from ozone_spark.streaming.cdc import read_cdc_stream

ROLLUP_SCHEMA = StructType([
    StructField("dir_path", StringType()),
    StructField("num_files", LongType()),
    StructField("size_of_files", LongType()),
    StructField("replicated_size", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("num_files", LongType()),
    StructField("size_of_files", LongType()),
    StructField("replicated_size", LongType()),
])


def ancestor_deltas(events: DataFrame) -> DataFrame:
    """Step 1: the upward-propagation set — one signed delta row per
    (event, ancestor directory), depth-generic (shares the ancestor
    expression with the batch rollup so process()==reprocess() holds at
    any tree depth)."""
    from ozone_spark.operators.namespace import explode_ancestors
    sign = F.when(F.col("op") == "PUT", F.lit(1)).otherwise(F.lit(-1))
    deltas = events.select(
        "volume", "bucket", "key_name",
        sign.alias("d_files"),
        (sign * F.col("data_size")).alias("d_size"),
        (sign * F.col("replicated_size")).alias("d_repl"),
    )
    return explode_ancestors(deltas, ["d_files", "d_size", "d_repl"])


def _fold(key: Any, pdfs: Iterator[pd.DataFrame],
          state: GroupState) -> Iterator[pd.DataFrame]:
    """Step 2: per-dir state fold (self-contained closure — executors
    don't import ozone_spark)."""
    nf, sz, rp = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        nf += int(pdf["d_files"].sum())
        sz += int(pdf["d_size"].sum())
        rp += int(pdf["d_repl"].sum())
    state.update((nf, sz, rp))
    yield pd.DataFrame({
        "dir_path": [key[0]],
        "num_files": [nf],
        "size_of_files": [sz],
        "replicated_size": [rp],
    })


def run_incremental_rollup(spark: SparkSession, cdc_dir: str,
                           checkpoint_dir: str,
                           store_path: str | None = None) -> DataFrame:
    """Drain the CDC log maintaining the rollup statefully; returns the
    final NSSummary table.  Each micro-batch's updated directory rows
    are merged into a bucket-partitioned parquet store (replace-by-key —
    the Recon async-flusher analog, NSSummaryAsyncFlusher): state scales
    with the executors' state store and the view with the parquet store;
    nothing is ever collected to the driver."""
    from ozone_spark.streaming.cdc import IncrementalViewStore

    stream = ancestor_deltas(read_cdc_stream(spark, cdc_dir))
    updated = stream.groupBy("dir_path").applyInPandasWithState(
        _fold, ROLLUP_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)

    store = IncrementalViewStore(
        spark, store_path or checkpoint_dir.rstrip("/") + "_view",
        ["dir_path"], ["num_files", "size_of_files", "replicated_size"],
        mode="replace")

    q = (
        updated.writeStream.foreachBatch(
            lambda batch_df, _bid: store.merge(batch_df))
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cur = store.current()
    if cur is None:
        return spark.createDataFrame([], ROLLUP_SCHEMA)
    return cur
