"""Skew-mitigation utilities for 100 TB-scale aggregations and joins.

The reference never shuffles (per-node RocksDB), but its workloads have
exactly the keys that skew a distributed shuffle: bucket roots in the
namespace rollup (every key in a bucket hits the same dir_path), hot
containers in the inverted index, hot users in event sessionization.

Two standard tools, both pure DataFrame programs:
  - salted two-stage aggregation: groupBy(key, salt) partial -> groupBy
    (key) final.  AQE's skew handling only splits *join* partitions;
    a single hot groupBy key still lands on one reducer without this.
  - salted broadcast-side explode for skewed joins: replicate the small
    side per salt so the big side's hot key spreads across salt buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import broadcast


def salted_sum_count(df: DataFrame, keys: Sequence[str],
                     sum_cols: Sequence[str], n_salt: int = 16) -> DataFrame:
    """Two-stage skew-proof aggregation: count(*) plus sum(col) for each
    col in sum_cols, grouped by `keys`.  Identical results to the direct
    groupBy; the hot key's rows first combine across n_salt reducers."""
    salt = (F.rand(seed=42) * n_salt).cast("int").alias("_salt")
    partial = (
        df.select(*keys, salt, *sum_cols)
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_cnt"),
             *[F.sum(c).alias(f"_s_{c}") for c in sum_cols])
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_cnt").alias("count"),
             *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols])
    )


def salted_join_small(big: DataFrame, small: DataFrame, key: str,
                      n_salt: int = 16) -> DataFrame:
    """Equi-join where `big` is skewed on `key`: salt the big side,
    explode the (broadcast) small side across all salts, join on
    (key, salt).  Result == plain inner join on key."""
    big_s = big.withColumn("_salt", (F.rand(seed=7) * n_salt).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt")
    small_s = small.select("*", salts)
    return (
        big_s.join(broadcast(small_s), [key, "_salt"])
        .drop("_salt")
    )
