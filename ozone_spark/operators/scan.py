"""Generic scan / filtered-search operators (SURVEY.md §2.1 S7/S8, §2.2 P2-P4).

Reference semantics:
  - `ozone debug ldb scan` (cli-debug DBScanner.java:110-184): scan any
    table with --startkey/--endkey bounds, --filter field:op:value
    conjunctions (EQUALS / LESSER / GREATER / REGEX), --fields projection,
    --limit, --count.
  - Recon key search (OMDBInsightEndpoint.java:848-888): conjunction of
    replication / creation-date / size / prefix predicates + pagination.
  - "Light" column-pruned listings (OmClientProtocol.proto:145,148).

All of these are declarative filter+project+sort+limit — expressed that
way, Catalyst pushes the predicates and the projection into the parquet
scan (PushedFilters / ReadSchema), which is the reference's seek +
reduced-DTO behavior for free.
"""

from __future__ import annotations

from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_OPS = {"EQUALS", "LESSER", "GREATER", "REGEX"}


def _pred(field: str, op: str, value: Any) -> Column:
    c = F.col(field)
    if op == "EQUALS":
        return c == value
    if op == "LESSER":
        return c < value
    if op == "GREATER":
        return c > value
    if op == "REGEX":
        return c.rlike(value)
    raise ValueError(f"unknown filter op {op!r}; expected one of {_OPS}")


def scan(
    table: DataFrame,
    key_col: str | None = None,
    start_key: str | None = None,
    end_key: str | None = None,
    filters: list[tuple[str, str, Any]] | None = None,
    fields: list[str] | None = None,
    limit: int | None = None,
    count: bool = False,
) -> DataFrame:
    """S7: the whole ldb-CLI query surface as one declarative function."""
    df = table
    if key_col and start_key is not None:
        df = df.where(F.col(key_col) >= start_key)
    if key_col and end_key is not None:
        df = df.where(F.col(key_col) < end_key)
    for field, op, value in filters or []:
        df = df.where(_pred(field, op, value))
    if count:
        return df.agg(F.count("*").alias("count"))
    if fields:
        df = df.select(*fields)
    if key_col:
        df = df.orderBy(key_col)
    if limit is not None:
        df = df.limit(limit)
    return df


def key_search(
    keys: DataFrame,
    prefix: str = "",
    repl_factor: int | None = None,
    min_creation_time: int | None = None,
    min_data_size: int | None = None,
    prev_key: str = "",
    limit: int = 1000,
) -> DataFrame:
    """S8: Recon filtered key search (OMDBInsightEndpoint.java:848-888)."""
    df = keys
    if prefix:
        df = df.where(F.col("db_key").startswith(prefix))
    if repl_factor is not None:
        df = df.where(F.col("repl_factor") == repl_factor)
    if min_creation_time is not None:
        df = df.where(F.col("creation_time") >= min_creation_time)
    if min_data_size is not None:
        df = df.where(F.col("data_size") >= min_data_size)
    if prev_key:
        df = df.where(F.col("db_key") > prev_key)
    return (
        df.select("db_key", "object_id", "data_size", "repl_factor", "creation_time")
        .orderBy("db_key")
        .limit(limit)
    )


def keys_light(keys: DataFrame, prefix: str = "") -> DataFrame:
    """P4: column-pruned listing (ReconBasicOmKeyInfo analog) — the pruned
    projection reaches the scan's ReadSchema via Catalyst."""
    df = keys
    if prefix:
        df = df.where(F.col("db_key").startswith(prefix))
    return df.select("db_key", "data_size", "creation_time")
