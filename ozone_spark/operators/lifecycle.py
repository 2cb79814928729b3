"""Rule/TTL engine + cleanup-job dataflows (SURVEY.md §2.2 P5-P7, §2.9 B1-B4).

Reference semantics:
  - lifecycle rules: per-bucket (prefix AND/OR tag) + age predicates,
    any matching enabled rule expires the key — OmLCRule.java,
    OmLifecycleRuleAndOperator.java:43-54, evaluation
    KeyLifecycleService.java:394-437; overlapping rule prefixes are
    deduped (E4, :496-534).
  - open-key expiry: age > threshold — OpenKeyCleanupService.java:79-111.
  - key deletion reclaimability: a deleted key still referenced by a
    snapshot is NOT reclaimable — KeyDeletingService.java:577-611 (P7,
    anti-join against the snapshot chain's key sets).

All predicates evaluate against a fixed engine clock (tables.NOW_MS) so
results are deterministic and oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ozone_spark.tables import NOW_MS

DAY_MS = 86400000


@dataclass(frozen=True)
class LifecycleRule:
    """OmLCRule analog: prefix + age expiration."""
    rule_id: str
    volume: str
    bucket: str
    prefix: str = ""
    expiration_days: int | None = None
    expiration_date_ms: int | None = None
    enabled: bool = True

    def predicate(self, now_ms: int) -> Column:
        p = (F.col("volume") == self.volume) & (F.col("bucket") == self.bucket)
        if self.prefix:
            p = p & F.col("key_name").startswith(self.prefix)
        if self.expiration_days is not None:
            p = p & (F.col("creation_time") + self.expiration_days * DAY_MS <= now_ms)
        if self.expiration_date_ms is not None:
            p = p & (F.col("creation_time") < self.expiration_date_ms)
        return p


# The engine's standing rule set (overlapping prefixes on purpose — E4).
DEFAULT_RULES = [
    LifecycleRule("rule-f-old", "vol1", "b1", prefix="f/", expiration_days=1500),
    LifecycleRule("rule-f-1995", "vol1", "b1", prefix="f/y1995/", expiration_days=365),
    LifecycleRule("rule-o-date", "vol2", "b2", prefix="o/",
                  expiration_date_ms=NOW_MS - 4 * 365 * DAY_MS),
    LifecycleRule("rule-disabled", "vol0", "b0", prefix="", expiration_days=0,
                  enabled=False),
]


def lifecycle_expired(keys: DataFrame,
                      rules: list[LifecycleRule] | None = None,
                      now_ms: int = NOW_MS) -> DataFrame:
    """B4/P5: keys expired by any enabled rule; a key matching several
    rules appears once with the lexicographically-first rule id (the
    reference dedupes overlapping rule prefixes, E4)."""
    rules = [r for r in (rules or DEFAULT_RULES) if r.enabled]
    matched = None
    for r in rules:
        m = keys.where(r.predicate(now_ms)).select(
            "db_key", "data_size", F.lit(r.rule_id).alias("rule_id"))
        matched = m if matched is None else matched.unionByName(m)
    if matched is None:
        raise ValueError("no enabled lifecycle rules")
    return (
        matched.groupBy("db_key")
        .agg(F.min("rule_id").alias("rule_id"), F.min("data_size").alias("data_size"))
        .orderBy("db_key")
    )


def open_keys_expired(open_keys: DataFrame, ttl_ms: int,
                      now_ms: int = NOW_MS) -> DataFrame:
    """B3/P6: open keys whose age exceeds the expiry threshold."""
    return (
        open_keys.where(F.lit(now_ms) - F.col("creation_time") > ttl_ms)
        .select("db_key", "object_id", "client_id", "creation_time", "hsync")
        .orderBy("db_key")
    )


def reclaimable_deleted_keys(deleted_keys: DataFrame,
                             snapshot_keys: DataFrame) -> DataFrame:
    """B1/P7: deleted keys safe to purge = not referenced by any snapshot
    (left-anti join against the snapshot chain's object ids)."""
    snap_refs = snapshot_keys.select("object_id").distinct()
    return (
        deleted_keys.join(snap_refs, "object_id", "left_anti")
        .select("db_key", "object_id", "pending_bytes", "num_versions")
        .orderBy("db_key")
    )
