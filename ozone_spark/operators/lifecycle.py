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
    """OmLCRule analog: (prefix AND tags) + age expiration.

    The reference's rule filter is either a bare prefix, a bare tag, or
    an AndOperator of prefix plus a tag set that must ALL match
    (OmLCFilter.java, OmLifecycleRuleAndOperator.java:43-54); `tags`
    here is that conjunctive tag set, evaluated with map element_at so
    keys missing a tag never match (null-propagating equality — same as
    the reference's map lookup)."""
    rule_id: str
    volume: str
    bucket: str
    prefix: str = ""
    tags: tuple[tuple[str, str], ...] = ()
    expiration_days: int | None = None
    expiration_date_ms: int | None = None
    enabled: bool = True

    def predicate(self, now_ms: int) -> Column:
        p = (F.col("volume") == self.volume) & (F.col("bucket") == self.bucket)
        if self.prefix:
            p = p & F.col("key_name").startswith(self.prefix)
        for tag_key, tag_val in self.tags:
            p = p & (F.element_at(F.col("tags"), tag_key) == tag_val)
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


# Tag-filtered rule set (OmLCFilter's tag / AndOperator shapes): a bare
# tag rule, a prefix∧tag∧age AndOperator rule, and a tag rule whose age
# threshold nothing reaches (evaluates to empty, like a freshly-added
# rule in the reference).
TAGGED_RULES = [
    LifecycleRule("rule-tmp-purge", "vol1", "b1",
                  tags=(("tmp", "true"),), expiration_days=1800),
    LifecycleRule("rule-low-tier", "vol2", "b2", prefix="o/",
                  tags=(("tier", "low"),), expiration_days=2000),
    LifecycleRule("rule-urgent-frozen", "vol3", "b0",
                  tags=(("tier", "urgent"),), expiration_days=36500),
]


def lifecycle_tagged_expired(keys: DataFrame,
                             rules: list[LifecycleRule] | None = None,
                             now_ms: int = NOW_MS) -> DataFrame:
    """B4/P5 with tag predicates: keys expired by any enabled tag-
    filtered rule (KeyLifecycleService.java:394-437 evaluates the same
    prefix∧tags∧age conjunction per rule).  Output carries the tier tag
    as a scalar so the gate exercises map extraction end-to-end."""
    rules = [r for r in (rules or TAGGED_RULES) if r.enabled]
    matched = None
    for r in rules:
        m = keys.where(r.predicate(now_ms)).select(
            "db_key", "data_size",
            F.element_at(F.col("tags"), "tier").alias("tier"),
            F.lit(r.rule_id).alias("rule_id"))
        matched = m if matched is None else matched.unionByName(m)
    if matched is None:
        raise ValueError("no enabled lifecycle rules")
    return (
        matched.groupBy("db_key")
        .agg(F.min("rule_id").alias("rule_id"),
             F.min("tier").alias("tier"),
             F.min("data_size").alias("data_size"))
        .orderBy("db_key")
    )


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


def lease_recovery_plan(open_keys: DataFrame, locations: DataFrame,
                        containers: DataFrame,
                        lease_ttl_ms: int, now_ms: int = NOW_MS) -> DataFrame:
    """ST8 (hsync + lease recovery, the query-plane half): hsync'd open
    files whose writer lease expired are finalized at their last
    durably-flushed length — RecoverLease (OmClientProtocol.proto:138)
    commits the key with the block-committed bytes
    (KeyOutputStream.java:517-541 hsync persists block lengths;
    OpenKeyCleanupService.java:79-111 applies the lease threshold).

    A block only counts as committed if its container still exists and
    is not DELETED in SCM — flushed bytes on reclaimed containers are
    gone.  Per expired lease: COMMIT with the committed byte count when
    any durable blocks remain, DELETE when none do.  Non-hsync open
    keys are B3's plain expiry instead — disjoint by construction."""
    expired = open_keys.where(
        F.col("hsync") & (F.lit(now_ms) - F.col("creation_time") > lease_ttl_ms))
    live = containers.where(F.col("state") != "DELETED").select("container_id")
    committed = (
        locations.join(F.broadcast(live), "container_id", "left_semi")
        .groupBy("object_id").agg(
            F.count("*").alias("n_blocks"),
            F.sum("block_len").alias("committed_bytes"),
        )
    )
    return (
        expired.join(committed, "object_id", "left")
        .select(
            "db_key", "object_id", "client_id",
            F.coalesce("n_blocks", F.lit(0)).cast("long").alias("n_blocks"),
            F.coalesce("committed_bytes", F.lit(0)).cast("long")
            .alias("committed_bytes"),
            F.when(F.coalesce("n_blocks", F.lit(0)) > 0, "COMMIT")
            .otherwise("DELETE").alias("action"),
        )
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


# B4's second action: abort incomplete multipart uploads older than
# DaysAfterInitiation (OmLCAbortIncompleteMultipartUpload.java; rule
# evaluation alongside expiration in KeyLifecycleService.java:394-437).
MPU_ABORT_RULES = [
    LifecycleRule("mpu-abort-v1b1", "vol1", "b1", expiration_days=1200),
    LifecycleRule("mpu-abort-v2o", "vol2", "b2", prefix="o/",
                  expiration_days=2000),
]


def lifecycle_mpu_aborts(multipart_uploads: DataFrame,
                         rules: list[LifecycleRule] | None = None,
                         now_ms: int = NOW_MS) -> DataFrame:
    """B4 (abort action): in-flight uploads whose initiation age exceeds
    a rule's days-after-initiation threshold.  Reuses the rule predicate
    machinery with `creation_time` bound to `initiated_ms` — the
    reference evaluates abort rules in the same per-bucket scan pass as
    expiration rules."""
    rules = [r for r in (rules or MPU_ABORT_RULES) if r.enabled]
    mpus = multipart_uploads.withColumn("creation_time", F.col("initiated_ms"))
    matched = None
    for r in rules:
        m = mpus.where(r.predicate(now_ms)).select(
            "upload_id", "db_key", "n_parts", "part_bytes",
            F.lit(r.rule_id).alias("rule_id"))
        matched = m if matched is None else matched.unionByName(m)
    if matched is None:
        raise ValueError("no enabled MPU abort rules")
    return (
        matched.groupBy("upload_id")
        .agg(F.min("rule_id").alias("rule_id"),
             F.min("db_key").alias("db_key"),
             F.min("n_parts").alias("n_parts"),
             F.min("part_bytes").alias("reclaimed_bytes"))
        .orderBy("upload_id")
    )


TRASH_RETENTION_MS = 30 * DAY_MS


def trash_expunge_plan(trash_entries: DataFrame,
                       retention_ms: int = TRASH_RETENTION_MS,
                       now_ms: int = NOW_MS) -> DataFrame:
    """B5 (TrashPolicyOzone emptier, expunge half): trash checkpoints
    older than the retention interval, rolled up per
    (volume, bucket, user, checkpoint) — the emptier deletes whole
    checkpoint directories, so the plan is one row per directory with
    the files/bytes it reclaims."""
    return (
        trash_entries
        .where(F.col("checkpoint_ms").isNotNull()
               & (F.col("checkpoint_ms") + retention_ms <= now_ms))
        .groupBy("volume", "bucket", "owner", "checkpoint")
        .agg(F.count("*").alias("n_files"),
             F.sum("data_size").alias("reclaimed_bytes"))
        .orderBy("volume", "bucket", "owner", "checkpoint")
    )


def trash_checkpoint_plan(trash_entries: DataFrame,
                          now_ms: int = NOW_MS) -> DataFrame:
    """B5 (checkpoint half): every Current entry is renamed into a new
    timestamped checkpoint directory (the emptier's per-user Current ->
    ckpt-<now> rotation; rename is a metadata move, so the plan is the
    src/dst path pair per entry)."""
    new_ckpt = F.concat(F.lit("ckpt-"), F.lit(now_ms).cast("string"))
    return (
        trash_entries.where(F.col("checkpoint_ms").isNull())
        .select(
            "object_id",
            F.col("trash_path").alias("src_path"),
            F.concat(
                F.lit("/"), F.col("volume"), F.lit("/"), F.col("bucket"),
                F.lit("/.Trash/"), F.col("owner"), F.lit("/"), new_ckpt,
                F.lit("/"), F.col("key_name"),
            ).alias("dst_path"),
        )
        .orderBy("object_id")
    )


def gdpr_crypto_shred(deleted_keys: DataFrame,
                      locations: DataFrame,
                      gdpr_bucket: str = "b0") -> DataFrame:
    """GDPR crypto-shred plan (data-plane transform, SURVEY §0).

    Reference: GDPR-enabled buckets keep a per-key symmetric secret in
    the key's metadata (GDPRSymmetricKey,
    hadoop-ozone/common/src/main/java/org/apache/hadoop/ozone/security/GDPRSymmetricKey.java:35-76;
    smoketest/gdpr/).  Deleting the key destroys the secret FIRST —
    every replica of every block becomes unreadable instantly — and
    block reclamation proceeds asynchronously afterwards.

    The plan row per deleted key in a GDPR bucket: the secret to
    destroy plus the blocks/containers/bytes rendered unreadable.

    Scale: the bucket filter prunes at the scan; the block rollup is a
    map-side-combinable groupBy on object_id; the final equi-join keys
    on object_id (uniform).  At 100 TB the `locations` side is the big
    table and the shuffle is one pass over it — no driver-side state.
    """
    blocks = locations.groupBy("object_id").agg(
        F.count("*").alias("n_blocks"),
        F.count_distinct("container_id").alias("n_containers"),
        F.sum("block_len").alias("unreadable_bytes"),
    )
    return (
        deleted_keys.where(F.col("bucket") == gdpr_bucket)
        .join(blocks, "object_id", "left")
        .select(
            "db_key",
            "object_id",
            F.md5("db_key").alias("secret_id"),
            F.lit("AES/CTR/NoPadding").alias("algorithm"),
            F.coalesce("n_blocks", F.lit(0)).cast("long").alias("n_blocks"),
            F.coalesce("n_containers", F.lit(0)).cast("long").alias("n_containers"),
            F.coalesce("unreadable_bytes", F.lit(0)).cast("long").alias("unreadable_bytes"),
        )
        .orderBy("db_key")
    )
