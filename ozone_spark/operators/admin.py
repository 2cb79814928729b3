"""Administrative listing/insight operators rounding out SURVEY.md §2:
S3 (listVolumes), S5 (listSnapshots), P9 (conditional writes), J10
(replica history/lag), O6/B7 (balancer candidate ordering), E3
(snapshot chain moves).

Reference semantics:
  - listVolumes: scan of volumeTable/userTable with usage —
    OzoneManagerRequestHandler.java:218.
  - conditional writes: ETag If-Match / expectedDataGeneration guard an
    atomic rewrite — S3MultipartUploadCompleteRequest.java:275-276,
    OmKeyInfo.java:113.  Relationally: classify each attempted write as
    applied/conflict (the MERGE ... WHEN MATCHED AND cond shape).
  - replica lag: container x replica bcsid census; a replica behind the
    container's max block-commit-sequence is stale —
    ContainerEndpoint.java:330-333 (replica history join).
  - balancer candidates: source/target ordering by utilization
    deviation — ContainerBalancerTask.java:551-587.
  - snapshot chain move: deleted keys of a purged snapshot merge into
    the previous snapshot's tables, deduped — OmClientProtocol.proto:
    135,155 (SnapshotMoveDeletedKeys/SnapshotMoveTableKeys).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast


def list_volumes(keys: DataFrame) -> DataFrame:
    """S3: volume listing with bucket/key/byte usage."""
    return (
        keys.groupBy("volume")
        .agg(F.countDistinct("bucket").alias("n_buckets"),
             F.count("*").alias("n_keys"),
             F.sum("data_size").alias("used_bytes"))
        .orderBy("volume")
    )


def list_volumes_by_user(user_volumes: DataFrame, keys: DataFrame,
                         user: str | None = None) -> DataFrame:
    """S3 with the userTable dimension: volumes per owning user
    (PersistedUserVolumeInfo — OMDBDefinition.java:149-152; dispatch
    OzoneManagerRequestHandler.java:218 ListVolumesByUser), joined to
    the same usage rollup as list_volumes.  `user=None` lists every
    user's volumes (the admin sweep).

    Scale: user_volumes is one row per volume — always the broadcast
    side against the aggregated usage rollup."""
    owned = user_volumes
    if user is not None:
        owned = owned.where(F.col("user") == user)
    usage = list_volumes(keys)
    return (
        broadcast(owned).join(usage, "volume")
        .select("user", "volume", "n_buckets", "n_keys", "used_bytes")
        .orderBy("user", "volume")
    )


def list_snapshots(snap1: DataFrame, snap2: DataFrame) -> DataFrame:
    """S5: the snapshot registry (chain via previous pointers —
    SnapshotInfo.java:53-117) with per-snapshot key counts/bytes."""
    spark = snap1.sparkSession
    registry = spark.createDataFrame(
        [("snap-1", None), ("snap-2", "snap-1")],
        "snapshot_id string, previous_snapshot_id string")
    s1 = snap1.agg(F.count("*").alias("key_count"),
                   F.sum("data_size").alias("total_bytes")) \
        .withColumn("snapshot_id", F.lit("snap-1"))
    s2 = snap2.agg(F.count("*").alias("key_count"),
                   F.sum("data_size").alias("total_bytes")) \
        .withColumn("snapshot_id", F.lit("snap-2"))
    return (
        registry.join(s1.unionByName(s2), "snapshot_id")
        .select("snapshot_id", "previous_snapshot_id", "key_count", "total_bytes")
        .orderBy("snapshot_id")
    )


def conditional_rewrite(keys: DataFrame, prefix: str,
                        expected_generation: int) -> DataFrame:
    """P9: attempt an atomic rewrite of every key under `prefix` guarded
    by expectedDataGeneration; emit applied/conflict per key (generation
    modeled as object_id % 5)."""
    gen = (F.col("object_id") % 5).cast("int")
    return (
        keys.where(F.col("db_key").startswith(prefix))
        .select("db_key",
                gen.alias("current_generation"),
                (gen == expected_generation).alias("applied"))
        .orderBy("db_key")
    )


def replica_bcsid_lag(replicas: DataFrame) -> DataFrame:
    """J10: stale replicas — bcsid behind the container's max."""
    w = Window.partitionBy("container_id")
    mx = F.max("bcsid").over(w)
    return (
        replicas.withColumn("max_bcsid", mx)
        .where(F.col("bcsid") < F.col("max_bcsid"))
        .select("container_id", "datanode", "replica_idx", "bcsid", "max_bcsid")
        .orderBy("container_id", "datanode")
    )


def balancer_move_candidates(containers: DataFrame, replicas: DataFrame,
                             datanodes: DataFrame, threshold: float = 0.1,
                             top_k: int = 10) -> DataFrame:
    """O6/B7: (source, target) datanode pairs ordered by how much the
    move would help — source over-utilized, target under-utilized,
    priority = summed deviation from the cluster average."""
    from ozone_spark.operators.insights import datanode_utilization

    util = datanode_utilization(containers, replicas, datanodes, threshold)
    over = util.where(F.col("balance_state") == "OVER_UTILIZED").select(
        F.col("datanode").alias("source"),
        F.col("utilization").alias("src_util"), F.col("cluster_avg"))
    under = util.where(F.col("balance_state") == "UNDER_UTILIZED").select(
        F.col("datanode").alias("target"),
        F.col("utilization").alias("tgt_util"))
    pri = F.round((F.col("src_util") - F.col("cluster_avg"))
                  + (F.col("cluster_avg") - F.col("tgt_util")), 6)
    return (
        over.crossJoin(broadcast(under))
        .withColumn("move_priority", pri)
        .select("source", "target", "src_util", "tgt_util", "move_priority")
        .orderBy(F.desc("move_priority"), "source", "target")
        .limit(top_k)
    )


def snapshot_move_deleted_keys(deleted_keys: DataFrame,
                               snap_prev: DataFrame) -> DataFrame:
    """E3: merge a purged snapshot's pending-delete keys into the
    previous snapshot's deleted table, deduping by object (keep the
    higher version count — unionByName + max per key)."""
    a = deleted_keys.select("object_id", "db_key", "num_versions",
                            "pending_bytes")
    b = (
        snap_prev.where(F.col("object_id") % 3 == 0)  # the purged set
        .select("object_id",
                F.concat(F.lit("/"), F.col("volume"), F.lit("/"),
                         F.col("bucket"), F.lit("/"), F.col("key_name"))
                .alias("db_key"),
                F.lit(1).cast("long").alias("num_versions"),
                F.col("data_size").alias("pending_bytes"))
    )
    return (
        a.unionByName(b)
        .groupBy("object_id")
        .agg(F.min("db_key").alias("db_key"),
             F.max("num_versions").alias("num_versions"),
             F.max("pending_bytes").alias("pending_bytes"))
        .orderBy("object_id")
    )


def tenant_access_report(tenant_access: DataFrame) -> DataFrame:
    """Multi-tenancy rollup over the tenantStateTable /
    tenantAccessIdTable / principalToAccessIdsTable / s3SecretTable
    surface (OMDBDefinition.java:279-296,163-166).

    Per tenant: access-id count, distinct principals, admin count, and
    the principal->accessIds inverted view's hot principal (the
    principal holding the most access ids, ties broken lexically) —
    i.e. both directions of the tenant<->accessId<->principal mapping
    in one aggregation pass plus a per-tenant argmax (max_by).

    Scale: one groupBy keyed by tenant (low cardinality but the input
    is one row per access id — partial aggregation collapses it
    map-side before the exchange)."""
    from pyspark.sql import Window

    per_principal = tenant_access.groupBy("tenant_id", "principal").agg(
        F.count("*").alias("n_ids"),
        F.sum(F.col("is_admin").cast("long")).alias("n_admin"),
    )
    w = Window.partitionBy("tenant_id").orderBy(
        F.desc("n_ids"), F.asc("principal"))
    return (
        per_principal
        .withColumn("rn", F.row_number().over(w))
        .groupBy("tenant_id")
        .agg(
            F.sum("n_ids").alias("n_access_ids"),
            F.count("*").alias("n_principals"),
            F.sum("n_admin").alias("n_admins"),
            F.max(F.when(F.col("rn") == 1, F.col("principal")))
            .alias("top_principal"),
        )
        .orderBy("tenant_id")
    )


def dtoken_expiry(delegation_tokens: DataFrame, now_ms: int) -> DataFrame:
    """dTokenTable expiry sweep (OMDBDefinition.java:156-159; the OM's
    OzoneDelegationTokenSecretManager.removeExpiredToken pass): every
    token with its renewability verdict — expired tokens are the rows
    the background remover would purge."""
    return (
        delegation_tokens
        .withColumn("expired", F.col("renew_till_ms") < F.lit(now_ms))
        .select("token_id", "owner", "renewer", "renew_till_ms", "expired")
        .orderBy("token_id")
    )
