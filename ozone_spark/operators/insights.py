"""Recon insight aggregations (SURVEY.md §2.4 A1-A3, A6-A7, A9-A11).

Reference semantics:
  - file/container log2-size histograms: FileSizeCountTaskHelper.java:42+,
    ContainerSizeCountTask.java, bin math ReconUtils.java:542-597.
  - table insight counts into GLOBAL_STATS: OmTableInsightTask.java:57-124.
  - cluster state summary: ClusterStateEndpoint.java:99-223.
  - balancer utilization: ContainerBalancerTask.java:518-587 —
    cluster-average utilization, over/under-utilized sets at ±threshold.
  - heatmap: HeatMapUtil.java:83-149 — access counts joined to namespace
    entities, min/max-normalized rollup.
  - pending deletion totals per datanode: PendingDeletionEndpoint.

Scale notes: histograms are single-shuffle groupBys with map-side partial
aggregation; the heatmap joins the (large) access log to the key table on
the entity id and broadcasts nothing large; datanode utilization joins
fact->dimension with broadcast(containers).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ozone_spark.functions.dedup import bounded_window_key as _bwk
from pyspark.sql.functions import broadcast

from ozone_spark.functions.bins import (
    CONTAINER_BIN_BASE_EXP,
    CONTAINER_BIN_MAX_IDX,
    FILE_BIN_BASE_EXP,
    FILE_BIN_MAX_IDX,
    size_bin_index,
    size_bin_upper_bound,
)


def file_size_histogram(keys: DataFrame) -> DataFrame:
    """A1: count of keys per (volume, bucket, log2-size-bin)."""
    bin_idx = size_bin_index(F.col("data_size"), FILE_BIN_BASE_EXP, FILE_BIN_MAX_IDX)
    return (
        keys.select("volume", "bucket", bin_idx.alias("bin_index"))
        .groupBy("volume", "bucket", "bin_index")
        .agg(F.count("*").alias("file_count"))
        .withColumn("bin_upper_bytes",
                    size_bin_upper_bound(F.col("bin_index"), FILE_BIN_BASE_EXP))
        .orderBy("volume", "bucket", "bin_index")
    )


def container_size_histogram(containers: DataFrame) -> DataFrame:
    """A2: count of containers per log2-size-bin (base 512 MiB)."""
    bin_idx = size_bin_index(F.col("used_bytes"),
                             CONTAINER_BIN_BASE_EXP, CONTAINER_BIN_MAX_IDX)
    return (
        containers.select(bin_idx.alias("bin_index"))
        .groupBy("bin_index")
        .agg(F.count("*").alias("container_count"))
        .withColumn("bin_upper_bytes",
                    size_bin_upper_bound(F.col("bin_index"), CONTAINER_BIN_BASE_EXP))
        .orderBy("bin_index")
    )


def global_stats(keys: DataFrame, open_keys: DataFrame,
                 deleted_keys: DataFrame) -> DataFrame:
    """A3/A9: per-table row counts + byte totals (GLOBAL_STATS analog)."""
    def one(df: DataFrame, name: str, size_col: str, repl_col) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count("*").alias("row_count"),
            F.sum(size_col).cast("long").alias("total_bytes"),
            (F.sum(repl_col).cast("long") if repl_col else
             F.lit(None).cast("long")).alias("total_replicated_bytes"),
        )
    return (
        one(keys, "keys", "data_size", "replicated_size")
        .unionByName(one(open_keys, "open_keys", "data_size", None))
        .unionByName(one(deleted_keys, "deleted_keys", "pending_bytes",
                         "pending_replicated_bytes"))
        .orderBy("table_name")
    )


def cluster_state(keys: DataFrame, containers: DataFrame,
                  datanodes: DataFrame) -> DataFrame:
    """A6: one-row cluster summary (volumes/buckets/keys/bytes/containers)."""
    ns = keys.agg(
        F.countDistinct("volume").alias("num_volumes"),
        F.countDistinct("volume", "bucket").alias("num_buckets"),
        F.count("*").alias("num_keys"),
        F.sum("data_size").alias("total_used_bytes"),
    )
    cs = containers.where(F.col("state") != "DELETED").agg(
        F.count("*").alias("num_containers"))
    dn = datanodes.agg(F.count("*").alias("num_datanodes"))
    return ns.crossJoin(broadcast(cs)).crossJoin(broadcast(dn))


def datanode_utilization(containers: DataFrame, replicas: DataFrame,
                         datanodes: DataFrame, threshold: float = 0.1) -> DataFrame:
    """A7: per-datanode used bytes (each replica holds a full container
    copy), utilization vs the cluster average, balancer classification."""
    used = (
        replicas.join(broadcast(containers.select("container_id", "used_bytes")),
                      "container_id")
        .groupBy("datanode")
        .agg(F.count("*").alias("replica_count"),
             F.sum("used_bytes").alias("used"))
    )
    j = datanodes.join(used, "datanode", "left").na.fill({"replica_count": 0, "used": 0})
    w = Window.partitionBy(_bwk("datanode"))
    cluster_avg = F.sum("used").over(w) / F.sum("capacity").over(w)
    util = F.col("used") / F.col("capacity")
    return (
        j.withColumn("utilization", F.round(util, 6))
        .withColumn("cluster_avg", F.round(cluster_avg, 6))
        .withColumn(
            "balance_state",
            F.when(util > cluster_avg + threshold, "OVER_UTILIZED")
            .when(util < cluster_avg - threshold, "UNDER_UTILIZED")
            .otherwise("OK"),
        )
        .select("datanode", "replica_count", "used", "capacity",
                "utilization", "cluster_avg", "balance_state")
        .orderBy("datanode")
    )


def heatmap(events: DataFrame, keys: DataFrame) -> DataFrame:
    """A10/J9: access counts per bucket, min/max-normalized.  Events are
    mapped onto namespace entities by entity id (the pluggable
    IHeatMapProvider seam in the reference)."""
    access = (
        events.select(((F.col("user_id") * 7 + F.col("event_id")) % 6000)
                      .alias("object_id"))
        .groupBy("object_id")
        .agg(F.count("*").alias("hits"))
    )
    per_bucket = (
        keys.select("object_id", "volume", "bucket")
        .join(access, "object_id")
        .groupBy("volume", "bucket")
        .agg(F.sum("hits").alias("access_count"))
    )
    w = Window.partitionBy(_bwk("volume"))
    mn, mx = F.min("access_count").over(w), F.max("access_count").over(w)
    heat = F.when(mx == mn, F.lit(1.0)).otherwise(
        (F.col("access_count") - mn).cast("double") / (mx - mn))
    return (
        per_bucket.withColumn("heat", F.round(heat, 6))
        .orderBy("volume", "bucket")
    )


def pending_deletion_by_datanode(deleted_keys: DataFrame, locations: DataFrame,
                                 replicas: DataFrame) -> DataFrame:
    """A11: pending-delete bytes per datanode — deleted keys' blocks
    resolved through the replica map."""
    blocks = (
        deleted_keys.select("object_id", "num_versions")
        .join(locations, "object_id")
        .select("container_id",
                (F.col("block_len") * F.col("num_versions")).alias("pending"))
    )
    return (
        blocks.join(broadcast(replicas.select("container_id", "datanode")),
                    "container_id")
        .groupBy("datanode")
        .agg(F.sum("pending").alias("pending_bytes"),
             F.count("*").alias("pending_blocks"))
        .orderBy("datanode")
    )


def blocks_pending_deletion(deleted_keys: DataFrame, locations: DataFrame,
                            containers: DataFrame, prev_txid: int = 0,
                            max_records: int = 1000) -> DataFrame:
    """/blocks/deletePending analog (BlocksEndPoint.java:89-140): the
    SCM deleted-blocks transaction log grouped by the owning
    container's state, paginated by transaction id (prevKey exclusive,
    limit+1 -> is_truncated).  One deleted key is one transaction
    (tx_id = object_id); its blocks resolve through the location table
    and the container registry supplies the state; the per-transaction
    local-id list is rendered as a sorted CSV string (scalar-portable
    where the reference returns a JSON array).

    max_records counts TRANSACTIONS, and the page always ends on a
    transaction boundary: a tx fanning out to several container rows is
    never split, so resuming with prev_txid = last tx_id loses nothing
    (the reference endpoint pages whole DeletedBlocksTransaction
    records for the same reason).

    Page-first plan: the page membership (distinct tx ids surviving the
    joins, ordered, limit+1) is decided on an ID-ONLY projection of the
    join chain — 8-byte keys, no aggregation state, TakeOrdered instead
    of a global sort — and only the <= max_records+1 paged transactions
    flow through the collect_list aggregation.  The previous shape
    aggregated EVERY pending transaction and paged afterwards (and
    computed that full aggregate twice, once per fan-out branch): at
    the reference's log scale that is the whole deleted-blocks table
    through a collect_list for a 1000-row page."""
    from pyspark.sql import Window

    dk = deleted_keys.select(F.col("object_id").alias("tx_id")) \
        .where(F.col("tx_id") > prev_txid)
    loc = locations.select(F.col("object_id").alias("tx_id"),
                           "container_id", "local_id")
    # id-only membership: tx ids that produce >= 1 joined row, in the
    # same set the full chain (inner joins) would keep
    tx_ids = (
        dk.join(loc.select("tx_id", "container_id"), "tx_id")
        .join(broadcast(containers.select("container_id")),
              "container_id", "left_semi")
        .select("tx_id").distinct()
    )
    tx_page = (
        tx_ids.orderBy("tx_id").limit(max_records + 1)
        .withColumn("_rn", F.row_number().over(
            Window.partitionBy(_bwk("tx_id")).orderBy("tx_id")))
        .withColumn("is_truncated",
                    F.count("*").over(Window.partitionBy(_bwk("tx_id")))
                    > max_records)
        .where(F.col("_rn") <= max_records)
        .drop("_rn")
    )
    return (
        loc.join(broadcast(tx_page), "tx_id")
        .join(broadcast(containers.select("container_id", "state")),
              "container_id")
        .groupBy("state", "container_id", "tx_id", "is_truncated")
        .agg(F.count("*").alias("local_id_count"),
             F.concat_ws(",", F.array_sort(
                 F.collect_list(F.col("local_id").cast("string"))))
             .alias("local_ids"))
        .select(F.col("state").alias("container_state"), "container_id",
                "tx_id", "local_id_count", "local_ids", "is_truncated")
        .orderBy("tx_id", "container_id")
    )


def key_insight_summary(open_keys: DataFrame, multipart_uploads: DataFrame,
                        deleted_keys: DataFrame) -> DataFrame:
    """/keys/open/summary + /open/mpu/summary + /deletePending/summary
    analogs (OMDBInsightEndpoint.java:322,349,374 — each returns
    {total keys, totalReplicatedDataSize, totalUnreplicatedDataSize}):
    one row per insight category, all three single-pass global
    aggregates unioned (map-side partials, three tiny shuffles of one
    row each).  Deleted keys count RepeatedOmKeyInfo versions, like the
    reference's repeated-key list."""
    open_sum = open_keys.agg(
        F.lit("OPEN_KEYS").alias("category"),
        F.count("*").alias("total_keys"),
        F.coalesce(F.sum("data_size"), F.lit(0)).alias("unreplicated_bytes"),
        F.coalesce(F.sum("replicated_size"), F.lit(0))
        .alias("replicated_bytes"))
    mpu_bytes = F.col("part_bytes") * F.col("n_parts")
    mpu_sum = multipart_uploads.agg(
        F.lit("OPEN_MPU_KEYS").alias("category"),
        F.count("*").alias("total_keys"),
        F.coalesce(F.sum(mpu_bytes), F.lit(0)).alias("unreplicated_bytes"),
        F.coalesce(F.sum(mpu_bytes * F.col("repl_factor")), F.lit(0))
        .alias("replicated_bytes"))
    del_sum = deleted_keys.agg(
        F.lit("DELETED_KEYS").alias("category"),
        F.coalesce(F.sum("num_versions"), F.lit(0)).alias("total_keys"),
        F.coalesce(F.sum("pending_bytes"), F.lit(0))
        .alias("unreplicated_bytes"),
        F.coalesce(F.sum("pending_replicated_bytes"), F.lit(0))
        .alias("replicated_bytes"))
    return (
        open_sum.unionByName(mpu_sum).unionByName(del_sum)
        .orderBy("category")
    )


def storage_distribution(datanodes: DataFrame, containers: DataFrame,
                         replicas: DataFrame, keys: DataFrame,
                         open_keys: DataFrame,
                         deleted_keys: DataFrame) -> DataFrame:
    """/storageDistribution analog (StorageDistributionEndpoint.java:
    105-142): per-datanode capacity/used/remaining storage report plus
    the cluster-global row carrying the namespace metrics the endpoint
    folds in (total keys, finalized bytes, open-key bytes, pending
    delete bytes).  Per-node usage = sum of hosted replicas' container
    used_bytes; the CLUSTER row aggregates nodes and carries the
    namespace scalars (NULL on node rows — mixed-grain union like the
    endpoint's response object)."""
    used = (
        replicas.join(broadcast(
            containers.select("container_id", "used_bytes")), "container_id")
        .groupBy("datanode")
        .agg(F.sum("used_bytes").alias("used"))
    )
    nodes = (
        datanodes.join(used, "datanode", "left")
        .select("datanode", "capacity",
                F.coalesce("used", F.lit(0)).alias("used_bytes"),
                (F.col("capacity") - F.coalesce("used", F.lit(0)))
                .alias("remaining_bytes"),
                F.lit(None).cast("long").alias("total_keys"),
                F.lit(None).cast("long").alias("finalized_key_bytes"),
                F.lit(None).cast("long").alias("open_key_bytes"),
                F.lit(None).cast("long").alias("pending_delete_bytes"))
    )
    totals = (
        nodes.agg(F.sum("capacity").alias("capacity"),
                  F.sum("used_bytes").alias("used_bytes"),
                  F.sum("remaining_bytes").alias("remaining_bytes"))
        .crossJoin(broadcast(keys.agg(
            F.count("*").alias("total_keys"),
            F.sum("data_size").alias("finalized_key_bytes"))))
        .crossJoin(broadcast(open_keys.agg(
            F.sum("data_size").alias("open_key_bytes"))))
        .crossJoin(broadcast(deleted_keys.agg(
            F.sum("pending_bytes").alias("pending_delete_bytes"))))
        .select(F.lit("CLUSTER").alias("datanode"), "capacity",
                "used_bytes", "remaining_bytes", "total_keys",
                "finalized_key_bytes", "open_key_bytes",
                "pending_delete_bytes")
    )
    return nodes.unionByName(totals).orderBy("datanode")


def cluster_growth_daily(keys: DataFrame) -> DataFrame:
    """CLUSTER_GROWTH_DAILY analog (UtilizationSchemaDefinition.java:
    75-83 — the one time-bucketed Recon table): per-day namespace
    growth from key creation times, with running totals.  The daily
    pre-aggregation shuffles on day (bounded cardinality: one row per
    day); the running-sum window then orders the few thousand daily
    rows in a single partition — bounded by calendar days, not keys,
    so the single-partition window is safe at any data scale."""
    day_idx = F.expr("creation_time div 86400000")
    daily = (
        keys.groupBy(day_idx.alias("day_idx"))
        .agg(F.count("*").alias("new_keys"),
             F.sum("data_size").alias("new_bytes"))
    )
    w = (Window.partitionBy(_bwk("day_idx")).orderBy("day_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return daily.select(
        (F.col("day_idx") * 86400000).alias("day_ms"),
        "new_keys", "new_bytes",
        F.sum("new_keys").over(w).alias("total_keys"),
        F.sum("new_bytes").over(w).alias("total_bytes"),
    ).orderBy("day_ms")


def size_percentiles(keys: DataFrame) -> DataFrame:
    """Per-volume key-size percentiles (p50/p90/p99) plus min/max — the
    distributional counterpart of the log2 histogram (A1): Recon's bins
    show shape, these show exact cut points for quota/SLO planning.

    Uses EXACT percentile (not percentile_approx): approx sketches are
    engine-specific and non-portable, while exact linear-interpolation
    percentiles are a pure function of the sorted values, replayed
    bit-identically by DuckDB's quantile_cont.  Exact percentile sorts
    within each group — fine when groups are volumes (bounded
    cardinality, each fits a task); for per-cluster percentiles over
    10^10 keys you'd bucket by the A1 histogram first and interpolate
    inside one bin."""
    pct = F.percentile(F.col("data_size"), F.array(
        F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        keys.groupBy("volume")
        .agg(F.count("*").alias("n_keys"),
             F.min("data_size").alias("min_size"),
             pct.alias("p"),
             F.max("data_size").alias("max_size"))
        .select("volume", "n_keys", "min_size",
                F.round(F.col("p")[0], 4).alias("p50"),
                F.round(F.col("p")[1], 4).alias("p90"),
                F.round(F.col("p")[2], 4).alias("p99"),
                "max_size")
        .orderBy("volume")
    )
