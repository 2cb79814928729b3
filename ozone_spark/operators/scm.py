"""SCM admin-plane operators: pipeline listing, safemode exit rules,
datanode decommission planning.

Reference semantics:
  - `ozone admin pipeline list` serves per-pipeline state/replication/
    members (hadoop-hdds/server-scm .../pipeline/PipelineManagerImpl.java;
    CLI ListPipelinesSubcommand).
  - Safemode exit rules (hadoop-hdds/server-scm .../safemode/):
    DataNodeSafeModeRule (registered datanodes >= hdds.scm.safemode
    .min.datanode, default 3 — HddsConfigKeys.java:87),
    RatisContainerSafeModeRule (fraction of closed Ratis containers with
    at least one reported replica >= 0.99 —
    HDDS_SCM_SAFEMODE_THRESHOLD_PCT_DEFAULT, HddsConfigKeys.java:105),
    HealthyPipelineSafeModeRule (open pipeline fraction >= 0.10 —
    HddsConfigKeys.java:112), OneReplicaPipelineSafeModeRule (fraction
    of THREE-factor pipelines with >= 1 registered member, default 0.90).
  - Decommissioning (hadoop-hdds/server-scm .../node/
    DatanodeAdminMonitorImpl.java): a node may leave only when every
    container it holds stays sufficiently replicated; the monitor counts
    healthy replicas elsewhere and queues re-replication work.

All three are joins/aggregations over the SCM-shaped views — no state,
no collect(); the per-container candidate ranking in the decommission
plan joins against the (small, broadcastable) datanode registry only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast


def list_pipelines(pipelines: DataFrame) -> DataFrame:
    """Per-pipeline summary: state, replication, member count, sorted
    member list (the `ozone admin pipeline list` row).  `members` is a
    comma-joined string, not an array: the render shape the CLI prints,
    and a scalar cell the driver's canonicalizer can sort."""
    return (
        pipelines.groupBy("pipeline_id", "state", "replication")
        .agg(F.count("*").alias("member_count"),
             F.concat_ws(",", F.array_sort(F.collect_list("datanode")))
             .alias("members"))
        .orderBy("pipeline_id")
    )


def node_status(datanodes: DataFrame, replicas: DataFrame,
                pipelines: DataFrame, now_ms: int) -> DataFrame:
    """NodeEndpoint /nodes analog (`ozone admin datanode list`;
    NodeStateManager health states): per node its HEALTHY/STALE/DEAD
    state, heartbeat age, hosted replica count, and pipeline
    membership count.  The per-node counts are partial-aggregated
    before the broadcast joins — the registry side is always tiny."""
    reps = replicas.groupBy("datanode").agg(
        F.count("*").alias("n_replicas"))
    pipes = (
        pipelines.select("pipeline_id", "datanode").distinct()
        .groupBy("datanode").agg(F.count("*").alias("n_pipelines"))
    )
    return (
        datanodes.join(reps, "datanode", "left")
        .join(pipes, "datanode", "left")
        .select("datanode", "state", "rack", "capacity",
                (F.lit(now_ms) - F.col("last_heartbeat_ms"))
                .alias("heartbeat_age_ms"),
                F.coalesce("n_replicas", F.lit(0).cast("long"))
                .alias("n_replicas"),
                F.coalesce("n_pipelines", F.lit(0).cast("long"))
                .alias("n_pipelines"))
        .orderBy("datanode")
    )


def safemode_status(containers: DataFrame, replicas: DataFrame,
                    datanodes: DataFrame, pipelines: DataFrame) -> DataFrame:
    """One row per safemode exit rule: measured metric, threshold,
    satisfied verdict — the SCMSafeModeManager rule sweep."""
    dn_count = datanodes.agg(
        F.count("*").cast("double").alias("metric")).select(
        F.lit("DATANODE").alias("rule"), "metric",
        F.lit(3.0).alias("threshold"))

    closed = containers.where(F.col("state") == "CLOSED")
    with_replica = closed.join(
        replicas.select("container_id").distinct(), "container_id", "semi")
    container_rule = (
        closed.agg(F.count("*").alias("total"))
        .crossJoin(with_replica.agg(F.count("*").alias("reported")))
        .select(F.lit("RATIS_CONTAINER").alias("rule"),
                F.round(F.col("reported") / F.col("total"), 6).alias("metric"),
                F.lit(0.99).alias("threshold"))
    )

    # the reference HealthyPipelineSafeModeRule counts only Ratis
    # factor-THREE pipelines (getPipelines(RatisReplicationConfig THREE))
    per_pipe = (
        pipelines.where(F.col("replication") == "THREE")
        .select("pipeline_id", "state").distinct()
    )
    healthy = (
        per_pipe.agg(
            F.count("*").alias("total"),
            F.sum(F.when(F.col("state") == "OPEN", 1).otherwise(0))
            .alias("open_n"))
        .select(F.lit("HEALTHY_PIPELINE").alias("rule"),
                F.round(F.col("open_n") / F.col("total"), 6).alias("metric"),
                F.lit(0.10).alias("threshold"))
    )

    three = pipelines.where(F.col("replication") == "THREE")
    three_reported = (
        three.join(broadcast(datanodes.select("datanode")), "datanode", "semi")
        .select("pipeline_id").distinct()
    )
    one_replica = (
        three.select("pipeline_id").distinct().agg(F.count("*").alias("total"))
        .crossJoin(three_reported.agg(F.count("*").alias("reported")))
        .select(F.lit("ONE_REPLICA_PIPELINE").alias("rule"),
                F.round(F.col("reported") / F.col("total"), 6).alias("metric"),
                F.lit(0.90).alias("threshold"))
    )

    return (
        dn_count.unionByName(container_rule).unionByName(healthy)
        .unionByName(one_replica)
        .withColumn("satisfied", F.col("metric") >= F.col("threshold"))
        .orderBy("rule")
    )


def decommission_plan(containers: DataFrame, replicas: DataFrame,
                      datanodes: DataFrame, node: str) -> DataFrame:
    """Re-replication work plan for decommissioning `node`: every
    non-deleted container holding a replica there, how many healthy
    replicas live elsewhere, whether a new copy is needed, and the
    deterministic target (least-loaded registered datanode not already
    holding one; ties broken by name)."""
    on_node = (
        replicas.where(F.col("datanode") == node)
        .select("container_id").distinct()
        .join(broadcast(containers.where(~F.col("state").isin(
            "DELETED", "DELETING"))
            .select("container_id", "state", "expected_replicas")),
            "container_id")
    )
    healthy_elsewhere = (
        replicas.where((F.col("datanode") != node) & (F.col("checksum") == "ok"))
        .groupBy("container_id")
        .agg(F.count("*").alias("healthy_others"))
    )
    need = (
        on_node.join(healthy_elsewhere, "container_id", "left")
        .na.fill({"healthy_others": 0})
        .withColumn("needs_copy",
                    F.col("healthy_others") < F.col("expected_replicas"))
    )
    # per-datanode load (same definition as datanode_utilization)
    load = (
        replicas.join(broadcast(containers.select("container_id", "used_bytes")),
                      "container_id")
        .groupBy("datanode").agg(F.sum("used_bytes").alias("used"))
    )
    candidates = (
        # only HEALTHY in-service nodes receive new copies
        # (DatanodeAdminMonitorImpl target selection)
        datanodes.where((F.col("datanode") != node)
                        & (F.col("state") == "HEALTHY"))
        .join(load, "datanode", "left").na.fill({"used": 0})
        .select("datanode", "used")
    )
    holders = replicas.select(F.col("container_id").alias("h_cid"),
                              F.col("datanode").alias("holder"))
    ranked = (
        need.where(F.col("needs_copy")).select("container_id")
        .crossJoin(broadcast(candidates))
        .join(holders,
              (F.col("container_id") == F.col("h_cid"))
              & (F.col("datanode") == F.col("holder")), "left_anti")
        .withColumn("rk", F.row_number().over(
            Window.partitionBy("container_id").orderBy("used", "datanode")))
        .where(F.col("rk") == 1)
        .select("container_id", F.col("datanode").alias("target"))
    )
    return (
        need.join(ranked, "container_id", "left")
        .select("container_id", "state", "healthy_others", "needs_copy",
                "target")
        .orderBy("container_id")
    )
