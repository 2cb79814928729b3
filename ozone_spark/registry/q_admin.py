"""OM/SCM admin surface — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace


# ---------------------------------------------------------------------------
# admin listings / conditional writes / balancer (S3, S5, P9, J10, O6, E3)
# ---------------------------------------------------------------------------

ADMIN_QUERIES = [
    _q(
        "list_volumes",
        lambda spark, sf: admin.list_volumes(views(spark, sf)["keys"]),
        with_views(
            """SELECT volume, CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets,
  count(*) AS n_keys, CAST(sum(data_size) AS BIGINT) AS used_bytes
FROM keys GROUP BY 1 ORDER BY 1""",
            ["keys"],
        ),
    ),
    _q(
        "list_snapshots",
        lambda spark, sf: admin.list_snapshots(
            views(spark, sf)["snap1"], views(spark, sf)["snap2"]),
        with_views(
            """SELECT snapshot_id, previous_snapshot_id, key_count, total_bytes FROM (
  SELECT 'snap-1' AS snapshot_id, CAST(NULL AS VARCHAR) AS previous_snapshot_id,
         (SELECT count(*) FROM snap1) AS key_count,
         (SELECT CAST(sum(data_size) AS BIGINT) FROM snap1) AS total_bytes
  UNION ALL
  SELECT 'snap-2', 'snap-1', (SELECT count(*) FROM snap2),
         (SELECT CAST(sum(data_size) AS BIGINT) FROM snap2)
) ORDER BY snapshot_id""",
            ["snap1", "snap2"],
        ),
    ),
    _q(
        "conditional_rewrite",
        lambda spark, sf: admin.conditional_rewrite(
            views(spark, sf)["keys"], "/vol2/b1/", 3),
        with_views(
            """SELECT db_key, CAST(object_id % 5 AS INT) AS current_generation,
  object_id % 5 = 3 AS applied
FROM keys WHERE db_key LIKE '/vol2/b1/%' ORDER BY db_key""",
            ["keys"],
        ),
    ),
    _q(
        "replica_bcsid_lag",
        lambda spark, sf: admin.replica_bcsid_lag(views(spark, sf)["replicas"]),
        with_views(
            """SELECT container_id, datanode, replica_idx, bcsid, max_bcsid FROM (
  SELECT *, max(bcsid) OVER (PARTITION BY container_id) AS max_bcsid
  FROM replicas)
WHERE bcsid < max_bcsid ORDER BY container_id, datanode""",
            ["replicas"],
        ),
    ),
    _q(
        "balancer_move_candidates",
        lambda spark, sf: admin.balancer_move_candidates(
            views(spark, sf)["containers"], views(spark, sf)["replicas"],
            views(spark, sf)["datanodes"]),
        with_views(
            """WITH used AS (
  SELECT datanode, CAST(sum(used_bytes) AS BIGINT) AS used
  FROM replicas JOIN containers USING (container_id) GROUP BY 1
), j AS (
  SELECT d.datanode, COALESCE(used, 0) AS used, d.capacity
  FROM datanodes d LEFT JOIN used USING (datanode)
), u AS (
  SELECT datanode, round(used / capacity, 6) AS utilization,
         used / capacity AS raw_util,
         round(sum(used) OVER () / sum(capacity) OVER (), 6) AS cluster_avg,
         sum(used) OVER () / sum(capacity) OVER () AS raw_avg
  FROM j
)
SELECT source, target, src_util, tgt_util, move_priority FROM (
  SELECT o.datanode AS source, t.datanode AS target,
         o.utilization AS src_util, t.utilization AS tgt_util,
         round((o.utilization - o.cluster_avg)
               + (o.cluster_avg - t.utilization), 6) AS move_priority
  FROM (SELECT * FROM u WHERE raw_util > raw_avg + 0.1) o,
       (SELECT * FROM u WHERE raw_util < raw_avg - 0.1) t
) ORDER BY move_priority DESC, source, target LIMIT 10""",
            ["containers", "replicas", "datanodes"],
        ),
    ),
    _q(
        "snapshot_move_deleted_keys",
        lambda spark, sf: admin.snapshot_move_deleted_keys(
            views(spark, sf)["deleted_keys"], views(spark, sf)["snap1"]),
        with_views(
            """SELECT object_id, min(db_key) AS db_key,
  CAST(max(num_versions) AS BIGINT) AS num_versions,
  CAST(max(pending_bytes) AS BIGINT) AS pending_bytes
FROM (
  SELECT object_id, db_key, num_versions, pending_bytes FROM deleted_keys
  UNION ALL
  SELECT object_id,
         '/' || volume || '/' || bucket || '/' || key_name,
         CAST(1 AS BIGINT), data_size
  FROM snap1 WHERE object_id % 3 = 0
) GROUP BY object_id ORDER BY object_id""",
            ["deleted_keys", "snap1"],
        ),
    ),
    _q(
        "tenant_access_report",
        lambda spark, sf: admin.tenant_access_report(
            views(spark, sf)["tenant_access"]),
        with_views(
            """WITH per_principal AS (
  SELECT tenant_id, principal, count(*) AS n_ids,
         sum(CASE WHEN is_admin THEN 1 ELSE 0 END) AS n_admin
  FROM tenant_access GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY tenant_id
            ORDER BY n_ids DESC, principal ASC) AS rn
  FROM per_principal
)
SELECT tenant_id,
  CAST(sum(n_ids) AS BIGINT) AS n_access_ids,
  count(*) AS n_principals,
  CAST(sum(n_admin) AS BIGINT) AS n_admins,
  max(CASE WHEN rn = 1 THEN principal END) AS top_principal
FROM ranked GROUP BY 1 ORDER BY 1""",
            ["tenant_access"],
        ),
    ),
]
