"""Recon insights / histograms — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace


# ---------------------------------------------------------------------------
# insights / aggregations (A1-A3, A6, A7, A10, A11)
# ---------------------------------------------------------------------------

_FILE_BIN = bin_sql("data_size", 10, 40)
_CONT_BIN = bin_sql("used_bytes", 29, 14)

INSIGHT_QUERIES = [
    _q(
        "file_size_histogram",
        lambda spark, sf: insights.file_size_histogram(views(spark, sf)["keys"]),
        with_views(
            f"""SELECT volume, bucket, bin_index, count(*) AS file_count,
  CAST(pow(2.0, CAST(10 + bin_index AS DOUBLE)) AS BIGINT) AS bin_upper_bytes
FROM (SELECT volume, bucket, {_FILE_BIN} AS bin_index FROM keys)
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
            ["keys"],
        ),
        bench=True,
    ),
    _q(
        "size_percentiles",
        lambda spark, sf: insights.size_percentiles(views(spark, sf)["keys"]),
        with_views(
            """SELECT volume, CAST(count(*) AS BIGINT) AS n_keys,
  min(data_size) AS min_size,
  round(quantile_cont(data_size, 0.5), 4) AS p50,
  round(quantile_cont(data_size, 0.9), 4) AS p90,
  round(quantile_cont(data_size, 0.99), 4) AS p99,
  max(data_size) AS max_size
FROM keys GROUP BY 1 ORDER BY 1""",
            ["keys"],
        ),
    ),
    _q(
        "container_size_histogram",
        lambda spark, sf: insights.container_size_histogram(
            views(spark, sf)["containers"]),
        with_views(
            f"""SELECT bin_index, count(*) AS container_count,
  CAST(pow(2.0, CAST(29 + bin_index AS DOUBLE)) AS BIGINT) AS bin_upper_bytes
FROM (SELECT {_CONT_BIN} AS bin_index FROM containers)
GROUP BY 1 ORDER BY 1""",
            ["containers"],
        ),
    ),
    _q(
        "global_stats",
        lambda spark, sf: insights.global_stats(
            views(spark, sf)["keys"], views(spark, sf)["open_keys"],
            views(spark, sf)["deleted_keys"]),
        with_views(
            """SELECT 'keys' AS table_name, count(*) AS row_count,
  CAST(sum(data_size) AS BIGINT) AS total_bytes,
  CAST(sum(replicated_size) AS BIGINT) AS total_replicated_bytes FROM keys
UNION ALL SELECT 'open_keys', count(*), CAST(sum(data_size) AS BIGINT),
  CAST(NULL AS BIGINT) FROM open_keys
UNION ALL SELECT 'deleted_keys', count(*), CAST(sum(pending_bytes) AS BIGINT),
  CAST(sum(pending_replicated_bytes) AS BIGINT) FROM deleted_keys
ORDER BY table_name""",
            ["keys", "open_keys", "deleted_keys"],
        ),
    ),
    _q(
        "cluster_state",
        lambda spark, sf: insights.cluster_state(
            views(spark, sf)["keys"], views(spark, sf)["containers"],
            views(spark, sf)["datanodes"]),
        with_views(
            """SELECT * FROM
  (SELECT CAST(count(DISTINCT volume) AS BIGINT) AS num_volumes,
          CAST(count(DISTINCT (volume, bucket)) AS BIGINT) AS num_buckets,
          count(*) AS num_keys,
          CAST(sum(data_size) AS BIGINT) AS total_used_bytes FROM keys),
  (SELECT count(*) AS num_containers FROM containers WHERE state <> 'DELETED'),
  (SELECT count(*) AS num_datanodes FROM datanodes)""",
            ["keys", "containers", "datanodes"],
        ),
    ),
    _q(
        "datanode_utilization",
        lambda spark, sf: insights.datanode_utilization(
            views(spark, sf)["containers"], views(spark, sf)["replicas"],
            views(spark, sf)["datanodes"]),
        with_views(
            """WITH used AS (
  SELECT datanode, count(*) AS replica_count,
         CAST(sum(used_bytes) AS BIGINT) AS used
  FROM replicas JOIN containers USING (container_id) GROUP BY 1
), j AS (
  SELECT d.datanode, COALESCE(replica_count, 0) AS replica_count,
         COALESCE(used, 0) AS used, d.capacity
  FROM datanodes d LEFT JOIN used USING (datanode)
)
SELECT datanode, replica_count, used, capacity,
  round(used / capacity, 6) AS utilization,
  round(sum(used) OVER () / sum(capacity) OVER (), 6) AS cluster_avg,
  CASE WHEN used / capacity > sum(used) OVER () / sum(capacity) OVER () + 0.1
         THEN 'OVER_UTILIZED'
       WHEN used / capacity < sum(used) OVER () / sum(capacity) OVER () - 0.1
         THEN 'UNDER_UTILIZED'
       ELSE 'OK' END AS balance_state
FROM j ORDER BY datanode""",
            ["containers", "replicas", "datanodes"],
        ),
    ),
    _q(
        "heatmap",
        lambda spark, sf: insights.heatmap(
            views(spark, sf)["events"], views(spark, sf)["keys"]),
        with_views(
            """WITH access AS (
  SELECT (user_id * 7 + event_id) % 6000 AS object_id, count(*) AS hits
  FROM events GROUP BY 1
), pb AS (
  SELECT volume, bucket, CAST(sum(hits) AS BIGINT) AS access_count
  FROM keys JOIN access USING (object_id) GROUP BY 1, 2
)
SELECT volume, bucket, access_count,
  round(CASE WHEN mx = mn THEN 1.0
        ELSE (access_count - mn) / (mx - mn) END, 6) AS heat
FROM (SELECT *, min(access_count) OVER () AS mn,
             max(access_count) OVER () AS mx FROM pb)
ORDER BY volume, bucket""",
            ["keys"],
        ),
    ),
    _q(
        "pending_deletion_by_datanode",
        lambda spark, sf: insights.pending_deletion_by_datanode(
            views(spark, sf)["deleted_keys"], views(spark, sf)["locations"],
            views(spark, sf)["replicas"]),
        with_views(
            """SELECT datanode,
  CAST(sum(block_len * num_versions) AS BIGINT) AS pending_bytes,
  count(*) AS pending_blocks
FROM deleted_keys JOIN locations USING (object_id)
JOIN replicas USING (container_id)
GROUP BY 1 ORDER BY 1""",
            ["deleted_keys", "locations", "replicas"],
        ),
    ),
    _q(
        "blocks_pending_deletion",
        lambda spark, sf: insights.blocks_pending_deletion(
            views(spark, sf)["deleted_keys"], views(spark, sf)["locations"],
            views(spark, sf)["containers"], prev_txid=0, max_records=30),
        with_views(
            """WITH t AS (
  SELECT d.object_id AS tx_id, l.container_id, l.local_id, c.state
  FROM deleted_keys d
  JOIN locations l ON l.object_id = d.object_id
  JOIN containers c ON c.container_id = l.container_id
  WHERE d.object_id > 0
), g AS (
  SELECT state AS container_state, container_id, tx_id,
    count(*) AS local_id_count,
    string_agg(CAST(local_id AS VARCHAR), ','
               ORDER BY CAST(local_id AS VARCHAR)) AS local_ids
  FROM t GROUP BY 1, 2, 3
), tx AS (
  SELECT DISTINCT tx_id FROM g ORDER BY tx_id LIMIT 31
), tp AS (
  SELECT tx_id, row_number() OVER (ORDER BY tx_id) AS rn,
    (SELECT count(*) FROM tx) > 30 AS is_truncated
  FROM tx
)
SELECT g.container_state, g.container_id, g.tx_id, g.local_id_count,
  g.local_ids, tp.is_truncated
FROM g JOIN tp ON g.tx_id = tp.tx_id AND tp.rn <= 30
ORDER BY g.tx_id, g.container_id""",
            ["deleted_keys", "locations", "containers"],
        ),
    ),
    _q(
        "key_insight_summary",
        lambda spark, sf: insights.key_insight_summary(
            views(spark, sf)["open_keys"], views(spark, sf)["multipart_uploads"],
            views(spark, sf)["deleted_keys"]),
        with_views(
            """SELECT * FROM (
  SELECT 'OPEN_KEYS' AS category, count(*) AS total_keys,
    CAST(coalesce(sum(data_size), 0) AS BIGINT) AS unreplicated_bytes,
    CAST(coalesce(sum(replicated_size), 0) AS BIGINT) AS replicated_bytes
  FROM open_keys
  UNION ALL
  SELECT 'OPEN_MPU_KEYS', count(*),
    CAST(coalesce(sum(part_bytes * n_parts), 0) AS BIGINT),
    CAST(coalesce(sum(part_bytes * n_parts * repl_factor), 0) AS BIGINT)
  FROM multipart_uploads
  UNION ALL
  SELECT 'DELETED_KEYS', CAST(coalesce(sum(num_versions), 0) AS BIGINT),
    CAST(coalesce(sum(pending_bytes), 0) AS BIGINT),
    CAST(coalesce(sum(pending_replicated_bytes), 0) AS BIGINT)
  FROM deleted_keys
) ORDER BY category""",
            ["open_keys", "multipart_uploads", "deleted_keys"],
        ),
    ),
    _q(
        "storage_distribution",
        lambda spark, sf: insights.storage_distribution(
            views(spark, sf)["datanodes"], views(spark, sf)["containers"],
            views(spark, sf)["replicas"], views(spark, sf)["keys"],
            views(spark, sf)["open_keys"], views(spark, sf)["deleted_keys"]),
        with_views(
            """WITH used AS (
  SELECT r.datanode, CAST(sum(c.used_bytes) AS BIGINT) AS used
  FROM replicas r JOIN containers c USING (container_id) GROUP BY 1
), nodes AS (
  SELECT d.datanode, d.capacity,
    coalesce(u.used, 0) AS used_bytes,
    d.capacity - coalesce(u.used, 0) AS remaining_bytes,
    CAST(NULL AS BIGINT) AS total_keys,
    CAST(NULL AS BIGINT) AS finalized_key_bytes,
    CAST(NULL AS BIGINT) AS open_key_bytes,
    CAST(NULL AS BIGINT) AS pending_delete_bytes
  FROM datanodes d LEFT JOIN used u USING (datanode)
)
SELECT * FROM nodes
UNION ALL
SELECT 'CLUSTER',
  (SELECT CAST(sum(capacity) AS BIGINT) FROM nodes),
  (SELECT CAST(sum(used_bytes) AS BIGINT) FROM nodes),
  (SELECT CAST(sum(remaining_bytes) AS BIGINT) FROM nodes),
  (SELECT count(*) FROM keys),
  (SELECT CAST(sum(data_size) AS BIGINT) FROM keys),
  (SELECT CAST(sum(data_size) AS BIGINT) FROM open_keys),
  (SELECT CAST(sum(pending_bytes) AS BIGINT) FROM deleted_keys)
ORDER BY datanode""",
            ["datanodes", "containers", "replicas", "keys", "open_keys",
             "deleted_keys"],
        ),
    ),
]
