"""SCM (containers/pipelines/datanodes admin) — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace


SCM_QUERIES = [
    _q(
        "dtoken_expiry",
        lambda spark, sf: admin.dtoken_expiry(
            views(spark, sf)["delegation_tokens"], NOW_MS),
        with_views(
            f"""SELECT token_id, owner, renewer, renew_till_ms,
  renew_till_ms < {NOW_MS} AS expired
FROM delegation_tokens ORDER BY token_id""",
            ["delegation_tokens"],
        ),
    ),
    _q(
        "list_pipelines",
        lambda spark, sf: scmops.list_pipelines(views(spark, sf)["pipelines"]),
        with_views(
            """SELECT pipeline_id, state, replication,
  CAST(count(*) AS BIGINT) AS member_count,
  array_to_string(list_sort(list(datanode)), ',') AS members
FROM pipelines GROUP BY 1, 2, 3 ORDER BY pipeline_id""",
            ["pipelines"],
        ),
    ),
    _q(
        "node_status",
        lambda spark, sf: scmops.node_status(
            views(spark, sf)["datanodes"], views(spark, sf)["replicas"],
            views(spark, sf)["pipelines"], NOW_MS),
        with_views(
            f"""WITH reps AS (
  SELECT datanode, count(*) AS n_replicas FROM replicas GROUP BY 1
), pipes AS (
  SELECT datanode, count(*) AS n_pipelines FROM (
    SELECT DISTINCT pipeline_id, datanode FROM pipelines
  ) GROUP BY 1
)
SELECT d.datanode, d.state, d.rack, d.capacity,
  CAST({NOW_MS} AS BIGINT) - d.last_heartbeat_ms AS heartbeat_age_ms,
  coalesce(r.n_replicas, 0) AS n_replicas,
  coalesce(p.n_pipelines, 0) AS n_pipelines
FROM datanodes d
LEFT JOIN reps r USING (datanode)
LEFT JOIN pipes p USING (datanode)
ORDER BY d.datanode""",
            ["datanodes", "replicas", "pipelines"],
        ),
    ),
    _q(
        "safemode_status",
        lambda spark, sf: scmops.safemode_status(
            views(spark, sf)["containers"], views(spark, sf)["replicas"],
            views(spark, sf)["datanodes"], views(spark, sf)["pipelines"]),
        with_views(
            """WITH closed AS (SELECT * FROM containers WHERE state = 'CLOSED'),
pp AS (SELECT DISTINCT pipeline_id, state FROM pipelines
       WHERE replication = 'THREE'),
rules AS (
  SELECT 'DATANODE' AS rule,
    CAST((SELECT count(*) FROM datanodes) AS DOUBLE) AS metric,
    CAST(3.0 AS DOUBLE) AS threshold
  UNION ALL
  SELECT 'RATIS_CONTAINER',
    round((SELECT count(*) FROM closed WHERE container_id IN
           (SELECT container_id FROM replicas))
          / (SELECT count(*) FROM closed), 6),
    CAST(0.99 AS DOUBLE)
  UNION ALL
  SELECT 'HEALTHY_PIPELINE',
    round((SELECT count(*) FROM pp WHERE state = 'OPEN')
          / (SELECT count(*) FROM pp), 6),
    CAST(0.10 AS DOUBLE)
  UNION ALL
  SELECT 'ONE_REPLICA_PIPELINE',
    round((SELECT count(DISTINCT pipeline_id) FROM pipelines
           WHERE replication = 'THREE' AND datanode IN
             (SELECT datanode FROM datanodes))
          / (SELECT count(DISTINCT pipeline_id) FROM pipelines
             WHERE replication = 'THREE'), 6),
    CAST(0.90 AS DOUBLE)
)
SELECT rule, metric, threshold, metric >= threshold AS satisfied
FROM rules ORDER BY rule""",
            ["containers", "replicas", "datanodes", "pipelines"],
        ),
    ),
    _q(
        "decommission_plan",
        lambda spark, sf: scmops.decommission_plan(
            views(spark, sf)["containers"], views(spark, sf)["replicas"],
            views(spark, sf)["datanodes"], "dn3"),
        with_views(
            """WITH on_node AS (
  SELECT DISTINCT r.container_id, c.state, c.expected_replicas
  FROM replicas r JOIN containers c USING (container_id)
  WHERE r.datanode = 'dn3' AND c.state NOT IN ('DELETED', 'DELETING')
),
he AS (
  SELECT container_id, count(*) AS healthy_others FROM replicas
  WHERE datanode <> 'dn3' AND checksum = 'ok' GROUP BY 1
),
need AS (
  SELECT o.container_id, o.state,
    CAST(coalesce(h.healthy_others, 0) AS BIGINT) AS healthy_others,
    coalesce(h.healthy_others, 0) < o.expected_replicas AS needs_copy
  FROM on_node o LEFT JOIN he h USING (container_id)
),
lo AS (
  SELECT r.datanode, sum(c.used_bytes) AS used
  FROM replicas r JOIN containers c USING (container_id) GROUP BY 1
),
cand AS (
  SELECT d.datanode, coalesce(l.used, 0) AS used
  FROM datanodes d LEFT JOIN lo l USING (datanode)
  WHERE d.datanode <> 'dn3' AND d.state = 'HEALTHY'
),
ranked AS (
  SELECT container_id, datanode AS target FROM (
    SELECT n.container_id, c.datanode,
      row_number() OVER (PARTITION BY n.container_id
                         ORDER BY c.used, c.datanode) AS rk
    FROM need n, cand c
    WHERE n.needs_copy AND NOT EXISTS (
      SELECT 1 FROM replicas r
      WHERE r.container_id = n.container_id AND r.datanode = c.datanode)
  ) WHERE rk = 1
)
SELECT n.container_id, n.state, n.healthy_others, n.needs_copy, r.target
FROM need n LEFT JOIN ranked r USING (container_id)
ORDER BY n.container_id""",
            ["containers", "replicas", "datanodes"],
        ),
    ),
]
