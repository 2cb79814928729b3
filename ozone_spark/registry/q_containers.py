"""Container health and key mismatch joins — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace


# ---------------------------------------------------------------------------
# container plane (S9, J3-J6, A8, B8)
# ---------------------------------------------------------------------------

_CONTAINER_HEALTH_SQL = """WITH census AS (
  SELECT container_id, count(*) AS actual, count(DISTINCT checksum) AS ncs
  FROM replicas GROUP BY 1
), j AS (
  SELECT c.container_id, c.used_bytes, c.expected_replicas,
         COALESCE(census.actual, 0) AS actual, COALESCE(census.ncs, 0) AS ncs
  FROM containers c LEFT JOIN census USING (container_id)
  WHERE c.state NOT IN ('DELETED', 'DELETING')
)
SELECT container_id, health_state,
       CAST(actual AS BIGINT) AS actual_replicas, expected_replicas
FROM (
  SELECT container_id, used_bytes, expected_replicas, actual,
         'MISSING' AS health_state FROM j WHERE actual = 0 AND used_bytes > 0
  UNION ALL SELECT container_id, used_bytes, expected_replicas, actual,
         'EMPTY_MISSING' FROM j WHERE actual = 0 AND used_bytes = 0
  UNION ALL SELECT container_id, used_bytes, expected_replicas, actual,
         'UNDER_REPLICATED' FROM j WHERE actual > 0 AND actual < expected_replicas
  UNION ALL SELECT container_id, used_bytes, expected_replicas, actual,
         'OVER_REPLICATED' FROM j WHERE actual > expected_replicas
  UNION ALL SELECT container_id, used_bytes, expected_replicas, actual,
         'REPLICA_MISMATCH' FROM j WHERE ncs > 1
) ORDER BY container_id, health_state"""


def _audit(spark: SparkSession, sf: str, which: str) -> DataFrame:
    """parse(render(events)) -> one auditparser template query; the
    DuckDB oracle computes the same aggregate from first principles on
    `events`, gating the whole render -> parse -> aggregate loop."""
    from ozone_spark.sources import auditlog

    audit = auditlog.parse_audit_log(
        auditlog.render_audit_lines(views(spark, sf)["events"]))
    return getattr(auditlog, which)(audit)


def _export_unhealthy_containers(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """S11 gated: the async unhealthy-containers CSV export job
    (ContainerEndpoint.java:543-608) — classify, write a header CSV,
    and return the rows READ BACK from the written file, so the oracle
    verifies the sink round-trip rather than just the plan."""
    import tempfile

    from ozone_spark.sources import sinks

    t = views(spark, sf_dir)
    unhealthy = cops.container_health(t["containers"], t["replicas"])
    path = tempfile.mkdtemp(prefix="ozs_export_") + "/unhealthy"
    sinks.export_csv(unhealthy, path)
    schema = ("container_id bigint, health_state string, "
              "actual_replicas bigint, expected_replicas int")
    return (spark.read.option("header", True).schema(schema).csv(path)
            .orderBy("container_id", "health_state"))


CONTAINER_QUERIES = [
    _q(
        "container_key_index",
        lambda spark, sf: cops.container_key_index(views(spark, sf)["locations"]),
        with_views(
            """SELECT container_id, CAST(count(DISTINCT object_id) AS BIGINT) AS key_count,
  count(*) AS block_count, CAST(sum(block_len) AS BIGINT) AS total_bytes
FROM locations GROUP BY 1""",
            ["locations"],
        ),
        bench=True,
    ),
    _q(
        "keys_for_container",
        lambda spark, sf: cops.keys_for_container(
            views(spark, sf)["locations"], views(spark, sf)["keys"], 7),
        with_views(
            """SELECT k.db_key, k.object_id, k.data_size, r.block_count, r.bytes
FROM keys k JOIN (
  SELECT object_id, count(*) AS block_count, CAST(sum(block_len) AS BIGINT) AS bytes
  FROM locations WHERE container_id = 7 GROUP BY 1) r USING (object_id)
ORDER BY db_key""",
            ["keys", "locations"],
        ),
    ),
    _q(
        "container_mismatch_om_only",
        lambda spark, sf: cops.om_containers_missing_in_scm(
            views(spark, sf)["locations"], views(spark, sf)["containers"]),
        with_views(
            """SELECT container_id FROM (SELECT DISTINCT container_id FROM locations)
WHERE container_id NOT IN (SELECT container_id FROM containers)
ORDER BY container_id""",
            ["locations", "containers"],
        ),
    ),
    _q(
        "container_mismatch_scm_only",
        lambda spark, sf: cops.scm_containers_without_keys(
            views(spark, sf)["locations"], views(spark, sf)["containers"]),
        with_views(
            """SELECT container_id, state FROM containers
WHERE state <> 'DELETED'
  AND container_id NOT IN (SELECT DISTINCT container_id FROM locations)
ORDER BY container_id""",
            ["locations", "containers"],
        ),
    ),
    _q(
        "om_keys_in_deleted_containers",
        lambda spark, sf: cops.om_keys_in_deleted_containers(
            views(spark, sf)["locations"], views(spark, sf)["containers"],
            views(spark, sf)["keys"]),
        with_views(
            """SELECT db_key, object_id, data_size FROM keys
WHERE object_id IN (
  SELECT DISTINCT object_id FROM locations WHERE container_id IN (
    SELECT container_id FROM containers WHERE state = 'DELETED'))
ORDER BY db_key""",
            ["keys", "locations", "containers"],
        ),
    ),
    _q(
        "container_health",
        lambda spark, sf: cops.container_health(
            views(spark, sf)["containers"], views(spark, sf)["replicas"]),
        with_views(_CONTAINER_HEALTH_SQL, ["containers", "replicas"]),
    ),
    _q(
        "export_unhealthy_containers",
        lambda spark, sf: _export_unhealthy_containers(spark, sf),
        with_views(_CONTAINER_HEALTH_SQL, ["containers", "replicas"]),
    ),
    _q(
        "audit_top5_users",
        lambda spark, sf: _audit(spark, sf, "top_users"),
        """SELECT 'user' || CAST(user_id AS VARCHAR) AS "user",
  count(*) AS total
FROM events GROUP BY 1 ORDER BY total DESC, "user" LIMIT 5""",
    ),
    _q(
        "audit_top5_cmds",
        lambda spark, sf: _audit(spark, sf, "top_ops"),
        """SELECT upper(event_type) AS op, count(*) AS total
FROM events GROUP BY 1 ORDER BY total DESC, op LIMIT 5""",
    ),
    _q(
        "audit_top5_active_seconds",
        lambda spark, sf: _audit(spark, sf, "top_active_seconds"),
        """SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt,
  count(*) AS thecount
FROM events GROUP BY 1 ORDER BY thecount DESC, dt LIMIT 5""",
    ),
    _q(
        "audit_failed_ops",
        lambda spark, sf: _audit(spark, sf, "failed_ops"),
        # every rendered FAILURE entry carries a 2-line exception
        # continuation, so n_with_exception == n_failed iff the parser
        # folded every continuation into its header entry
        """SELECT upper(event_type) AS op, count(*) AS n_failed,
  count(*) AS n_with_exception
FROM events WHERE event_type = 'error' GROUP BY 1 ORDER BY op""",
    ),
    _q(
        "replica_checksum_scrub",
        lambda spark, sf: cops.replica_checksum_scrub(views(spark, sf)["replicas"]),
        with_views(
            """SELECT container_id,
  CAST(sum(CASE WHEN checksum <> 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS bad_replicas
FROM replicas GROUP BY 1 HAVING count(DISTINCT checksum) > 1
ORDER BY container_id""",
            ["replicas"],
        ),
    ),
    _q(
        "list_containers_closed",
        lambda spark, sf: cops.list_containers(
            views(spark, sf)["containers"], state="CLOSED", limit=10),
        with_views(
            """WITH f AS (SELECT * FROM containers WHERE state = 'CLOSED' AND container_id >= 0)
SELECT p.*, t.total_count FROM
  (SELECT * FROM f ORDER BY container_id LIMIT 10) p,
  (SELECT count(*) AS total_count FROM f) t""",
            ["containers"],
        ),
    ),
]
