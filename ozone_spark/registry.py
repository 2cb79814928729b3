"""Query registry: every implemented SURVEY.md §2 operator as a
(spark callable, DuckDB oracle SQL) pair — consumed by __spark_entry__.py
and the driver's correctness gate.

Each callable takes (spark, sf_dir) and returns a DataFrame; the oracle
is the ANSI-SQL twin over the same parquet tables (namespace operators
re-derive the Ozone-shaped views via ozone_spark.oracle CTEs).  Column
names/aliases are identical on both sides — the driver's compare sorts
columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ozone_spark import tables
from ozone_spark.functions import (
    dedup, mining, multimodal, pipeline, similarity, sketch, text)
from ozone_spark.functions.bins import bin_sql
from ozone_spark.operators import (
    admin,
    containers as cops,
    datapath,
    events as eops,
    fso,
    lifecycle as lops,
    listing,
    namespace as nops,
    insights,
    scan as sops,
    snapshot as snops,
    tpch,
)
from ozone_spark.oracle import _CTES as ORACLE_CTES, with_views

NOW_MS = tables.NOW_MS

# view cache keyed by (id(spark), sf_dir) so a test loop doesn't rebuild
_view_cache: dict[tuple[int, str], dict[str, DataFrame]] = {}


def views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    if key not in _view_cache:
        v = tables.namespace_views(spark, sf_dir)
        # the derived namespace views are this engine's base tables —
        # keep the hot ones resident (they are small relative to the
        # raw fact tables; at real scale these are the laid-out parquet
        # tables of ozone_spark.layout instead)
        for name in ("keys", "locations", "containers", "replicas",
                     "datanodes", "directories", "snap1", "snap2",
                     "open_keys", "deleted_keys",
                     "documents", "embeddings", "events"):
            v[name] = v[name].persist()
        _view_cache[key] = v
    return _view_cache[key]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    bench: bool = False  # include in bench.py headline set


def _q(name, fn, oracle=None, bench=False):
    return QuerySpec(name, fn, oracle, bench)


# ---------------------------------------------------------------------------
# listing / scan (S1, S2, S6/J1, S7, S8, P4, O1/O2)
# ---------------------------------------------------------------------------

_PAGE_COLS = "db_key, object_id, data_size, creation_time, owner, is_truncated"


def _oracle_list_keys(where: str, n: int) -> str:
    return with_views(
        f"""SELECT {_PAGE_COLS} FROM (
  SELECT *, row_number() OVER (ORDER BY db_key) AS rn,
         count(*) OVER () > {n} AS is_truncated
  FROM (SELECT db_key, object_id, data_size, creation_time, owner
        FROM keys WHERE {where} ORDER BY db_key LIMIT {n + 1})
) WHERE rn <= {n}""",
        ["keys"],
    )


LIST_START = "/vol1/b1/f/y1997"


def _lov2_oracle(volume: str, bucket: str, prefix: str, n: int = 1000) -> str:
    plen = len(prefix)
    like = f"AND key_name LIKE '{prefix}%'" if prefix else ""
    return with_views(
        f"""WITH classified AS (
  SELECT CASE WHEN instr(rest, '/') > 0 THEN 'COMMON_PREFIX' ELSE 'KEY' END AS entry_type,
         CASE WHEN instr(rest, '/') > 0
              THEN '{prefix}' || split_part(rest, '/', 1) || '/'
              ELSE key_name END AS name,
         CASE WHEN instr(rest, '/') > 0 THEN NULL ELSE data_size END AS data_size
  FROM (SELECT key_name, data_size, substr(key_name, {plen + 1}) AS rest
        FROM keys WHERE volume = '{volume}' AND bucket = '{bucket}' {like})
), entries AS (
  SELECT entry_type, name, CAST(min(data_size) AS BIGINT) AS data_size
  FROM classified GROUP BY 1, 2
)
SELECT entry_type, name, data_size, is_truncated FROM (
  SELECT *, row_number() OVER (ORDER BY name) AS rn,
         count(*) OVER () > {n} AS is_truncated
  FROM (SELECT * FROM entries ORDER BY name LIMIT {n + 1})
) WHERE rn <= {n}""",
        ["keys"],
    )


LISTING_QUERIES = [
    _q(
        "list_keys_page",
        lambda spark, sf: listing.list_keys(views(spark, sf)["keys"],
                                            prefix="/vol1/b1/", max_keys=25),
        _oracle_list_keys("db_key LIKE '/vol1/b1/%'", 25),
    ),
    _q(
        "list_keys_resume",
        lambda spark, sf: listing.list_keys(views(spark, sf)["keys"],
                                            prefix="/vol1/b1/",
                                            start_key=LIST_START, max_keys=25),
        _oracle_list_keys(
            f"db_key LIKE '/vol1/b1/%' AND db_key > '{LIST_START}'", 25),
    ),
    _q(
        "list_buckets",
        lambda spark, sf: listing.list_buckets(views(spark, sf)["keys"]),
        with_views("SELECT DISTINCT volume, bucket FROM keys", ["keys"]),
    ),
    _q(
        "list_objects_v2_root",
        lambda spark, sf: listing.list_objects_v2(
            views(spark, sf)["keys"], "vol1", "b1", prefix="", delimiter="/"),
        _lov2_oracle("vol1", "b1", ""),
        bench=True,
    ),
    _q(
        "list_objects_v2_nested",
        lambda spark, sf: listing.list_objects_v2(
            views(spark, sf)["keys"], "vol1", "b1", prefix="f/y1995/",
            delimiter="/"),
        _lov2_oracle("vol1", "b1", "f/y1995/"),
    ),
    _q(
        "ldb_scan",
        lambda spark, sf: sops.scan(
            views(spark, sf)["keys"], key_col="db_key",
            filters=[("data_size", "GREATER", 10_000_000),
                     ("db_key", "REGEX", "y199[0-9]/order")],
            fields=["db_key", "data_size"], limit=100),
        with_views(
            """SELECT db_key, data_size FROM keys
WHERE data_size > 10000000 AND regexp_matches(db_key, 'y199[0-9]/order')
ORDER BY db_key LIMIT 100""",
            ["keys"],
        ),
    ),
    _q(
        "ldb_scan_count",
        lambda spark, sf: sops.scan(
            views(spark, sf)["keys"],
            filters=[("data_size", "GREATER", 10_000_000)], count=True),
        with_views(
            "SELECT count(*) AS count FROM keys WHERE data_size > 10000000",
            ["keys"],
        ),
    ),
    _q(
        "key_search",
        lambda spark, sf: sops.key_search(
            views(spark, sf)["keys"], prefix="/vol2/", repl_factor=3,
            min_creation_time=852076800000, min_data_size=1_000_000,
            limit=500),
        with_views(
            """SELECT db_key, object_id, data_size, repl_factor, creation_time
FROM keys
WHERE db_key LIKE '/vol2/%' AND repl_factor = 3
  AND creation_time >= 852076800000 AND data_size >= 1000000
ORDER BY db_key LIMIT 500""",
            ["keys"],
        ),
    ),
    _q(
        "keys_light",
        lambda spark, sf: sops.keys_light(views(spark, sf)["keys"],
                                          prefix="/vol3/"),
        with_views(
            "SELECT db_key, data_size, creation_time FROM keys "
            "WHERE db_key LIKE '/vol3/%'",
            ["keys"],
        ),
    ),
    _q(
        "list_multipart_uploads_page",
        lambda spark, sf: listing.list_multipart_uploads(
            views(spark, sf)["multipart_uploads"], key_marker="/vol1",
            max_uploads=25),
        with_views(
            """WITH f AS (
  SELECT upload_id, db_key, volume, bucket, key_name, owner,
         initiated_ms, n_parts
  FROM multipart_uploads WHERE db_key > '/vol1'
), p AS (
  SELECT *, row_number() OVER (ORDER BY db_key, upload_id) AS rn
  FROM f ORDER BY db_key, upload_id LIMIT 26
)
SELECT upload_id, db_key, volume, bucket, key_name, owner,
  initiated_ms, n_parts,
  (SELECT count(*) FROM p) > 25 AS is_truncated
FROM p WHERE rn <= 25 ORDER BY db_key""",
            ["multipart_uploads"],
        ),
    ),
    _q(
        "list_open_files_page",
        lambda spark, sf: listing.list_open_files(
            views(spark, sf)["open_keys"], path_prefix="/vol2/",
            max_keys=20),
        with_views(
            """WITH f AS (
  SELECT db_key, object_id, client_id, hsync, data_size, creation_time
  FROM open_keys WHERE db_key LIKE '/vol2/%'
), p AS (
  SELECT *, row_number() OVER (ORDER BY db_key) AS rn
  FROM f ORDER BY db_key LIMIT 21
)
SELECT db_key, object_id, client_id, hsync, data_size, creation_time,
  (SELECT count(*) FROM p) > 20 AS is_truncated
FROM p WHERE rn <= 20 ORDER BY db_key""",
            ["open_keys"],
        ),
    ),
    _q(
        "list_parts_page",
        # order 7 has >= 3 lineitems at every fixture SF, so maxParts=3
        # exercises the truncation flag
        lambda spark, sf: listing.list_parts(
            views(spark, sf)["locations"], object_id=7, max_parts=3),
        with_views(
            """WITH f AS (
  SELECT row_number() OVER (ORDER BY block_seq, local_id) AS part_number,
         md5(CAST(local_id AS VARCHAR)) AS etag,
         block_len AS part_size
  FROM locations WHERE object_id = 7
), p AS (
  SELECT *, row_number() OVER (ORDER BY part_number) AS rn
  FROM f WHERE part_number > 0 ORDER BY part_number LIMIT 4
)
SELECT part_number, etag, part_size,
  (SELECT count(*) FROM p) > 3 AS is_truncated
FROM p WHERE rn <= 3 ORDER BY part_number""",
            ["locations"],
        ),
    ),
    _q(
        "recon_list_keys",
        # every filter class at once: RATIS-only, created after mid-1995,
        # bigger than 2 KB, under /vol1/, after a mid-listing prevKey
        lambda spark, sf: listing.recon_list_keys(
            views(spark, sf)["keys"], replication_type="RATIS",
            created_after_ms=801273600000, min_size=2048,
            start_prefix="/vol1/", prev_key="/vol1/b1/f", max_keys=15),
        with_views(
            """WITH f AS (
  SELECT db_key, object_id, data_size, replicated_size,
    CASE WHEN repl_factor = 2 THEN 'EC' ELSE 'RATIS' END
      AS replication_type,
    creation_time, owner
  FROM keys
  WHERE repl_factor <> 2 AND creation_time >= 801273600000
    AND data_size >= 2048 AND db_key LIKE '/vol1/%'
    AND db_key > '/vol1/b1/f'
), p AS (
  SELECT *, row_number() OVER (ORDER BY db_key) AS rn
  FROM f ORDER BY db_key LIMIT 16
)
SELECT db_key, object_id, data_size, replicated_size, replication_type,
  creation_time, owner, (SELECT count(*) FROM p) > 15 AS is_truncated
FROM p WHERE rn <= 15 ORDER BY db_key""",
            ["keys"],
        ),
    ),
    _q(
        "list_volumes_by_user",
        lambda spark, sf: admin.list_volumes_by_user(
            views(spark, sf)["user_volumes"], views(spark, sf)["keys"]),
        with_views(
            """SELECT uv."user", uv.volume,
  CAST(u.n_buckets AS BIGINT) AS n_buckets,
  CAST(u.n_keys AS BIGINT) AS n_keys, u.used_bytes
FROM user_volumes uv JOIN (
  SELECT volume, count(DISTINCT bucket) AS n_buckets,
    count(*) AS n_keys, CAST(sum(data_size) AS BIGINT) AS used_bytes
  FROM keys GROUP BY 1
) u USING (volume)
ORDER BY uv."user", uv.volume""",
            ["user_volumes"],
        ),
    ),
]

# ---------------------------------------------------------------------------
# snapshot diff (J2/E1)
# ---------------------------------------------------------------------------

_DIFF_SQL = """SELECT COALESCE(a.object_id, b.object_id) AS object_id,
  CASE WHEN b.object_id IS NULL THEN 'DELETE'
       WHEN a.object_id IS NULL THEN 'CREATE'
       WHEN a.key_name <> b.key_name THEN 'RENAME'
       WHEN a.data_size <> b.data_size THEN 'MODIFY'
       ELSE 'NONE' END AS diff_type,
  a.key_name AS old_key, b.key_name AS new_key,
  a.data_size AS old_size, b.data_size AS new_size
FROM snap1 a FULL OUTER JOIN snap2 b ON a.object_id = b.object_id"""

SNAPSHOT_QUERIES = [
    _q(
        "snapshot_diff",
        lambda spark, sf: snops.snapshot_diff(
            views(spark, sf)["snap1"], views(spark, sf)["snap2"]),
        with_views(
            f"SELECT * FROM ({_DIFF_SQL}) WHERE diff_type <> 'NONE'",
            ["snap1", "snap2"],
        ),
        bench=True,
    ),
    _q(
        "snapshot_diff_page",
        lambda spark, sf: snops.snapshot_diff_page(
            views(spark, sf)["snap1"], views(spark, sf)["snap2"],
            start_token="/", max_entries=40),
        with_views(
            f"""WITH d AS (
  SELECT *, COALESCE(new_key, old_key) AS page_key
  FROM ({_DIFF_SQL}) WHERE diff_type <> 'NONE'
), f AS (
  SELECT object_id, diff_type, old_key, new_key, old_size, new_size,
         page_key
  FROM d WHERE page_key > '/'
), p AS (
  SELECT *, row_number() OVER (ORDER BY page_key, object_id) AS rn
  FROM f ORDER BY page_key, object_id LIMIT 41
)
SELECT object_id, diff_type, old_key, new_key, old_size, new_size,
  page_key, (SELECT count(*) FROM p) > 40 AS is_truncated
FROM p WHERE rn <= 40 ORDER BY page_key, object_id""",
            ["snap1", "snap2"],
        ),
    ),
    _q(
        "snapshot_diff_summary",
        lambda spark, sf: snops.snapshot_diff_summary(
            views(spark, sf)["snap1"], views(spark, sf)["snap2"]),
        with_views(
            f"""SELECT diff_type, count(*) AS n,
  CAST(sum(COALESCE(new_size, 0) - COALESCE(old_size, 0)) AS BIGINT) AS bytes_delta
FROM ({_DIFF_SQL}) WHERE diff_type <> 'NONE' GROUP BY 1 ORDER BY 1""",
            ["snap1", "snap2"],
        ),
    ),
    _q(
        "snapshot_chain_diff",
        lambda spark, sf: snops.chain_diff(
            [views(spark, sf)["snap1"], views(spark, sf)["snap2"],
             views(spark, sf)["snap3"]]),
        with_views(
            """SELECT * FROM (
  SELECT COALESCE(a.object_id, b.object_id) AS object_id,
    CASE WHEN b.object_id IS NULL THEN 'DELETE'
         WHEN a.object_id IS NULL THEN 'CREATE'
         WHEN a.key_name <> b.key_name THEN 'RENAME'
         WHEN a.data_size <> b.data_size THEN 'MODIFY'
         ELSE 'NONE' END AS diff_type,
    a.key_name AS old_key, b.key_name AS new_key,
    a.data_size AS old_size, b.data_size AS new_size
  FROM snap1 a FULL OUTER JOIN snap3 b ON a.object_id = b.object_id
) WHERE diff_type <> 'NONE'""",
            ["snap1", "snap3"],
        ),
    ),
    _q(
        "snapshot_renamed_entries",
        lambda spark, sf: snops.renamed_entries(
            views(spark, sf)["snap1"], views(spark, sf)["snap2"],
            "snap1->snap2",
        ).unionByName(snops.renamed_entries(
            views(spark, sf)["snap2"], views(spark, sf)["snap3"],
            "snap2->snap3")),
        with_views(
            """SELECT 'snap1->snap2' AS transition, a.object_id,
  a.key_name AS old_key, b.key_name AS new_key
FROM snap1 a JOIN snap2 b USING (object_id) WHERE a.key_name <> b.key_name
UNION ALL
SELECT 'snap2->snap3', a.object_id, a.key_name, b.key_name
FROM snap2 a JOIN snap3 b USING (object_id) WHERE a.key_name <> b.key_name""",
            ["snap1", "snap2", "snap3"],
        ),
    ),
    _q(
        "snapshot_chain_info",
        lambda spark, sf: views(spark, sf)["snapshot_chain"]
        .orderBy("chain_pos"),
        with_views(
            "SELECT * FROM snapshot_chain ORDER BY chain_pos",
            ["snapshot_chain"],
        ),
    ),
    _q(
        "snapshot_diff_renamed_table",
        lambda spark, sf: snops.snapshot_diff_with_renames(
            views(spark, sf)["snap1"], views(spark, sf)["snap2"],
            snops.renamed_entries(views(spark, sf)["snap1"],
                                  views(spark, sf)["snap2"], "x")),
        with_views(
            f"SELECT * FROM ({_DIFF_SQL}) WHERE diff_type <> 'NONE'",
            ["snap1", "snap2"],
        ),
    ),
]

# ---------------------------------------------------------------------------
# compaction-DAG snapshot-diff pruning (rocksdb-checkpoint-differ)
# ---------------------------------------------------------------------------

from ozone_spark.operators import compaction as compops  # noqa: E402

_SST_DIFF_ORACLE = """WITH RECURSIVE
{catalog},
{edges},
{snapfiles},
src AS (SELECT sst_id FROM sst_snapshot_files WHERE snapshot_name = 'snap-s'),
dest AS (SELECT sst_id FROM sst_snapshot_files WHERE snapshot_name = 'snap-d'),
dgen AS (SELECT max(snapshot_gen) AS g FROM sst_snapshot_files
         WHERE snapshot_name = 'snap-d'),
nodes AS (SELECT out_sst AS sst_id FROM compaction_edges
          UNION SELECT in_sst FROM compaction_edges),
walk AS (
  SELECT sst_id FROM src
  WHERE sst_id NOT IN (SELECT sst_id FROM dest)
    AND sst_id IN (SELECT sst_id FROM nodes)
  UNION
  SELECT e.in_sst FROM walk w
  JOIN sst_catalog c ON c.sst_id = w.sst_id
  JOIN compaction_edges e ON e.out_sst = w.sst_id
  WHERE w.sst_id NOT IN (SELECT sst_id FROM dest)
    AND c.gen >= (SELECT g FROM dgen)
),
encountered AS (
  SELECT sst_id FROM walk
  UNION
  SELECT sst_id FROM src WHERE sst_id IN (SELECT sst_id FROM dest)
  UNION
  SELECT sst_id FROM src
  WHERE sst_id NOT IN (SELECT sst_id FROM dest)
    AND sst_id NOT IN (SELECT sst_id FROM nodes)
)
SELECT sst_id, gen, verdict,
  verdict = 'DIFFERENT' AND end_key >= '/vol1' AND start_key <= '/vol1/~'
    AS relevant
FROM (
  SELECT c.sst_id, c.gen, c.start_key, c.end_key,
    CASE WHEN c.sst_id IN (SELECT sst_id FROM dest) THEN 'SAME'
         WHEN c.sst_id NOT IN (SELECT sst_id FROM nodes) THEN 'DIFFERENT'
         WHEN c.gen < (SELECT g FROM dgen) THEN 'DIFFERENT'
         WHEN c.sst_id NOT IN (SELECT out_sst FROM compaction_edges)
           THEN 'DIFFERENT'
         ELSE NULL END AS verdict
  FROM encountered e JOIN sst_catalog c USING (sst_id)
)
WHERE verdict IS NOT NULL
ORDER BY sst_id"""

COMPACTION_QUERIES = [
    _q(
        "sst_diff_pruning",
        lambda spark, sf: compops.sst_diff_files(
            views(spark, sf)["sst_snapshot_files"],
            views(spark, sf)["sst_catalog"],
            views(spark, sf)["compaction_edges"],
            "snap-s", "snap-d", "/vol1"),
        _SST_DIFF_ORACLE.format(
            catalog=ORACLE_CTES["sst_catalog"],
            edges=ORACLE_CTES["compaction_edges"],
            snapfiles=ORACLE_CTES["sst_snapshot_files"]),
    ),
]

# ---------------------------------------------------------------------------
# SCM admin plane: pipelines, safemode rules, decommission planning
# ---------------------------------------------------------------------------

from ozone_spark.operators import scm as scmops  # noqa: E402

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

# ---------------------------------------------------------------------------
# namespace rollup / du / quota (A4, A5, O5)
# ---------------------------------------------------------------------------

# depth-generic ancestor explode: bucket root + every proper directory
# prefix of key_name (mirrors namespace.ancestors_expr)
_ANC_LIST = """list_concat(
    ['/' || volume || '/' || bucket],
    list_transform(range(1, len(string_split(key_name, '/'))),
      i -> '/' || volume || '/' || bucket || '/'
           || array_to_string(string_split(key_name, '/')[1:i], '/')))"""

_ROLLUP_SQL = f"""WITH anc AS (
  SELECT unnest({_ANC_LIST}) AS dir_path, data_size, replicated_size
  FROM keys
)
SELECT dir_path, count(*) AS num_files,
  CAST(sum(data_size) AS BIGINT) AS size_of_files,
  CAST(sum(replicated_size) AS BIGINT) AS replicated_size
FROM anc GROUP BY 1"""

NAMESPACE_QUERIES = [
    _q(
        "namespace_rollup",
        lambda spark, sf: nops.namespace_rollup(views(spark, sf)["keys"]),
        with_views(_ROLLUP_SQL, ["keys"]),
        bench=True,
    ),
    _q(
        "pending_deleted_dirs",
        lambda spark, sf: nops.pending_deleted_dirs(
            views(spark, sf)["keys"], views(spark, sf)["directories"],
            limit=40),
        with_views(
            f"""WITH roll AS ({_ROLLUP_SQL}),
dd AS (
  SELECT d.path, d.depth,
    coalesce(r.num_files, 0) AS num_files,
    CAST(coalesce(r.size_of_files, 0) AS BIGINT) AS unreplicated_bytes,
    CAST(coalesce(r.replicated_size, 0) AS BIGINT) AS replicated_bytes
  FROM directories d LEFT JOIN roll r ON r.dir_path = d.path
  WHERE CAST('0x' || substr(md5(d.path), 1, 7) AS BIGINT) % 11 = 0
), p AS (
  SELECT *, row_number() OVER (ORDER BY path) AS rn
  FROM dd ORDER BY path LIMIT 41
)
SELECT path, depth, num_files, unreplicated_bytes, replicated_bytes,
  (SELECT count(*) FROM p) > 40 AS is_truncated
FROM p WHERE rn <= 40 ORDER BY path""",
            ["keys", "directories"],
        ),
    ),
    _q(
        "deleted_dirs_summary",
        lambda spark, sf: nops.deleted_dirs_summary(
            views(spark, sf)["keys"], views(spark, sf)["directories"]),
        with_views(
            f"""WITH roll AS ({_ROLLUP_SQL}),
dd AS (
  SELECT d.path,
    coalesce(r.num_files, 0) AS num_files,
    coalesce(r.size_of_files, 0) AS unreplicated_bytes,
    coalesce(r.replicated_size, 0) AS replicated_bytes
  FROM directories d LEFT JOIN roll r ON r.dir_path = d.path
  WHERE CAST('0x' || substr(md5(d.path), 1, 7) AS BIGINT) % 11 = 0
)
SELECT count(*) AS total_deleted_directories,
  CAST(coalesce(sum(num_files), 0) AS BIGINT) AS total_files,
  CAST(coalesce(sum(unreplicated_bytes), 0) AS BIGINT)
    AS unreplicated_bytes,
  CAST(coalesce(sum(replicated_bytes), 0) AS BIGINT) AS replicated_bytes
FROM dd""",
            ["keys", "directories"],
        ),
    ),
    _q(
        "namespace_dist",
        lambda spark, sf: nops.namespace_dist(views(spark, sf)["keys"],
                                              prefix="/vol1/b1"),
        with_views(
            f"""WITH anc AS (
  SELECT unnest({_ANC_LIST}) AS dir_path, data_size FROM keys
)
SELECT dir_path, {_FILE_BIN} AS bin_index, count(*) AS file_count,
  CAST(pow(2.0, CAST(10 + {_FILE_BIN} AS DOUBLE)) AS BIGINT) AS bin_upper_bound
FROM anc WHERE dir_path LIKE '/vol1/b1%'
GROUP BY 1, 2 ORDER BY 1, 2""",
            ["keys"],
        ),
        bench=True,
    ),
    _q(
        "du_top_children",
        lambda spark, sf: nops.du_children(views(spark, sf)["keys"],
                                           "/vol1/b1/f", top_k=5),
        with_views(
            f"""SELECT * FROM ({_ROLLUP_SQL})
WHERE dir_path LIKE '/vol1/b1/f/%'
  AND len(string_split(dir_path, '/')) = 5
ORDER BY size_of_files DESC, dir_path LIMIT 5""",
            ["keys"],
        ),
    ),
    _q(
        "quota_usage",
        lambda spark, sf: nops.quota_usage(views(spark, sf)["keys"]),
        with_views(
            """SELECT volume, bucket, CAST(sum(data_size) AS BIGINT) AS used_bytes,
  CAST(sum(replicated_size) AS BIGINT) AS used_replicated_bytes,
  count(*) AS used_namespace
FROM keys GROUP BY 1, 2 ORDER BY 1, 2""",
            ["keys"],
        ),
    ),
]

# ---------------------------------------------------------------------------
# lifecycle / TTL / reclaim (P5-P7, B1, B3, B4)
# ---------------------------------------------------------------------------

_TTL_5Y = 5 * 365 * 86400000

LIFECYCLE_QUERIES = [
    _q(
        "lifecycle_expired",
        lambda spark, sf: lops.lifecycle_expired(views(spark, sf)["keys"]),
        with_views(
            f"""WITH m AS (
  SELECT db_key, data_size, 'rule-f-old' AS rule_id FROM keys
  WHERE volume = 'vol1' AND bucket = 'b1' AND key_name LIKE 'f/%'
    AND creation_time + {1500 * 86400000} <= {NOW_MS}
  UNION ALL
  SELECT db_key, data_size, 'rule-f-1995' FROM keys
  WHERE volume = 'vol1' AND bucket = 'b1' AND key_name LIKE 'f/y1995/%'
    AND creation_time + {365 * 86400000} <= {NOW_MS}
  UNION ALL
  SELECT db_key, data_size, 'rule-o-date' FROM keys
  WHERE volume = 'vol2' AND bucket = 'b2' AND key_name LIKE 'o/%'
    AND creation_time < {NOW_MS - 4 * 365 * 86400000}
)
SELECT db_key, min(rule_id) AS rule_id, min(data_size) AS data_size
FROM m GROUP BY 1 ORDER BY 1""",
            ["keys"],
        ),
    ),
    _q(
        "lifecycle_tagged_expired",
        lambda spark, sf: lops.lifecycle_tagged_expired(views(spark, sf)["keys"]),
        with_views(
            f"""WITH m AS (
  SELECT db_key, data_size, element_at(tags, 'tier')[1] AS tier,
         'rule-tmp-purge' AS rule_id FROM keys
  WHERE volume = 'vol1' AND bucket = 'b1'
    AND element_at(tags, 'tmp')[1] = 'true'
    AND creation_time + {1800 * 86400000} <= {NOW_MS}
  UNION ALL
  SELECT db_key, data_size, element_at(tags, 'tier')[1], 'rule-low-tier'
  FROM keys
  WHERE volume = 'vol2' AND bucket = 'b2' AND key_name LIKE 'o/%'
    AND element_at(tags, 'tier')[1] = 'low'
    AND creation_time + {2000 * 86400000} <= {NOW_MS}
  UNION ALL
  SELECT db_key, data_size, element_at(tags, 'tier')[1], 'rule-urgent-frozen'
  FROM keys
  WHERE volume = 'vol3' AND bucket = 'b0'
    AND element_at(tags, 'tier')[1] = 'urgent'
    AND creation_time + {36500 * 86400000} <= {NOW_MS}
)
SELECT db_key, min(rule_id) AS rule_id, min(tier) AS tier,
  min(data_size) AS data_size
FROM m GROUP BY 1 ORDER BY 1""",
            ["keys"],
        ),
    ),
    _q(
        "open_keys_expired",
        lambda spark, sf: lops.open_keys_expired(
            views(spark, sf)["open_keys"], ttl_ms=_TTL_5Y),
        with_views(
            f"""SELECT db_key, object_id, client_id, creation_time, hsync
FROM open_keys WHERE {NOW_MS} - creation_time > {_TTL_5Y}
ORDER BY db_key""",
            ["open_keys"],
        ),
    ),
    _q(
        "lifecycle_mpu_aborts",
        lambda spark, sf: lops.lifecycle_mpu_aborts(
            views(spark, sf)["multipart_uploads"]),
        with_views(
            f"""WITH m AS (
  SELECT upload_id, db_key, n_parts, part_bytes,
    'mpu-abort-v1b1' AS rule_id
  FROM multipart_uploads
  WHERE volume = 'vol1' AND bucket = 'b1'
    AND initiated_ms + {1200 * 86400000} <= {NOW_MS}
  UNION ALL
  SELECT upload_id, db_key, n_parts, part_bytes, 'mpu-abort-v2o'
  FROM multipart_uploads
  WHERE volume = 'vol2' AND bucket = 'b2' AND key_name LIKE 'o/%'
    AND initiated_ms + {2000 * 86400000} <= {NOW_MS}
)
SELECT upload_id, min(rule_id) AS rule_id, min(db_key) AS db_key,
  min(n_parts) AS n_parts, min(part_bytes) AS reclaimed_bytes
FROM m GROUP BY 1 ORDER BY 1""",
            ["multipart_uploads"],
        ),
    ),
    _q(
        "trash_expired_checkpoints",
        lambda spark, sf: lops.trash_expunge_plan(
            views(spark, sf)["trash_entries"]),
        with_views(
            f"""SELECT volume, bucket, owner, checkpoint,
  count(*) AS n_files, CAST(sum(data_size) AS BIGINT) AS reclaimed_bytes
FROM trash_entries
WHERE checkpoint_ms IS NOT NULL
  AND checkpoint_ms + {30 * 86400000} <= {NOW_MS}
GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""",
            ["trash_entries"],
        ),
    ),
    _q(
        "trash_checkpoint_plan",
        lambda spark, sf: lops.trash_checkpoint_plan(
            views(spark, sf)["trash_entries"]),
        with_views(
            f"""SELECT object_id, trash_path AS src_path,
  '/' || volume || '/' || bucket || '/.Trash/' || owner
    || '/ckpt-{NOW_MS}/' || key_name AS dst_path
FROM trash_entries WHERE checkpoint_ms IS NULL ORDER BY object_id""",
            ["trash_entries"],
        ),
    ),
    _q(
        "lease_recovery_plan",
        lambda spark, sf: lops.lease_recovery_plan(
            views(spark, sf)["open_keys"], views(spark, sf)["locations"],
            views(spark, sf)["containers"], lease_ttl_ms=_TTL_5Y),
        with_views(
            f"""SELECT o.db_key, o.object_id, o.client_id,
  CAST(COALESCE(c.n_blocks, 0) AS BIGINT) AS n_blocks,
  CAST(COALESCE(c.committed_bytes, 0) AS BIGINT) AS committed_bytes,
  CASE WHEN COALESCE(c.n_blocks, 0) > 0 THEN 'COMMIT' ELSE 'DELETE' END
    AS action
FROM open_keys o
LEFT JOIN (
  SELECT object_id, count(*) AS n_blocks,
    CAST(sum(block_len) AS BIGINT) AS committed_bytes
  FROM locations l
  WHERE EXISTS (SELECT 1 FROM containers c2
                WHERE c2.container_id = l.container_id
                  AND c2.state <> 'DELETED')
  GROUP BY 1
) c USING (object_id)
WHERE o.hsync AND {NOW_MS} - o.creation_time > {_TTL_5Y}
ORDER BY o.db_key""",
            ["open_keys", "locations", "containers"],
        ),
    ),
    _q(
        "reclaimable_deleted_keys",
        lambda spark, sf: lops.reclaimable_deleted_keys(
            views(spark, sf)["deleted_keys"],
            views(spark, sf)["snap1"].unionByName(views(spark, sf)["snap2"])),
        with_views(
            """SELECT db_key, object_id, pending_bytes, num_versions
FROM deleted_keys
WHERE object_id NOT IN
  (SELECT object_id FROM snap1 UNION SELECT object_id FROM snap2)
ORDER BY db_key""",
            ["deleted_keys", "snap1", "snap2"],
        ),
    ),
    _q(
        "gdpr_crypto_shred",
        lambda spark, sf: lops.gdpr_crypto_shred(
            views(spark, sf)["deleted_keys"], views(spark, sf)["locations"]),
        with_views(
            """SELECT d.db_key, d.object_id,
  md5(d.db_key) AS secret_id,
  'AES/CTR/NoPadding' AS algorithm,
  CAST(COALESCE(b.n_blocks, 0) AS BIGINT) AS n_blocks,
  CAST(COALESCE(b.n_containers, 0) AS BIGINT) AS n_containers,
  CAST(COALESCE(b.unreadable_bytes, 0) AS BIGINT) AS unreadable_bytes
FROM deleted_keys d LEFT JOIN (
  SELECT object_id, count(*) AS n_blocks,
         count(DISTINCT container_id) AS n_containers,
         sum(block_len) AS unreadable_bytes
  FROM locations GROUP BY object_id) b USING (object_id)
WHERE d.bucket = 'b0'
ORDER BY d.db_key""",
            ["deleted_keys", "locations"],
        ),
    ),
]

# ---------------------------------------------------------------------------
# scalar function surface (§2.7: checksums / etag / string fns)
# ---------------------------------------------------------------------------


def _etag_fn(spark, sf):
    import pyspark.sql.functions as F
    keys = views(spark, sf)["keys"]
    return (
        keys.where((F.col("volume") == "vol0") & (F.col("bucket") == "b0"))
        .select(
            "db_key",
            F.md5("db_key").alias("etag"),
            F.sha2(F.col("db_key"), 256).alias("sha256_hex"),
            F.length("db_key").cast("long").alias("key_len"),
        )
    )


SCALAR_QUERIES = [
    _q(
        "etag_checksums",
        _etag_fn,
        with_views(
            """SELECT db_key, md5(db_key) AS etag, sha256(db_key) AS sha256_hex,
  CAST(length(db_key) AS BIGINT) AS key_len
FROM keys WHERE volume = 'vol0' AND bucket = 'b0'""",
            ["keys"],
        ),
    ),
]

# ---------------------------------------------------------------------------
# relational headline queries (bench)
# ---------------------------------------------------------------------------

TPCH_QUERIES = [
    _q(
        "pricing_summary",
        lambda spark, sf: tpch.pricing_summary(views(spark, sf)["lineitem"]),
        """SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 4) AS avg_qty,
  round(avg(l_extendedprice), 4) AS avg_price,
  round(avg(l_discount), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2 ORDER BY 1, 2""",
        bench=True,
    ),
    _q(
        "shipping_priority",
        lambda spark, sf: tpch.shipping_priority(
            views(spark, sf)["customer"], views(spark, sf)["orders"],
            views(spark, sf)["lineitem"]),
        """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  o_orderpriority, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        bench=True,
    ),
    _q(
        "region_revenue",
        lambda spark, sf: tpch.region_revenue(
            views(spark, sf)["region"], views(spark, sf)["nation"],
            views(spark, sf)["customer"], views(spark, sf)["orders"],
            views(spark, sf)["lineitem"], views(spark, sf)["supplier"]),
        """SELECT r_name, n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY 1, 2 ORDER BY 1, 2""",
        bench=True,
    ),
    _q(
        "order_priority_counts",
        lambda spark, sf: tpch.order_priority_counts(
            views(spark, sf)["orders"], views(spark, sf)["lineitem"]),
        """SELECT o_orderpriority, count(*) AS order_count
FROM orders WHERE o_orderkey IN
  (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
GROUP BY 1 ORDER BY 1""",
    ),
]

# ---------------------------------------------------------------------------
# event-time analytics (ST6 north star)
# ---------------------------------------------------------------------------

# shared sessionization prelude (30-minute gap rule) ending in the
# per-(user, session) aggregate `sess`; used by events_sessionize and
# events_session_distribution
_SESSIONIZE_CTES = """WITH e AS (
  SELECT user_id, event_id, ts, value, epoch_ms(ts) // 1000 AS tss FROM events
), l AS (
  SELECT *, lag(tss) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM e
), s AS (
  SELECT *, CASE WHEN prev IS NOT NULL AND tss - prev > 1800 THEN 1 ELSE 0 END
    AS new_sess FROM l
), c AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM s
), sess AS (
  SELECT user_id, session_id, count(*) AS n_events,
    CAST(max(tss) - min(tss) AS BIGINT) AS duration_s,
    round(sum(value), 4) AS total_value
  FROM c GROUP BY 1, 2
)"""


EVENT_QUERIES = [
    _q(
        "events_tumbling_daily",
        lambda spark, sf: eops.tumbling_daily(views(spark, sf)["events"]),
        """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
  count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
        bench=True,
    ),
    _q(
        "events_sliding_6h",
        lambda spark, sf: eops.sliding_hourly(views(spark, sf)["events"]),
        """SELECT window_start_ms, window_start_ms + 21600000 AS window_end_ms,
  count(*) AS n_events
FROM (SELECT (epoch_ms(ts) // 10800000) * 10800000 - o * 10800000 AS window_start_ms
      FROM events, (SELECT unnest([0, 1]) AS o))
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "events_sessionize",
        lambda spark, sf: eops.sessionize(views(spark, sf)["events"]),
        _SESSIONIZE_CTES + """
SELECT user_id, session_id, n_events, duration_s, total_value
FROM sess ORDER BY 1, 2""",
        bench=True,
    ),
    _q(
        "events_top_users",
        lambda spark, sf: eops.top_users_per_type(views(spark, sf)["events"]),
        """SELECT event_type, user_id, total_value, n_events, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY total_value DESC, user_id) AS rank
  FROM (SELECT event_type, user_id, round(sum(value), 4) AS total_value,
               count(*) AS n_events
        FROM events GROUP BY 1, 2)
) WHERE rank <= 3 ORDER BY event_type, rank""",
    ),
]

# ---------------------------------------------------------------------------
# text analysis / dedup / similarity / multimodal (north star)
# ---------------------------------------------------------------------------

_NORM = "regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')"
_SW = "('the', 'a', 'of', 'and', 'to', 'in')"

TEXT_QUERIES = [
    _q(
        "text_stats",
        lambda spark, sf: text.text_stats(views(spark, sf)["documents"]),
        """SELECT lang, source, count(*) AS n_docs,
  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
  CAST(sum(length(text)) AS BIGINT) AS total_chars,
  round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "text_quality",
        lambda spark, sf: text.quality_features(views(spark, sf)["documents"]),
        f"""SELECT doc_id, lang, source,
  CAST(length(text) AS BIGINT) AS n_chars_measured,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  round((length(text) - len(string_split(text, ' ')) + 1)
        / len(string_split(text, ' ')), 6) AS mean_word_len,
  round(len(list_filter(string_split(text, ' '), w -> w IN {_SW}))
        / len(string_split(text, ' ')), 6) AS stopword_ratio,
  round(least(len(string_split(text, ' ')) / 64.0, 1.0) * 0.5
        + least(len(list_filter(string_split(text, ' '), w -> w IN {_SW}))
                / len(string_split(text, ' ')) * 5.0, 1.0) * 0.5, 6)
    AS quality_score
FROM documents""",
    ),
    _q(
        "language_id",
        lambda spark, sf: text.language_id(views(spark, sf)["documents"]),
        """WITH s AS (
  SELECT lang,
    len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a', 'and'))) AS hits_en,
    len(list_filter(string_split(text, ' '), w -> w IN ('der', 'und', 'die'))) AS hits_de,
    len(list_filter(string_split(text, ' '), w -> w IN ('el', 'la', 'los'))) AS hits_es,
    len(list_filter(string_split(text, ' '), w -> w IN ('le', 'et', 'les'))) AS hits_fr
  FROM documents
)
SELECT lang, predicted, count(*) AS n FROM (
  SELECT lang, CASE
    WHEN greatest(hits_en, hits_de, hits_es, hits_fr) = 0 THEN 'und'
    WHEN hits_en = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'en'
    WHEN hits_de = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'de'
    WHEN hits_es = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'es'
    ELSE 'fr' END AS predicted
  FROM s
) GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "token_counts",
        lambda spark, sf: text.token_counts(views(spark, sf)["documents"]),
        f"""SELECT doc_id, lang,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '{text.BPE_ISH_PATTERN}')) AS BIGINT)
    AS bpe_ish_tokens,
  round(len(regexp_extract_all(text, '{text.BPE_ISH_PATTERN}'))
        / greatest(len(string_split(text, ' ')), 1), 6) AS fertility
FROM documents""",
    ),
    _q(
        "curation_pipeline",
        lambda spark, sf: text.curation_pipeline(views(spark, sf)["documents"]),
        f"""WITH gated AS (
  SELECT doc_id, lang, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    len(string_split(text, ' ')) >= 16
      AND len(list_filter(string_split(text, ' '), w -> w IN {_SW}))
          / len(string_split(text, ' ')) >= 0.02 AS pq,
    md5({_NORM}) AS fp
  FROM documents
), k AS (
  SELECT *, min(CASE WHEN pq THEN doc_id END) OVER (PARTITION BY fp) AS keeper
  FROM gated
)
SELECT lang, source, count(*) AS n_docs,
  CAST(sum(CASE WHEN pq AND doc_id = keeper THEN 1 ELSE 0 END) AS BIGINT)
    AS n_kept,
  CAST(sum(CASE WHEN pq AND doc_id = keeper THEN n_tokens ELSE 0 END) AS BIGINT)
    AS kept_tokens
FROM k GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "fingerprint_summary",
        lambda spark, sf: text.fingerprint_summary(views(spark, sf)["documents"]),
        f"""SELECT source, count(*) AS n_docs,
  CAST(count(DISTINCT md5({_NORM})) AS BIGINT) AS n_unique
FROM documents GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "document_chunks",
        lambda spark, sf: text.document_chunks(views(spark, sf)["documents"]),
        """WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
    len(string_split(text, ' ')) AS n_tok
  FROM documents
), s AS (
  SELECT doc_id, words, n_tok,
    unnest(generate_series(0, greatest(n_tok - 9, 0), 24)) AS start
  FROM w WHERE n_tok > 0
)
SELECT doc_id,
  CAST(start // 24 AS BIGINT) AS chunk_id,
  CAST(least(n_tok - start, 32) AS BIGINT) AS n_tokens,
  md5(array_to_string(list_slice(words, start + 1, start + 32), ' '))
    AS chunk_md5
FROM s""",
    ),
    _q(
        "gopher_quality",
        lambda spark, sf: text.gopher_quality_filters(
            views(spark, sf)["documents"]),
        f"""WITH m AS (
  SELECT doc_id, source,
    len(string_split(text, ' ')) AS n_words,
    (length(text) - len(string_split(text, ' ')) + 1)
      / len(string_split(text, ' ')) AS mean_wl,
    (length(text)
      - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))
      / greatest(len(string_split(text, ' ')), 1) AS sym_ratio,
    len(list_intersect(list_distinct(string_split(text, ' ')),
        ['the', 'a', 'of', 'and', 'to', 'in'])) AS n_sw,
    len(list_filter(string_split(text, ' '),
        w -> regexp_matches(w, '[a-zA-Z]')))
      / greatest(len(string_split(text, ' ')), 1) AS alpha_ratio
  FROM documents
)
SELECT doc_id, source,
  CAST(n_words AS BIGINT) AS n_words,
  round(mean_wl, 6) AS mean_word_len,
  round(sym_ratio, 6) AS symbol_ratio,
  CAST(n_sw AS BIGINT) AS n_distinct_stopwords,
  round(alpha_ratio, 6) AS alpha_word_ratio,
  n_words >= {text.GOPHER_MIN_WORDS}
    AND n_words <= {text.GOPHER_MAX_WORDS} AS ok_word_count,
  mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
    AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN} AS ok_mean_word_len,
  sym_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO} AS ok_symbol_ratio,
  n_sw >= {text.GOPHER_MIN_DISTINCT_STOPWORDS} AS ok_stopwords,
  alpha_ratio >= {text.GOPHER_MIN_ALPHA_WORD_RATIO} AS ok_alpha_words,
  (n_words >= {text.GOPHER_MIN_WORDS}
    AND n_words <= {text.GOPHER_MAX_WORDS})
    AND (mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
      AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN})
    AND sym_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO}
    AND n_sw >= {text.GOPHER_MIN_DISTINCT_STOPWORDS}
    AND alpha_ratio >= {text.GOPHER_MIN_ALPHA_WORD_RATIO} AS passes_gopher
FROM m""",
    ),
]

# 5-word shingle list over the normalized text, as a DuckDB expression
_SH5 = ("list_distinct(list_transform(range(1, greatest(len(w) - 4, 0) + 1), "
        "i -> array_to_string(list_slice(w, i, i + 4), ' ')))")
# the portable Bernoulli sample key (functions/pipeline.py sample_key)
_SKEY = ("CAST('0x' || substr(md5('mix-v1:' || CAST(doc_id AS VARCHAR)), "
         "1, 7) AS BIGINT) % 10000")
_RATE = ("CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.4 "
         "ELSE 1.0 END AS DOUBLE)")
# n-word span concat for the duplicated_spans oracle: w[i] || ' ' || ...
_SPAN_CAT = " || ' ' || ".join(
    f"w[i + {k}]" if k else "w[i]" for k in range(8))

PIPELINE_QUERIES = [
    _q(
        "decontaminate_overlap",
        lambda spark, sf: pipeline.decontaminate(
            views(spark, sf)["documents"].where("doc_id % 25 <> 0"),
            views(spark, sf)["documents"].where("doc_id % 25 = 0")),
        f"""WITH shl AS (
  SELECT doc_id, {_SH5} AS shs
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents)
  WHERE len(w) >= 5
), ev AS (
  SELECT DISTINCT unnest(shs) AS s FROM shl WHERE doc_id % 25 = 0
), tr AS (
  SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS s FROM shl
  WHERE doc_id % 25 <> 0
), agg AS (
  SELECT tr.doc_id, any_value(tr.n_sh) AS n_sh, count(ev.s) AS n_hit
  FROM tr LEFT JOIN ev ON tr.s = ev.s GROUP BY 1
)
SELECT doc_id, CAST(n_sh AS BIGINT) AS n_shingles,
  CAST(n_hit AS BIGINT) AS n_overlapping,
  round(n_hit / n_sh, 6) AS overlap_fraction,
  n_hit / n_sh >= {pipeline.DECONTAM_MIN_OVERLAP} AS contaminated
FROM agg ORDER BY doc_id""",
    ),
    _q(
        "repetition_metrics",
        lambda spark, sf: pipeline.repetition_metrics(
            views(spark, sf)["documents"]),
        f"""WITH m AS (
  SELECT doc_id, source, len(ws) AS n_words,
    len(ws) - len(list_distinct(ws)) AS n_dup,
    list_max(list_transform(list_distinct(ws),
      v -> len(list_filter(ws, x -> x = v)))) AS top_w,
    list_max(list_transform(list_distinct(bg),
      v -> len(list_filter(bg, x -> x = v)))) AS top_bg
  FROM (
    SELECT doc_id, source, ws,
      list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]) AS bg
    FROM (SELECT doc_id, source, string_split({_NORM}, ' ') AS ws
          FROM documents)
    WHERE len(ws) >= 2)
)
SELECT doc_id, source, CAST(n_words AS BIGINT) AS n_words,
  round(n_dup / n_words, 6) AS dup_word_fraction,
  round(top_w / n_words, 6) AS top_word_fraction,
  round(top_bg / greatest(n_words - 1, 1), 6) AS top_bigram_fraction,
  n_dup / n_words <= {pipeline.REP_MAX_DUP_WORD_FRACTION} AS ok_dup_words,
  top_w / n_words <= {pipeline.REP_MAX_TOP_WORD_FRACTION} AS ok_top_word,
  top_bg / greatest(n_words - 1, 1)
    <= {pipeline.REP_MAX_TOP_BIGRAM_FRACTION} AS ok_top_bigram,
  n_dup / n_words <= {pipeline.REP_MAX_DUP_WORD_FRACTION}
    AND top_w / n_words <= {pipeline.REP_MAX_TOP_WORD_FRACTION}
    AND top_bg / greatest(n_words - 1, 1)
      <= {pipeline.REP_MAX_TOP_BIGRAM_FRACTION} AS passes_repetition
FROM m ORDER BY doc_id""",
    ),
    _q(
        "stratified_sample",
        lambda spark, sf: pipeline.stratified_sample(
            views(spark, sf)["documents"]),
        f"""SELECT doc_id, lang, source, sample_key FROM (
  SELECT doc_id, lang, source, {_SKEY} AS sample_key,
    CAST({_RATE} * 10000 AS INT) AS cut
  FROM documents
) WHERE sample_key < cut ORDER BY doc_id""",
    ),
    _q(
        "stratified_sample_summary",
        lambda spark, sf: pipeline.stratified_sample_summary(
            views(spark, sf)["documents"]),
        f"""WITH k AS (
  SELECT lang AS stratum, {_RATE} AS target_rate,
    CASE WHEN {_SKEY} < CAST({_RATE} * 10000 AS INT)
      THEN 1 ELSE 0 END AS kept,
    len(string_split(text, ' ')) AS n_tok
  FROM documents
)
SELECT stratum, any_value(target_rate) AS target_rate,
  count(*) AS n_docs, CAST(sum(kept) AS BIGINT) AS n_kept,
  CAST(sum(kept * n_tok) AS BIGINT) AS kept_tokens,
  round(sum(kept) / count(*), 6) AS realized_rate
FROM k GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "pack_sequences",
        lambda spark, sf: pipeline.pack_sequences(
            views(spark, sf)["documents"]),
        f"""WITH b AS (
  SELECT source AS shard, doc_id, n_tok,
    (sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       ROWS UNBOUNDED PRECEDING) - n_tok) // {pipeline.PACK_BUDGET} AS bin
  FROM (SELECT source, doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents)
)
SELECT shard, CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
  round(sum(n_tok) / {pipeline.PACK_BUDGET}, 6) AS fill_ratio
FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "dedup_keep_best",
        lambda spark, sf: pipeline.resolve_keep_best(
            views(spark, sf)["documents"], threshold=0.1),
        # dedup_clusters' recursive transitive closure + quality-argmax
        # keeper selection (highest quality_score, ties to lowest doc_id);
        # singletons are their own cluster
        f"""WITH RECURSIVE words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach AS (
  SELECT DISTINCT a AS doc_id, a AS root FROM edges
  UNION
  SELECT e.b AS doc_id, r.root FROM reach r JOIN edges e ON e.a = r.doc_id
), cc AS (
  SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY doc_id
), lab AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
    round(least(len(string_split(d.text, ' ')) / 64.0, 1.0) * 0.5
      + least(len(list_filter(string_split(d.text, ' '), w -> w IN {_SW}))
              / len(string_split(d.text, ' ')) * 5.0, 1.0) * 0.5, 6)
      AS quality_score
  FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
)
SELECT doc_id, cluster_id, quality_score,
  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
  row_number() OVER (PARTITION BY cluster_id
                     ORDER BY quality_score DESC, doc_id) = 1 AS is_keeper
FROM lab ORDER BY doc_id""",
    ),
    _q(
        "domain_mixture",
        lambda spark, sf: pipeline.domain_mixture(
            views(spark, sf)["documents"]),
        """WITH agg AS (
  SELECT source AS domain, count(*) AS n_docs,
    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
)
SELECT domain, n_docs, n_tokens,
  round(n_tokens / sum(n_tokens) OVER (), 6) AS token_share,
  round(1.0 / count(*) OVER (), 6) AS target_share,
  round(least(1.0, (1.0 / count(*) OVER ())
        / (n_tokens / sum(n_tokens) OVER ())), 6) AS mix_weight,
  CAST(floor(least(1.0, (1.0 / count(*) OVER ())
        / (n_tokens / sum(n_tokens) OVER ())) * n_tokens) AS BIGINT)
    AS effective_tokens
FROM agg ORDER BY domain""",
    ),
    _q(
        "duplicated_spans",
        lambda spark, sf: pipeline.duplicated_spans(
            views(spark, sf)["documents"]),
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= {pipeline.DUP_SPAN_NGRAM}
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - {pipeline.DUP_SPAN_NGRAM - 1}, 0) + 1),
    i -> {_SPAN_CAT})))
    AS shingle
  FROM words
), h AS (
  SELECT doc_id,
    CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h FROM sh
), dfc AS (
  SELECT h, count(*) AS span_df FROM h GROUP BY 1
), per AS (
  SELECT doc_id, count(*) AS n_spans,
    CAST(sum(CASE WHEN span_df >= {pipeline.DUP_SPAN_MIN_DOCS}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
  FROM h JOIN dfc USING (h) GROUP BY 1
)
SELECT doc_id, n_spans, n_dup_spans,
  round(n_dup_spans / n_spans, 6) AS dup_fraction,
  n_dup_spans / n_spans >= 0.5 AS mostly_duplicated
FROM per ORDER BY doc_id""",
    ),
    _q(
        "training_shards",
        lambda spark, sf: pipeline.training_shards(
            views(spark, sf)["documents"]),
        f"""WITH k AS (
  SELECT doc_id,
    CAST('0x' || substr(md5('{pipeline.SPLIT_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10000 AS split_key,
    CAST('0x' || substr(md5('{pipeline.SHARD_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) AS skey,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), a AS (
  SELECT doc_id,
    CASE WHEN split_key < {pipeline.SPLIT_CUTS[0][1]} THEN 'train'
         WHEN split_key < {pipeline.SPLIT_CUTS[1][1]} THEN 'val'
         ELSE 'test' END AS split,
    skey % {pipeline.N_SHARDS} AS shard, n_tok, skey
  FROM k
)
SELECT doc_id, split, shard, n_tok,
  CAST(row_number() OVER (PARTITION BY split, shard
                          ORDER BY skey, doc_id) AS INT) AS position
FROM a ORDER BY doc_id""",
    ),
    _q(
        "cross_corpus_dedup",
        lambda spark, sf: pipeline.cross_corpus_dedup(
            views(spark, sf)["documents"], threshold=0.1),
        bench=True,
        oracle=f"""WITH doc0 AS (
  SELECT doc_id, source, text,
    regexp_matches(source, '^src[0-9]$') AS is_ex
  FROM documents
), fps AS (
  SELECT doc_id, is_ex, md5({_NORM}) AS fp FROM doc0
), exact AS (
  SELECT doc_id FROM fps n
  WHERE NOT n.is_ex AND n.fp IN (SELECT fp FROM fps WHERE is_ex)
), words AS (
  SELECT doc_id, is_ex, string_split({_NORM}, ' ') AS w FROM doc0
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, is_ex, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), cold AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), common AS (
  SELECT a.doc_id AS new_id, b.doc_id AS ex_id, count(*) AS n_common
  FROM (SELECT s.* FROM sh s JOIN cold USING (shingle) WHERE NOT s.is_ex) a
  JOIN (SELECT * FROM sh WHERE is_ex) b ON a.shingle = b.shingle
  GROUP BY 1, 2
), best AS (
  SELECT doc_id, round(max(j), 6) AS best_jaccard FROM (
    SELECT new_id AS doc_id,
      n_common / (sn.n_sh + se.n_sh - n_common) AS j
    FROM common
    JOIN sizes sn ON sn.doc_id = new_id
    JOIN sizes se ON se.doc_id = ex_id
  ) WHERE j >= 0.1 GROUP BY 1
)
SELECT d.doc_id, d.source,
  coalesce(e.hit, FALSE) AS exact_dup, b.best_jaccard,
  CASE WHEN coalesce(e.hit, FALSE) THEN 'exact_dup'
       WHEN b.best_jaccard IS NOT NULL THEN 'near_dup'
       ELSE 'unique' END AS verdict
FROM doc0 d
LEFT JOIN (SELECT doc_id, TRUE AS hit FROM exact) e USING (doc_id)
LEFT JOIN best b USING (doc_id)
WHERE NOT d.is_ex
ORDER BY d.doc_id""",
    ),
]

def _minhash_sig_sql() -> str:
    """The 32 Carter-Wegman minima as a DuckDB list literal body."""
    return ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % 2147483647))"
        for a, b in dedup.perm_consts())


# shared minhash prelude: normalized 3-word shingles -> 28-bit md5 base
# hashes -> 32 Carter-Wegman minima -> 8 md5 band-buckets.  Used by the
# dedup_minhash_lsh and lsh_bucket_stats oracles.
_MINHASH_BANDS_CTES = f"""WITH words AS (
  SELECT doc_id, string_split({{norm}}, ' ') AS w FROM documents
  WHERE len(string_split({{norm}}, ' ')) >= 3
), hs AS (
  SELECT doc_id, list_transform(
    list_distinct(list_transform(
      range(1, greatest(len(w) - 2, 0) + 1),
      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])),
    s -> CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT)) AS hs
  FROM words
), sig AS (
  SELECT doc_id, [{{sig_body}}] AS sig FROM hs
), bands AS (
  SELECT doc_id, sig, band,
    md5(concat_ws(',', sig[band * 4 + 1], sig[band * 4 + 2],
                  sig[band * 4 + 3], sig[band * 4 + 4])) AS bucket
  FROM (SELECT doc_id, sig, unnest(range(8)) AS band FROM sig)
)"""


def _simhash_sums_sql() -> str:
    return ", ".join(
        f"sum(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(dedup.SIM_BITS))


def _simhash_combine_sql() -> str:
    return " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE CAST(0 AS BIGINT) END)"
        for i in range(dedup.SIM_BITS))


# Shared recursive-CTE pipeline replaying duplicate_clusters in DuckDB
# (exact-fingerprint contraction -> capped-bucket Jaccard pairs between
# distinct contents -> transitive closure -> expanded membership);
# reused by dedup_clusters (full membership) and dedup_cluster_stats
# (size distribution over the same membership).
_CLUSTERS_CTE = f"""WITH RECURSIVE fps AS (
  SELECT doc_id, md5({_NORM}) AS fp FROM documents
), grp AS (
  SELECT fp, min(doc_id) AS rep, count(*) AS sz FROM fps GROUP BY fp
), words AS (
  SELECT g.rep, string_split({_NORM}, ' ') AS w
  FROM documents d JOIN grp g ON g.rep = d.doc_id
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT rep, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT rep, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.rep AS doc_a, b.rep AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.rep < b.rep
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.rep = doc_a
  JOIN sizes sb ON sb.rep = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach AS (
  SELECT DISTINCT a AS doc_id, a AS root FROM edges
  UNION
  SELECT e.b AS doc_id, r.root FROM reach r JOIN edges e ON e.a = r.doc_id
), repc AS (
  SELECT doc_id AS rep, min(root) AS cluster_id FROM reach GROUP BY 1
), members AS (
  SELECT f.doc_id,
    coalesce(r.cluster_id, g.rep) AS cluster_id,
    coalesce(r.cluster_id, g.rep) = f.doc_id AS is_keeper
  FROM fps f JOIN grp g USING (fp) LEFT JOIN repc r ON r.rep = g.rep
  WHERE g.sz >= 2 OR r.cluster_id IS NOT NULL
)"""


DEDUP_QUERIES = [
    _q(
        "dedup_exact",
        lambda spark, sf: dedup.exact_duplicates(views(spark, sf)["documents"]),
        f"""SELECT md5({_NORM}) AS fingerprint, count(*) AS n_dups,
  min(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""",
    ),
    _q(
        "dedup_ngram_jaccard",
        lambda spark, sf: dedup.ngram_jaccard_pairs(
            views(spark, sf)["documents"], threshold=0.1),
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
  round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
ORDER BY 1, 2""",
        bench=True,
    ),
    _q(
        "dedup_threshold_sweep",
        lambda spark, sf: dedup.dedup_threshold_sweep(
            views(spark, sf)["documents"], floor=0.05),
        oracle=f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.05
), hist AS (
  SELECT floor(jaccard * 10) / 10 AS jaccard_floor,
    count(*) AS n_pairs
  FROM pairs GROUP BY 1
)
SELECT jaccard_floor, n_pairs,
  CAST(sum(n_pairs) OVER (ORDER BY jaccard_floor DESC) AS BIGINT)
    AS n_pairs_at_or_above
FROM hist ORDER BY jaccard_floor""",
    ),
    _q(
        "paragraph_dedup",
        lambda spark, sf: dedup.paragraph_dedup(
            views(spark, sf)["documents"], para_words=20),
        # first occurrence per paragraph fingerprint = rank-1 over
        # (doc_id, para_idx); survival stats per document
        oracle=f"""WITH w AS (
  SELECT doc_id, string_split_regex(trim({_NORM}), ' +') AS ws
  FROM documents WHERE trim({_NORM}) <> ''
), ix AS (
  SELECT doc_id, ws,
    unnest(range(0, CAST(ceil(len(ws) / 20.0) AS BIGINT))) AS i
  FROM w
), e AS (
  SELECT doc_id, CAST(i AS INT) AS para_idx,
    md5(array_to_string(ws[(i * 20 + 1):(i * 20 + 20)], ' ')) AS fp
  FROM ix
), r AS (
  SELECT doc_id, para_idx,
    (row_number() OVER (PARTITION BY fp ORDER BY doc_id, para_idx) = 1)
    ::INT AS kept
  FROM e
)
SELECT doc_id, count(*) AS n_paras,
  CAST(sum(kept) AS BIGINT) AS n_kept,
  CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped,
  round(sum(kept) / count(*), 6) AS frac_kept
FROM r GROUP BY doc_id ORDER BY doc_id""",
    ),
    _q(
        "dedup_clusters",
        lambda spark, sf: dedup.duplicate_clusters(
            views(spark, sf)["documents"], threshold=0.1),
        bench=True,
        # exact-fingerprint contraction (r5) -> rep-level pairs ->
        # connected components via recursive transitive closure;
        # cluster_id = min doc_id of the expanded component (group reps
        # are group minima, so the component min survives contraction);
        # exact-dup families (sz >= 2) are clusters by definition
        oracle=f"""{_CLUSTERS_CTE}
SELECT doc_id, cluster_id, is_keeper FROM members ORDER BY doc_id""",
    ),
    _q(
        "dedup_minhash_lsh",
        lambda spark, sf: dedup.minhash_lsh_pairs(
            views(spark, sf)["documents"], threshold=0.1),
        # replays the exact md5->28-bit->Carter-Wegman pipeline with the
        # same literal (a, b) constants the Spark plan inlines
        _MINHASH_BANDS_CTES.format(norm=_NORM, sig_body=_minhash_sig_sql())
        + """, ok AS (
  SELECT band, bucket FROM bands GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND 200
), bf AS (
  SELECT bands.* FROM bands JOIN ok USING (band, bucket)
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.sig AS sa, b.sig AS sb
  FROM bf a JOIN bf b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
  round(len(list_filter(list_zip(sa, sb), x -> x[1] = x[2])) / 32.0, 6)
    AS est_jaccard
FROM cands
WHERE len(list_filter(list_zip(sa, sb), x -> x[1] = x[2])) / 32.0 >= 0.1
ORDER BY 1, 2""",
        bench=True,
    ),
    _q(
        "dedup_simhash",
        lambda spark, sf: dedup.simhash_pairs(views(spark, sf)["documents"]),
        f"""WITH tok AS (
  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS w
        FROM documents)
  WHERE w <> ''
), agg AS (
  SELECT doc_id, {_simhash_sums_sql()}
  FROM tok GROUP BY 1
), sig AS (
  SELECT doc_id, {_simhash_combine_sql()} AS simhash FROM agg
), blocks AS (
  SELECT doc_id, simhash, blk,
    (simhash >> (blk * 15)) & 32767 AS val
  FROM (SELECT doc_id, simhash, unnest(range(4)) AS blk FROM sig)
), ok AS (
  SELECT blk, val FROM blocks GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND 200
), bf AS (
  SELECT blocks.* FROM blocks JOIN ok USING (blk, val)
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.simhash AS ha, b.simhash AS hb
  FROM bf a JOIN bf b
    ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cands WHERE bit_count(xor(ha, hb)) <= 8 ORDER BY 1, 2""",
    ),
    _q(
        "dedup_winnowing",
        lambda spark, sf: dedup.winnowing_pairs(views(spark, sf)["documents"]),
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, pos, w[pos] || ' ' || w[pos + 1] || ' ' || w[pos + 2] AS gram
  FROM (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 2, 0) + 1)) AS pos
        FROM words)
), fps AS (
  SELECT DISTINCT doc_id,
    min(CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT))
      OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
  FROM grams
), ok AS (
  SELECT fp FROM fps GROUP BY 1 HAVING count(*) >= 2 AND count(*) <= 200
), f2 AS (
  SELECT fps.* FROM fps JOIN ok USING (fp)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  count(*) AS shared_fingerprints
FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2""",
    ),
]

_DOT = ("list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))")


# The gate fixture's embeddings corpus holds 500 vectors at BOTH gate
# scales (sf0.001 and sf0.01 ship the same embeddings table), so the
# corpus-sized index constants the auto-sizing laws produce are known
# at oracle-construction time.  The asserts keep the static oracle SQL
# honest: if the laws or the fixture drift, import fails loudly instead
# of the gate silently comparing mismatched index geometries.
_GATE_EMB_N = 500
assert similarity.suggest_n_centroids(_GATE_EMB_N) == similarity.N_CENTROIDS
assert (similarity.suggest_band_bits(_GATE_EMB_N)
        == similarity.NEAR_DUP_BAND_BITS)

# The sf0.1 embeddings corpus ships 2000 vectors; _lsh_sig_adaptive_sql
# enumerates exactly the two shipped sizes, so the big branch's plane
# width is tied to THIS constant (ADVICE r5: a drifted sf0.1 fixture
# must fail loudly, not silently compare mismatched geometries —
# tools/gate_check.py cross-checks the actual fixture count at startup).
_SF01_EMB_N = 2000
assert similarity.suggest_n_planes(_SF01_EMB_N) == 9, \
    "sig_big plane width drifted from the suggest_n_planes law"


def _lsh_sig_sql(vec: str, n_planes: int | None = None) -> str:
    """DuckDB expression for the hyperplane signature, inlining the same
    literal ±1 coefficient arrays the Spark plan embeds."""
    terms = []
    for p, row in enumerate(similarity.plane_coeffs(
            n_planes if n_planes is not None else similarity.N_PLANES)):
        lits = "[" + ", ".join(str(c) for c in row) + "]"
        terms.append(
            f"(CASE WHEN {_DOT.format(a=vec, b=lits)} >= 0"
            f" THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


def _lsh_sig_adaptive_sql(vec: str) -> str:
    """Signature expression following the suggest_n_planes law across
    BOTH shipped embedding corpora (500 vectors at the gate scales ->
    7 planes; 2000 at sf0.1 -> 9): static SQL cannot vary its
    expression SHAPE with the data, so the two law outcomes are
    enumerated in a CASE on the corpus count — the same two sizes the
    import-time asserts pin."""
    sig_small = _lsh_sig_sql(vec, similarity.suggest_n_planes(_GATE_EMB_N))
    sig_big = _lsh_sig_sql(vec, similarity.suggest_n_planes(_SF01_EMB_N))
    return (f"CASE WHEN (SELECT count(*) FROM embeddings) <= {_GATE_EMB_N}"
            f" THEN ({sig_small}) ELSE ({sig_big}) END")


def _band_sig_sql(vec: str, planes: list[list[float]]) -> str:
    """DuckDB expression for one band signature over an explicit plane
    slice (mirrors similarity._sig_from_planes bit weights)."""
    terms = []
    for p, row in enumerate(planes):
        lits = "[" + ", ".join(str(c) for c in row) + "]"
        terms.append(
            f"(CASE WHEN {_DOT.format(a=vec, b=lits)} >= 0"
            f" THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


def _band_array_sql(vec: str) -> str:
    """DuckDB list of the NEAR_DUP_BANDS band signatures (same literal
    hyperplanes as similarity.band_signatures)."""
    nb, bb = similarity.NEAR_DUP_BANDS, similarity.NEAR_DUP_BAND_BITS
    planes = similarity.plane_coeffs(n_planes=nb * bb)
    bands = [_band_sig_sql(vec, planes[b * bb:(b + 1) * bb])
             for b in range(nb)]
    return "[" + ", ".join(bands) + "]"


SIMILARITY_QUERIES = [
    _q(
        "knn_bruteforce",
        lambda spark, sf: similarity.knn_bruteforce(
            views(spark, sf)["embeddings"], [0, 1, 2], k=10),
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (0, 1, 2)
), scored AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6) AS cos_sim
  FROM embeddings, q WHERE vec_id <> query_id
)
SELECT query_id, rank, vec_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cos_sim DESC, vec_id) AS rank FROM scored
) WHERE rank <= 10 ORDER BY query_id, rank""",
        bench=True,
    ),
    _q(
        "knn_lsh",
        # n_planes defaults to None -> suggest_n_planes(corpus count):
        # the gate exercises the auto-sizing path end-to-end
        lambda spark, sf: similarity.knn_lsh(
            views(spark, sf)["embeddings"], [0, 1, 2], k=10),
        # same literal hyperplanes as the Spark plan (plane_coeffs at
        # the law-suggested width for the gate corpus), so the
        # signature/bucket math is replayed exactly in DuckDB
        f"""WITH sig AS (
  SELECT vec_id, embedding,
    ({_lsh_sig_adaptive_sql('embedding')})
    AS sig
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qe, sig AS qsig FROM sig
  WHERE vec_id IN (0, 1, 2)
), cand AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6) AS cos_sim
  FROM sig, q
  WHERE bit_count(xor(sig, qsig)) <= 2 AND vec_id <> query_id
)
SELECT query_id, rank, vec_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cos_sim DESC, vec_id) AS rank FROM cand
) WHERE rank <= 10 ORDER BY query_id, rank""",
    ),
    _q(
        "knn_ivf",
        # n_centroids defaults to None -> suggest_n_centroids(corpus
        # count), pinned to N_CENTROIDS=16 for the gate corpus by the
        # import-time assert — the gate exercises the auto-sizing path
        lambda spark, sf: similarity.knn_ivf(
            views(spark, sf)["embeddings"], [20, 21, 22], k=10),
        # assignment tie-break mirrors array_max over struct(dot, id):
        # higher dot wins, ties -> higher centroid_id (DESC)
        f"""WITH ncent AS (
  -- suggest_n_centroids in SQL: ~sqrt(n) rounded HALF-EVEN to a
  -- power of two, clamped to [4, 65536].  Explicit banker's rounding
  -- (not DuckDB round(), which is half-away) so n = 2^odd corpora
  -- (512, 2048, ...) agree with python round() (ADVICE r7)
  SELECT greatest(4, least(65536, CAST(power(2,
    floor(x) + CASE WHEN x - floor(x) > 0.5 THEN 1
      WHEN x - floor(x) = 0.5 THEN CAST(floor(x) AS BIGINT) % 2
      ELSE 0 END) AS BIGINT))) AS nc
  FROM (SELECT log2(greatest(sqrt(count(*) * 1.0), 4)) AS x
        FROM embeddings)
), cents AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings, ncent
  WHERE vec_id < nc
), assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_DOT.format(a='e.embedding', b='c.c')} DESC,
                 c.centroid_id DESC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (20, 21, 22)
), probe AS (
  SELECT query_id, qe, centroid_id FROM (
    SELECT q.query_id, q.qe, c.centroid_id,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY {_DOT.format(a='q.qe', b='c.c')} DESC,
                 c.centroid_id ASC) AS rn
    FROM q, cents c
  ) WHERE rn <= 2
), cand AS (
  SELECT p.query_id, a.vec_id,
    round({_DOT.format(a='p.qe', b='a.embedding')}
      / (sqrt({_DOT.format(a='p.qe', b='p.qe')})
         * sqrt({_DOT.format(a='a.embedding', b='a.embedding')})), 6) AS cos_sim
  FROM assigned a JOIN probe p ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, rank, vec_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cos_sim DESC, vec_id) AS rank FROM cand
) WHERE rank <= 10 ORDER BY query_id, rank""",
    ),
    _q(
        "embedding_near_dup",
        lambda spark, sf: similarity.embedding_near_dup_pairs(
            views(spark, sf)["embeddings"], threshold=0.4),
        # banded-LSH candidates: the OR over band-signature equalities is
        # the oracle twin of the Spark (band, sig) equi-join; a join row
        # appears once per pair regardless of how many bands match, so no
        # DISTINCT is needed
        f"""WITH sigs AS (
  SELECT vec_id, embedding, {_band_array_sql('embedding')} AS bands
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  round({_DOT.format(a='a.embedding', b='b.embedding')}
    / (sqrt({_DOT.format(a='a.embedding', b='a.embedding')})
       * sqrt({_DOT.format(a='b.embedding', b='b.embedding')})), 6) AS cos_sim
FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
 AND ({' OR '.join(f'a.bands[{i + 1}] = b.bands[{i + 1}]'
                   for i in range(similarity.NEAR_DUP_BANDS))})
WHERE round({_DOT.format(a='a.embedding', b='b.embedding')}
    / (sqrt({_DOT.format(a='a.embedding', b='a.embedding')})
       * sqrt({_DOT.format(a='b.embedding', b='b.embedding')})), 6) >= 0.4
ORDER BY 1, 2""",
    ),
    _q(
        "semantic_dedup",
        # band_bits defaults to None -> suggest_band_bits(corpus count),
        # which the import-time assert pins to NEAR_DUP_BAND_BITS for
        # the gate corpus — the gate exercises the auto-sizing path
        lambda spark, sf: similarity.semantic_dedup(
            views(spark, sf)["embeddings"], threshold=0.4),
        # cluster assignment == knn_ivf's argmax (ties -> higher
        # centroid id, matching array_max over (dot, centroid_id));
        # candidates need cluster AND >=1 shared band; dup = any
        # lower-id similar neighbor in-cluster
        f"""WITH sigs AS (
  SELECT vec_id, embedding, {_band_array_sql('embedding')} AS bands
  FROM embeddings
), cents AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings
  WHERE vec_id < 16
), assigned AS (
  SELECT vec_id, embedding, bands, centroid_id AS cluster FROM (
    SELECT s.vec_id, s.embedding, s.bands, c.centroid_id,
      row_number() OVER (PARTITION BY s.vec_id
        ORDER BY {_DOT.format(a='s.embedding', b='c.c')} DESC,
                 c.centroid_id DESC) AS rn
    FROM sigs s, cents c
  ) WHERE rn = 1
), dups AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b ON a.cluster = b.cluster
   AND a.vec_id < b.vec_id
   AND ({' OR '.join(f'a.bands[{i + 1}] = b.bands[{i + 1}]'
                     for i in range(similarity.NEAR_DUP_BANDS))})
  WHERE round({_DOT.format(a='a.embedding', b='b.embedding')}
      / (sqrt({_DOT.format(a='a.embedding', b='a.embedding')})
         * sqrt({_DOT.format(a='b.embedding', b='b.embedding')})), 6)
      >= 0.4
)
SELECT vec_id, cluster,
  vec_id NOT IN (SELECT vec_id FROM dups) AS is_kept
FROM assigned ORDER BY vec_id""",
        bench=True,
    ),
    _q(
        "embedding_norms",
        lambda spark, sf: similarity.embedding_norms(
            views(spark, sf)["embeddings"]),
        f"""SELECT label, count(*) AS n, round(avg(norm), 6) AS avg_norm
FROM (SELECT label,
        round(sqrt({_DOT.format(a='embedding', b='embedding')}), 6) AS norm
      FROM embeddings)
GROUP BY 1 ORDER BY 1""",
    ),
]

MULTIMODAL_QUERIES = [
    _q(
        "media_summary",
        lambda spark, sf: multimodal.media_summary(
            multimodal.as_media_table(views(spark, sf)["documents"])),
        """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
         WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
  count(*) AS n, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
  CAST(min(octet_length(encode(text))) AS BIGINT) AS min_bytes,
  CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "media_features",
        # canonical scalar form (exploded integer histogram) so the
        # driver's canonicalizer never sees an array cell; the raw
        # array-valued extract_features stays the API surface
        lambda spark, sf: multimodal.features_canonical(
            multimodal.as_media_table(views(spark, sf)["documents"])),
        # the fake decoder is UTF-8 byte math over ASCII fixtures, so
        # DuckDB replays it exactly: bin = byte//16, per-doc byte sums
        """WITH pos AS (
  SELECT doc_id, text,
    unnest(generate_series(1, length(text))) AS i
  FROM documents
), bytes AS (
  SELECT doc_id, unicode(substr(text, i, 1)) AS b FROM pos
), counts AS (
  SELECT doc_id, b // 16 AS bin, count(*) AS c FROM bytes GROUP BY 1, 2
), sums AS (
  SELECT doc_id, CAST(sum(b) AS BIGINT) AS byte_sum FROM bytes GROUP BY 1
), spine AS (
  SELECT doc_id, CAST(unnest(generate_series(0, 15)) AS INT) AS bin
  FROM documents
), meta AS (
  SELECT doc_id,
    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
    CAST(octet_length(encode(text)) AS BIGINT) AS payload_len
  FROM documents
)
SELECT m.doc_id, m.media_type, m.payload_len, s.bin,
  CAST(coalesce(c.c, 0) AS BIGINT) AS bin_count, su.byte_sum
FROM meta m JOIN spine s USING (doc_id)
LEFT JOIN counts c ON c.doc_id = s.doc_id AND c.bin = s.bin
JOIN sums su ON su.doc_id = m.doc_id
ORDER BY m.doc_id, s.bin""",
        bench=True,
    ),
    _q(
        "media_frame_sample",
        lambda spark, sf: multimodal.media_frame_sample(
            multimodal.as_media_table(views(spark, sf)["documents"])),
        """WITH v AS (
  SELECT doc_id,
    greatest(octet_length(encode(text)) // 256, 1) AS n_frames
  FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
)
SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
  CAST(frame_index AS INT) AS frame_index,
  CAST(frame_index * 256 AS BIGINT) AS byte_offset
FROM (
  SELECT doc_id, n_frames,
    unnest(CASE WHEN n_frames <= 4
      THEN range(0, CAST(n_frames AS BIGINT))
      ELSE [0, (n_frames - 1) // 3, 2 * (n_frames - 1) // 3, n_frames - 1]
    END) AS frame_index
  FROM v
) ORDER BY doc_id, frame_index""",
    ),
    _q(
        "media_resize",
        # canonical scalar form: one row per pooled block with exact
        # integer block sums (no array cells for the canonicalizer)
        lambda spark, sf: multimodal.resize_canonical(
            multimodal.as_media_table(views(spark, sf)["documents"])),
        # linspace edges == floor(j*n/8) for these payload sizes, so the
        # block-mean pooling replays as integer range sums in DuckDB
        """WITH pos AS (
  SELECT doc_id, text,
    unnest(generate_series(1, length(text))) AS i
  FROM documents
), bytes AS (
  SELECT doc_id, i - 1 AS p, unicode(substr(text, i, 1)) AS b FROM pos
), meta AS (
  SELECT doc_id,
    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
      WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
    octet_length(encode(text)) AS n
  FROM documents
), blocks AS (
  SELECT doc_id, media_type, CAST(j AS INT) AS block,
    (j * n) // 8 AS lo, ((j + 1) * n) // 8 AS hi
  FROM meta, (SELECT unnest(generate_series(0, 7)) AS j)
)
SELECT k.doc_id, k.media_type, k.block,
  CAST(k.hi - k.lo AS BIGINT) AS block_len,
  CAST(sum(b.b) AS BIGINT) AS block_sum
FROM blocks k
JOIN bytes b ON b.doc_id = k.doc_id AND b.p >= k.lo AND b.p < k.hi
GROUP BY k.doc_id, k.media_type, k.block, k.hi, k.lo
ORDER BY k.doc_id, k.block""",
    ),
]

# ---------------------------------------------------------------------------
# FSO tree + data-plane operators (S4, J7, B2, S12, O4, P8, E2, §2.10)
# ---------------------------------------------------------------------------

_ACL_PREFIXES = ["/vol1/b1/f/", "/vol1/b1/f/y1995/", "/vol1/b1/", "/vol2/"]
_ACL_IN = ", ".join(f"'{p}'" for p in _ACL_PREFIXES)

FSO_QUERIES = [
    _q(
        "fso_list_status",
        lambda spark, sf: fso.list_status(
            views(spark, sf)["directories"], views(spark, sf)["keys"],
            "/vol1/b1/f/y1996", max_entries=30),
        with_views(
            """SELECT name, entry_type, data_size FROM (
  SELECT name, 'DIR' AS entry_type, CAST(NULL AS BIGINT) AS data_size
  FROM directories WHERE parent_path = '/vol1/b1/f/y1996'
  UNION ALL
  SELECT regexp_extract(key_name, '[^/]+$'), 'FILE', data_size
  FROM keys WHERE regexp_replace(db_key, '/[^/]+$', '') = '/vol1/b1/f/y1996'
) ORDER BY name LIMIT 30""",
            ["keys", "directories"],
        ),
    ),
    _q(
        "fso_dir_delete_expansion",
        lambda spark, sf: fso.directory_delete_expansion(
            views(spark, sf)["directories"], views(spark, sf)["keys"],
            "/vol1/b1/f"),
        with_views(
            """SELECT entry_type, path FROM (
  SELECT 'DIR' AS entry_type, '/vol1/b1/f' AS path
  UNION ALL
  -- materialized paths: the BFS fixpoint over the adjacency list equals
  -- the prefix match, at any tree depth
  SELECT 'DIR', path FROM directories WHERE path LIKE '/vol1/b1/f/%'
  UNION ALL
  SELECT 'FILE', db_key FROM keys WHERE db_key LIKE '/vol1/b1/f/%'
) ORDER BY entry_type, path""",
            ["keys", "directories"],
        ),
    ),
    _q(
        "fso_resolve_subtree",
        lambda spark, sf: fso.resolve_subtree(
            views(spark, sf)["directories"], views(spark, sf)["keys"],
            "/vol1/b1/f"),
        with_views(
            """SELECT * FROM
  (SELECT count(*) AS n_dirs FROM directories
   WHERE path = '/vol1/b1/f' OR path LIKE '/vol1/b1/f/%'),
  (SELECT count(*) AS n_files,
          CAST(COALESCE(sum(data_size), 0) AS BIGINT) AS total_bytes
   FROM keys WHERE db_key LIKE '/vol1/b1/f/%')""",
            ["keys", "directories"],
        ),
    ),
    _q(
        "rename_subtree",
        lambda spark, sf: fso.rename_subtree(
            views(spark, sf)["keys"], "/vol1/b1/o/", "/vol1/b1/archived/"),
        with_views(
            """SELECT db_key AS old_key,
  '/vol1/b1/archived/' || substr(db_key, 12) AS new_key, data_size
FROM keys WHERE db_key LIKE '/vol1/b1/o/%'""",
            ["keys"],
        ),
    ),
    _q(
        "range_read_plan",
        lambda spark, sf: datapath.range_read_plan(
            views(spark, sf)["locations"], 1000, 60000),
        with_views(
            """SELECT object_id, block_seq, container_id,
  CAST(greatest(1000 - block_offset, 0) AS BIGINT) AS read_start,
  CAST(least(block_len, 60000 - block_offset)
       - greatest(1000 - block_offset, 0) AS BIGINT) AS read_len
FROM locations
WHERE block_offset < 60000 AND block_offset + block_len > 1000
  AND least(block_len, 60000 - block_offset)
      - greatest(1000 - block_offset, 0) > 0
ORDER BY object_id, block_seq""",
            ["locations"],
        ),
    ),
    _q(
        "lookup_key",
        # point read of the key with object_id 7 (present at every SF);
        # the db_key literal is resolved the same way on both sides
        lambda spark, sf: datapath.lookup_key_blocks(
            views(spark, sf)["keys"], views(spark, sf)["locations"],
            views(spark, sf)["keys"]
            .where("object_id = 7").select("db_key").first()[0]),
        with_views(
            """SELECT k.db_key, k.object_id, k.data_size,
  l.block_seq, l.container_id, l.local_id, l.block_len, l.block_offset
FROM keys k JOIN locations l USING (object_id)
WHERE k.object_id = 7 ORDER BY l.block_seq""",
            ["keys", "locations"],
        ),
    ),
    _q(
        "multipart_etag",
        lambda spark, sf: datapath.multipart_etag(views(spark, sf)["locations"]),
        with_views(
            """SELECT object_id, count(*) AS n_parts,
  md5(string_agg(md5(CAST(local_id AS VARCHAR)), ''
      ORDER BY block_seq, md5(CAST(local_id AS VARCHAR)))) AS etag
FROM locations GROUP BY object_id ORDER BY object_id""",
            ["locations"],
        ),
    ),
    _q(
        "topology_sorted_replicas",
        lambda spark, sf: datapath.topology_sorted_replicas(
            views(spark, sf)["replicas"], views(spark, sf)["datanodes"]),
        # generalized tree distance to client /dc0/rack0/client replayed
        # on the 3-level fixture: common-prefix length over the path
        # components, each side pays (depth - common)
        with_views(
            """SELECT container_id, datanode, rack, distance, replica_idx,
  row_number() OVER (PARTITION BY container_id
    ORDER BY distance, datanode, replica_idx) AS read_order
FROM (
  SELECT r.container_id, r.datanode, d.rack, r.replica_idx,
    CASE WHEN d.topology_path = '/dc0/rack0/client' THEN 0
         ELSE (3 - c.common) + (3 - c.common) END AS distance
  FROM replicas r JOIN datanodes d USING (datanode),
  LATERAL (SELECT CASE
      WHEN string_split(d.topology_path, '/')[2] <> 'dc0' THEN 0
      WHEN string_split(d.topology_path, '/')[3] <> 'rack0' THEN 1
      WHEN string_split(d.topology_path, '/')[4] <> 'client' THEN 2
      ELSE 3 END AS common) c
)
ORDER BY container_id, read_order""",
            ["replicas", "datanodes"],
        ),
    ),
    _q(
        "longest_prefix_acl",
        lambda spark, sf: datapath.longest_prefix_acl(
            views(spark, sf)["keys"], _ACL_PREFIXES),
        with_views(
            f"""SELECT db_key, arg_max(prefix, length(prefix)) AS acl_prefix
FROM keys, (SELECT unnest([{_ACL_IN}]) AS prefix)
WHERE starts_with(db_key, prefix)
GROUP BY db_key ORDER BY db_key""",
            ["keys"],
        ),
    ),
    _q(
        "ec_read_plan",
        lambda spark, sf: datapath.ec_read_plan(
            views(spark, sf)["locations"], views(spark, sf)["containers"]),
        with_views(
            """SELECT object_id, n_blocks, n_avail, n_missing_data, n_parity_avail,
  CASE WHEN n_missing_data = 0 THEN 'DIRECT'
       WHEN n_missing_data <= n_parity_avail THEN 'RECONSTRUCT'
       ELSE 'UNRECOVERABLE' END AS status
FROM (
  SELECT object_id, count(*) AS n_blocks,
    CAST(sum(avail) AS BIGINT) AS n_avail,
    CAST(sum(CASE WHEN is_data AND avail = 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_missing_data,
    CAST(sum(CASE WHEN NOT is_data AND avail = 1 THEN 1 ELSE 0 END) AS BIGINT)
      AS n_parity_avail
  FROM (
    SELECT l.object_id, l.block_seq % 5 < 3 AS is_data,
      CASE WHEN c.container_id IS NOT NULL THEN 1 ELSE 0 END AS avail
    FROM locations l
    LEFT JOIN (SELECT container_id FROM containers WHERE state <> 'DELETED') c
      USING (container_id)
    WHERE l.object_id % 5 = 0
  ) GROUP BY 1
) ORDER BY object_id""",
            ["locations", "containers"],
        ),
    ),
    _q(
        "ec_reconstruction_plan",
        lambda spark, sf: datapath.ec_reconstruction_plan(
            views(spark, sf)["locations"], views(spark, sf)["containers"]),
        with_views(
            """WITH blocks AS (
  SELECT l.object_id, l.block_seq, l.container_id, l.block_len,
    l.block_seq % 5 AS unit,
    l.block_seq % 5 < 3 AS is_data,
    c.container_id IS NOT NULL AS avail
  FROM locations l
  LEFT JOIN (SELECT container_id FROM containers WHERE state <> 'DELETED') c
    USING (container_id)
  WHERE l.object_id % 5 = 0
), flagged AS (
  SELECT *,
    sum(CASE WHEN is_data AND NOT avail THEN 1 ELSE 0 END)
      OVER (PARTITION BY object_id) AS n_missing_data,
    sum(CASE WHEN NOT is_data AND avail THEN 1 ELSE 0 END)
      OVER (PARTITION BY object_id) AS n_parity_avail
  FROM blocks
), ranked AS (
  SELECT *, CASE WHEN avail THEN row_number() OVER (
      PARTITION BY object_id
      ORDER BY CAST(avail AS INT) DESC, CAST(is_data AS INT) DESC,
               unit, block_seq, container_id, block_len) END AS src_rank
  FROM flagged
  WHERE n_missing_data > 0 AND n_missing_data <= n_parity_avail
)
SELECT object_id,
  CAST(max(n_missing_data) AS BIGINT) AS n_missing_data,
  array_to_string(list_sort(list(DISTINCT
    CASE WHEN is_data AND NOT avail THEN unit END)
    FILTER (is_data AND NOT avail)), ',') AS missing_units,
  CAST(sum(CASE WHEN src_rank <= 3 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_sources,
  CAST(sum(CASE WHEN src_rank <= 3 THEN block_len ELSE 0 END) AS BIGINT)
    AS decode_read_bytes
FROM ranked GROUP BY 1 ORDER BY object_id""",
            ["locations", "containers"],
        ),
    ),
    _q(
        "unique_snapshot_objects",
        lambda spark, sf: datapath.unique_snapshot_objects(
            views(spark, sf)["snap1"], views(spark, sf)["snap2"]),
        with_views(
            """SELECT volume, bucket, count(*) AS n_objects FROM (
  SELECT DISTINCT volume, bucket, object_id FROM (
    SELECT volume, bucket, object_id FROM snap1
    UNION ALL SELECT volume, bucket, object_id FROM snap2))
GROUP BY 1, 2 ORDER BY 1, 2""",
            ["snap1", "snap2"],
        ),
    ),
]

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

# ---------------------------------------------------------------------------
# streaming plane (ST1-ST6): drained streams returned as batch results
# ---------------------------------------------------------------------------

_stream_seq = [0]


def _cdc_incremental_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1-ST5 end-to-end: synthesize the CDC log from the key table,
    drain it with AvailableNow maintaining the histogram incrementally,
    return the materialized view (oracle: batch recompute over the final
    key state — the process()==reprocess() contract)."""
    import tempfile

    from ozone_spark.streaming import cdc as scdc

    t = views(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ozs_cdc_gate_")
    scdc.synthesize_cdc_log(t["keys"], t["deleted_keys"], f"{work}/cdc")
    scdc.run_incremental_histogram(spark, f"{work}/cdc", f"{work}/store",
                                   f"{work}/ckpt")
    return spark.read.parquet(f"{work}/store").drop("view_bucket")


def _cdc_namespace_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 for the per-directory size distribution (/namespace/dist):
    incrementally-maintained fileSizeBucket counts (oracle: batch dist
    over the final key state)."""
    import tempfile

    from ozone_spark.streaming import cdc as scdc

    t = views(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ozs_dist_gate_")
    scdc.synthesize_cdc_log(t["keys"], t["deleted_keys"], f"{work}/cdc")
    scdc.run_incremental_namespace_dist(
        spark, f"{work}/cdc", f"{work}/store", f"{work}/ckpt")
    return spark.read.parquet(f"{work}/store").drop("view_bucket")


def _cdc_container_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 for J5: incrementally-maintained container→key index
    (oracle: batch index over the final key state)."""
    import tempfile

    from ozone_spark.streaming import cdc as scdc

    t = views(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ozs_cki_gate_")
    # events carry their block_locations payload (the reference decodes
    # locations from the event itself — OMDBUpdatesHandler.java:71-99),
    # so the index consumer needs no side-table join
    scdc.synthesize_cdc_log(t["keys"], t["deleted_keys"], f"{work}/cdc",
                            locations=t["locations"])
    scdc.run_incremental_container_index(
        spark, f"{work}/cdc", None, f"{work}/store", f"{work}/ckpt")
    return spark.read.parquet(f"{work}/store").drop("view_bucket")


def _streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ozone_spark.streaming import windows as swin
    import tempfile

    _stream_seq[0] += 1
    name = f"gate_tumbling_{_stream_seq[0]}"
    stream = swin.read_events_stream(spark, f"{sf_dir}/events.parquet")
    return swin.drain_to_memory(
        swin.streaming_tumbling_daily(stream), spark, name,
        tempfile.mkdtemp(prefix="ozs_ckpt_"))


def _streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ozone_spark.streaming import windows as swin
    import tempfile

    _stream_seq[0] += 1
    name = f"gate_sessions_{_stream_seq[0]}"
    stream = swin.read_events_stream(spark, f"{sf_dir}/events.parquet")
    return swin.drain_to_memory(
        swin.streaming_sessionize(stream), spark, name,
        tempfile.mkdtemp(prefix="ozs_ckpt_"))


def _streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ozone_spark.streaming import windows as swin
    import tempfile

    _stream_seq[0] += 1
    name = f"gate_sdedup_{_stream_seq[0]}"
    stream = swin.read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    return swin.drain_to_memory(
        swin.streaming_dedup_fingerprints(stream), spark, name,
        tempfile.mkdtemp(prefix="ozs_ckpt_"), output_mode="append",
    ).orderBy("fingerprint")


def _streaming_dedup_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ozone_spark.streaming import windows as swin
    import tempfile

    _stream_seq[0] += 1
    name = f"gate_sdedup_wm_{_stream_seq[0]}"
    # The oracle equivalence (survivors == DISTINCT fingerprints) only
    # holds if every duplicate pair's ingest timestamps fall inside the
    # dedup horizon.  The ingest clock is 1 doc/ms of doc_id, so size
    # the horizon to the corpus's actual doc_id span (one cheap scalar
    # agg) instead of assuming a fixed 1 hour covers it — a corpus with
    # ids more than 3.6M apart (e.g. cross-corpus appends with offset
    # ids) would otherwise let late duplicates survive and break the
    # gate.  Production use keeps the fixed-horizon default: there the
    # horizon is the dedup CONTRACT, not an equivalence to batch
    # distinct.
    import pyspark.sql.functions as F
    span_ms = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .agg((F.max("doc_id") - F.min("doc_id") + 1).alias("s"))
        .collect()[0]["s"]
    )
    stream = swin.read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    return swin.drain_to_memory(
        swin.streaming_dedup_within_watermark(
            stream, horizon=f"{int(span_ms)} milliseconds"),
        spark, name,
        tempfile.mkdtemp(prefix="ozs_ckpt_"), output_mode="append",
    ).orderBy("fingerprint")


def _streaming_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ozone_spark.streaming import windows as swin
    import tempfile

    _stream_seq[0] += 1
    name = f"gate_session_stats_{_stream_seq[0]}"
    stream = swin.read_events_stream(spark, f"{sf_dir}/events.parquet")
    return swin.drain_to_memory(
        swin.streaming_session_stats(stream), spark, name,
        tempfile.mkdtemp(prefix="ozs_ckpt_"), output_mode="append",
    ).orderBy("user_id", "session_start_ms")


STREAMING_QUERIES = [
    _q(
        "cdc_incremental_histogram",
        _cdc_incremental_histogram,
        with_views(
            f"""SELECT volume, bucket, {_FILE_BIN} AS bin_index,
  count(*) AS delta
FROM keys WHERE object_id NOT IN (SELECT object_id FROM deleted_keys)
GROUP BY 1, 2, 3""",
            ["keys", "deleted_keys"],
        ),
    ),
    _q(
        "cdc_incremental_namespace_dist",
        _cdc_namespace_dist,
        with_views(
            f"""WITH anc AS (
  SELECT unnest({_ANC_LIST}) AS dir_path, data_size FROM keys
  WHERE object_id NOT IN (SELECT object_id FROM deleted_keys)
)
SELECT dir_path, {_FILE_BIN} AS bin_index,
  count(*) AS file_count
FROM anc GROUP BY 1, 2""",
            ["keys", "deleted_keys"],
        ),
    ),
    _q(
        "cdc_incremental_container_index",
        lambda spark, sf: _cdc_container_index(spark, sf),
        with_views(
            """SELECT container_id, count(*) AS block_count,
  CAST(sum(block_len) AS BIGINT) AS total_bytes
FROM locations
WHERE object_id NOT IN (SELECT object_id FROM deleted_keys)
GROUP BY 1""",
            ["locations", "deleted_keys"],
        ),
    ),
    _q(
        "streaming_tumbling_daily",
        _streaming_tumbling,
        """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
  count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "streaming_sessionize",
        _streaming_sessions,
        # complete-mode AvailableNow drain emits EVERY session (open +
        # closed), so the oracle is the plain batch gap-sessionization;
        # session_window's end = last event ts + gap
        """WITH e AS (
  SELECT user_id, event_id, value, ts, epoch_ms(ts) AS ms FROM events
), l AS (
  SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS prev FROM e
), s AS (
  SELECT *,
    CASE WHEN prev IS NOT NULL AND ms - prev > 1800000 THEN 1 ELSE 0 END
      AS new_sess
  FROM l
), c AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts,
    event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM s
)
SELECT user_id,
  CAST(min(ms) AS BIGINT) AS session_start_ms,
  CAST(max(ms) + 1800000 AS BIGINT) AS session_end_ms,
  count(*) AS n_events,
  round(sum(value), 4) AS total_value
FROM c GROUP BY user_id, sid
ORDER BY user_id, session_start_ms""",
    ),
    _q(
        "streaming_session_stats",
        _streaming_session_stats,
        # closed sessions only == batch sessionization minus each user's
        # final (still-open) session; payload carries the order-dependent
        # stats (max internal gap, distinct event types) that the custom
        # applyInPandasWithState operator maintains in its state rows
        """WITH e AS (
  SELECT user_id, event_id, event_type, value, ts, epoch_ms(ts) AS ms
  FROM events
), l AS (
  SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    AS prev FROM e
), s AS (
  SELECT *,
    CASE WHEN prev IS NOT NULL AND ms - prev > 1800000 THEN 1 ELSE 0 END
      AS new_sess,
    CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 0 ELSE ms - prev END
      AS gap
  FROM l
), c AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts,
    event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM s
), agg AS (
  SELECT user_id, sid,
    CAST(min(ms) AS BIGINT) AS session_start_ms,
    CAST(max(ms) AS BIGINT) AS session_end_ms,
    count(*) AS n_events,
    round(sum(value), 4) AS total_value,
    CAST(max(gap) AS BIGINT) AS max_gap_ms,
    CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
    max(sid) OVER (PARTITION BY user_id) AS last_sid
  FROM c GROUP BY 1, 2
)
SELECT user_id, session_start_ms, session_end_ms, n_events,
  total_value, max_gap_ms, n_event_types
FROM agg WHERE sid < last_sid
ORDER BY user_id, session_start_ms""",
        bench=True,
    ),
    _q(
        "streaming_dedup",
        _streaming_dedup,
        # the surviving fingerprint SET is deterministic (which doc_id
        # won the state race is not, so only the fingerprint is emitted)
        f"""SELECT DISTINCT md5({_NORM}) AS fingerprint
FROM documents ORDER BY fingerprint""",
    ),
    _q(
        "streaming_dedup_bounded",
        _streaming_dedup_bounded,
        # monotone ingest clock + full drain => survivors == DISTINCT
        f"""SELECT DISTINCT md5({_NORM}) AS fingerprint
FROM documents ORDER BY fingerprint""",
    ),
    _q(
        "skewed_event_totals",
        lambda spark, sf: _skewed_event_totals(spark, sf),
        # salting invariant: the two-stage salted aggregation equals the
        # plain GROUP BY (the salt only redistributes partial state)
        """SELECT event_type, count(*) AS count,
  round(sum(value), 4) AS sum_value
FROM events GROUP BY 1 ORDER BY 1""",
    ),
]


def _skewed_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation demo on the hottest real key (event_type:
    a handful of values over the whole table — exactly the shape where
    one reducer melts at 100 TB without salting)."""
    import pyspark.sql.functions as F

    from ozone_spark.functions.skew import salted_sum_count
    ev = views(spark, sf_dir)["events"]
    agg = salted_sum_count(ev, ["event_type"], ["value"])
    return (
        agg.select("event_type", "count",
                   F.round("sum_value", 4).alias("sum_value"))
        .orderBy("event_type")
    )

# ---------------------------------------------------------------------------
# ACL evaluation (P8 neighborhood) + growth view (CLUSTER_GROWTH_DAILY)
# ---------------------------------------------------------------------------

from ozone_spark.operators import acl as aclops  # noqa: E402

ACL_GROWTH_QUERIES = [
    _q(
        "acl_effective_rights",
        lambda spark, sf: aclops.effective_acls(
            views(spark, sf)["keys"], views(spark, sf)["acl_entries"]),
        with_views(
            """WITH anc AS (
  SELECT db_key, unnest(list_transform(
    range(2, len(string_split(db_key, '/')) + 1),
    i -> '/' || array_to_string(string_split(db_key, '/')[2:i], '/')))
    AS path
  FROM keys
)
SELECT db_key, entity_type, entity,
  (SELECT string_agg(r, '' ORDER BY r) FROM
     (SELECT DISTINCT unnest(rights_list) AS r)) AS rights
FROM (
  SELECT anc.db_key, a.entity_type, a.entity, list(a."right") AS rights_list
  FROM anc JOIN acl_entries a USING (path)
  GROUP BY 1, 2, 3
) ORDER BY db_key, entity_type, entity""",
            ["keys", "acl_entries"],
        ),
        bench=True,
    ),
    _q(
        "acl_read_allowed",
        lambda spark, sf: aclops.read_allowed(
            views(spark, sf)["keys"], views(spark, sf)["acl_entries"]),
        with_views(
            """WITH anc AS (
  SELECT db_key, owner AS principal, unnest(list_transform(
    range(2, len(string_split(db_key, '/')) + 1),
    i -> '/' || array_to_string(string_split(db_key, '/')[2:i], '/')))
    AS path
  FROM keys
)
SELECT anc.db_key, anc.principal,
  COALESCE(bool_or(
    (a.entity_type = 'USER' AND a.entity = anc.principal)
    OR a.entity_type = 'WORLD'), FALSE) AS allowed
FROM anc LEFT JOIN (SELECT * FROM acl_entries WHERE "right" = 'r') a
  USING (path)
GROUP BY 1, 2 ORDER BY db_key""",
            ["keys", "acl_entries"],
        ),
    ),
    _q(
        "cluster_growth_daily",
        lambda spark, sf: insights.cluster_growth_daily(views(spark, sf)["keys"]),
        with_views(
            """SELECT day_idx * 86400000 AS day_ms, new_keys, new_bytes,
  CAST(sum(new_keys) OVER w AS BIGINT) AS total_keys,
  CAST(sum(new_bytes) OVER w AS BIGINT) AS total_bytes
FROM (
  SELECT creation_time // 86400000 AS day_idx, count(*) AS new_keys,
    CAST(sum(data_size) AS BIGINT) AS new_bytes
  FROM keys GROUP BY 1
)
WINDOW w AS (ORDER BY day_idx ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
ORDER BY day_ms""",
            ["keys"],
        ),
    ),
]

# ---------------------------------------------------------------------------
# corpus mining / event analytics batch 2 (PII, TF-IDF, as-of, rolling,
# rollup, JSON, k-means — training-pipeline north star)
# ---------------------------------------------------------------------------

_PII_TAIL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
    " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)
_PII_RED = (
    "regexp_replace(regexp_replace(regexp_replace(t, '"
    + mining.EMAIL_RE + "', '<EMAIL>', 'g'), '"
    + mining.IPV4_RE + "', '<IP>', 'g'), '"
    + mining.PHONE_RE + "', '<PHONE>', 'g')"
)

_TFIDF_K1P1 = repr(mining.BM25_K1 + 1)
_TFIDF_1MB = repr(1 - mining.BM25_B)


# shared PQ oracle prelude: quantize -> codebook (first PQ_KSUB vectors'
# subvectors) -> per (vector, subspace, codebook entry) integer squared L2
# -> argmin code per (vector, subspace).  Mirrors similarity.pq_codes'
# fixed-point math term for term.
_PQ_CTES = f"""WITH q AS (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * {similarity.KM_QUANT}) AS BIGINT)) AS qv
  FROM embeddings
), train AS (
  SELECT vec_id AS cid, qv FROM q WHERE vec_id < {similarity.PQ_KSUB}
), subs AS (
  SELECT CAST(unnest(range(0, {similarity.PQ_M})) AS BIGINT) AS sub
), d AS (
  SELECT q.vec_id, s.sub, t.cid,
    CAST(list_sum(list_transform(range(1, {similarity.PQ_SUB + 1}),
      i -> (q.qv[s.sub * {similarity.PQ_SUB} + i]
            - t.qv[s.sub * {similarity.PQ_SUB} + i])
         * (q.qv[s.sub * {similarity.PQ_SUB} + i]
            - t.qv[s.sub * {similarity.PQ_SUB} + i]))) AS BIGINT) AS dist
  FROM q CROSS JOIN subs s CROSS JOIN train t
), best AS (
  SELECT vec_id, sub, cid, dist,
    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
  FROM d
)"""


def _kmeans_oracle(k: int = similarity.KM_K, iters: int = similarity.KM_ITERS,
                   dims: int = 64, quant: int = similarity.KM_QUANT) -> str:
    """Unrolled Lloyd's iterations as chained CTEs — the same fixed-point
    math as similarity.kmeans_assign, term-by-term in the same left-assoc
    fold order so every double is bit-identical."""
    def dist(cols):
        return " + ".join(
            f"(q.qv[{i + 1}] - c.{cols(i)}) * (q.qv[{i + 1}] - c.{cols(i)})"
            for i in range(dims))

    d_init = dist(lambda i: f"qv[{i + 1}]")
    d_mean = dist(lambda i: f"m{i + 1}")
    means = ", ".join(
        f"sum(qv[{i + 1}]) / count(*) AS m{i + 1}" for i in range(dims))
    parts = [
        f"""WITH q AS (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * {quant}) AS BIGINT)) AS qv
  FROM embeddings
), c0 AS (SELECT vec_id AS cid, qv FROM q WHERE vec_id < {k})"""]
    prev = "c0"
    d_expr = d_init
    for it in range(iters):
        parts.append(f""", a{it} AS (
  SELECT vec_id, qv, cluster FROM (
    SELECT q.vec_id, q.qv, c.cid AS cluster,
      row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY {d_expr}, c.cid) AS rn
    FROM q CROSS JOIN {prev} c) WHERE rn = 1
), c{it + 1} AS (
  SELECT cluster AS cid, {means} FROM a{it} GROUP BY cluster)""")
        prev = f"c{it + 1}"
        d_expr = d_mean
    parts.append(f"""
SELECT vec_id, cluster, CAST(floor(d) AS BIGINT) AS dist_sq_q FROM (
  SELECT q.vec_id, c.cid AS cluster, {d_expr} AS d,
    row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {d_expr}, c.cid) AS rn
  FROM q CROSS JOIN {prev} c) WHERE rn = 1""")
    return "".join(parts)


def _bpe_prefix(n_merges: int = mining.BPE_MERGES) -> str:
    """Unrolled BPE merge rounds as chained CTEs — the same boundary-
    doubled literal-replace merge as mining._bpe_loop, round for round
    (same pattern as _kmeans_oracle's unrolled Lloyd's iterations).
    Ends with v{n} holding every word's post-merge symbolization."""
    sp = "string_split(pair, '|')"
    parts = [f"""WITH v0 AS (
  SELECT word, count(*) AS freq,
    '||' || array_to_string(string_split(word, ''), '||') || '||' AS sym
  FROM (SELECT unnest(list_filter(string_split({_NORM}, ' '),
                                  x -> x <> '')) AS word
        FROM documents)
  GROUP BY word
)"""]
    for r in range(n_merges):
        parts.append(f""", p{r} AS (
  SELECT s[CAST(i AS INT)] || '|' || s[CAST(i AS INT) + 1] AS pair, freq
  FROM (
    SELECT freq, s, unnest(range(1, len(s))) AS i
    FROM (SELECT freq,
            list_filter(string_split(sym, '||'), x -> x <> '') AS s
          FROM v{r}))
), b{r} AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p{r}
  GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 1
), v{r + 1} AS (
  SELECT word, freq, replace(sym,
    '|' || {sp}[1] || '||' || {sp}[2] || '|',
    '|' || {sp}[1] || {sp}[2] || '|') AS sym
  FROM v{r}, b{r})""")
    return "".join(parts)


def _bpe_oracle(n_merges: int = mining.BPE_MERGES) -> str:
    sp = "string_split(pair, '|')"
    selects = [
        f"""SELECT CAST({r + 1} AS INT) AS merge_round, pair,
    {sp}[1] || {sp}[2] AS new_symbol, cnt AS total_count FROM b{r}"""
        for r in range(n_merges)]
    return (_bpe_prefix(n_merges) + "\nSELECT * FROM (\n"
            + "\nUNION ALL ".join(selects) + "\n) ORDER BY merge_round")


def _bpe_encode_oracle(n_merges: int = mining.BPE_MERGES) -> str:
    return _bpe_prefix(n_merges) + f""", enc AS (
  SELECT word,
    len(list_filter(string_split(sym, '||'), x -> x <> '')) AS n_sym
  FROM v{n_merges}
), dw AS (
  SELECT doc_id, lang,
    unnest(list_filter(string_split({_NORM}, ' '), x -> x <> '')) AS word
  FROM documents
)
SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS total_words,
  CAST(sum(length(word)) AS BIGINT) AS total_chars,
  CAST(sum(n_sym) AS BIGINT) AS total_tokens,
  round(sum(n_sym) * 1.0 / count(*), 6) AS fertility,
  round(sum(length(word)) * 1.0 / sum(n_sym), 6) AS chars_per_token
FROM dw JOIN enc USING (word)
GROUP BY 1 ORDER BY 1"""


MINING_QUERIES = [
    _q(
        "bpe_train",
        lambda spark, sf: mining.bpe_train(views(spark, sf)["documents"]),
        _bpe_oracle(),
    ),
    _q(
        "simhash_recall",
        lambda spark, sf: dedup.simhash_recall(views(spark, sf)["documents"]),
        # block-permutation LSH candidates vs the exact Hamming truth
        # set over a fixed-COUNT deterministic md5-ranked doc sample
        # (all-pairs truth is bounded by the sample BY DESIGN, and the
        # bound is corpus-size-independent)
        f"""WITH tok AS (
  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS w
        FROM documents)
  WHERE w <> ''
), agg AS (
  SELECT doc_id, {_simhash_sums_sql()}
  FROM tok GROUP BY 1
), sig AS (
  SELECT doc_id, {_simhash_combine_sql()} AS simhash FROM agg
), samp AS (
  SELECT doc_id, simhash FROM sig
  ORDER BY CAST(('0x' || substr(md5('{dedup.SIMRECALL_SALT}:'
    || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT), doc_id
  LIMIT {dedup.SIMRECALL_SAMPLE_N}
), truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM samp a JOIN samp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
), blocks AS (
  SELECT doc_id, simhash, blk,
    (simhash >> (blk * 15)) & 32767 AS val
  FROM (SELECT doc_id, simhash, unnest(range(4)) AS blk FROM sig)
), ok AS (
  SELECT blk, val FROM blocks GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND 200
), bf AS (
  SELECT blocks.* FROM blocks JOIN ok USING (blk, val)
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bf a JOIN bf b
    ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
)
SELECT count(*) AS n_truth,
  CAST(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_found,
  (CAST(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000) // count(*) AS recall_ppm
FROM truth t LEFT JOIN cands c
  ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b""",
    ),
    _q(
        "bpe_encode_stats",
        lambda spark, sf: mining.bpe_encode_stats(
            views(spark, sf)["documents"]),
        _bpe_encode_oracle(),
    ),
    _q(
        "vocab_coverage",
        lambda spark, sf: mining.vocab_coverage(views(spark, sf)["documents"]),
        f"""WITH norm AS (
  SELECT lang, unnest(list_filter(string_split(
    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' '),
    w -> w <> '')) AS word
  FROM documents
), counts AS (SELECT word, count(*) AS cnt FROM norm GROUP BY 1),
vocab AS (SELECT word FROM counts ORDER BY cnt DESC, word LIMIT 500),
tagged AS (SELECT lang, word IN (SELECT word FROM vocab) AS iv FROM norm)
SELECT lang, CAST(count(*) AS BIGINT) AS total_tokens,
  CAST(sum(CASE WHEN iv THEN 1 ELSE 0 END) AS BIGINT) AS covered_tokens,
  round(sum(CASE WHEN iv THEN 1 ELSE 0 END) / count(*), 6) AS coverage,
  round(1 - sum(CASE WHEN iv THEN 1 ELSE 0 END) / count(*), 6) AS oov_rate
FROM tagged GROUP BY 1 ORDER BY lang""",
    ),
    _q(
        "pii_redaction",
        lambda spark, sf: mining.pii_redaction(views(spark, sf)["documents"]),
        f"""WITH aug AS (
  SELECT doc_id, {_PII_TAIL} AS t FROM documents
), red AS (
  SELECT doc_id, t, {_PII_RED} AS r FROM aug
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{mining.EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '{mining.IPV4_RE}')) AS BIGINT) AS n_ips,
  CAST(len(regexp_extract_all(t, '{mining.PHONE_RE}')) AS BIGINT) AS n_phones,
  md5(r) AS redacted_fp,
  CAST(length(r) AS BIGINT) AS redacted_len
FROM red""",
    ),
    _q(
        "tf_idf_top_terms",
        lambda spark, sf: mining.tf_idf_top_terms(views(spark, sf)["documents"]),
        f"""WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> ''))
    AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), scal AS (
  SELECT count(*) AS n_docs,
    avg(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS avgdl
  FROM documents
), dl AS (
  SELECT *, sum(tf) OVER (PARTITION BY doc_id) AS dl FROM tf
), scored AS (
  SELECT d.doc_id, d.term, d.tf, f.df,
    d.tf * ln(s.n_docs / f.df) AS tfidf,
    ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
      * (d.tf * {_TFIDF_K1P1})
      / (d.tf + {mining.BM25_K1} * ({_TFIDF_1MB}
         + {mining.BM25_B} * d.dl / s.avgdl)) AS bm25
  FROM dl d JOIN dfreq f USING (term) CROSS JOIN scal s
)
SELECT doc_id, term, tf, df, CAST(rank AS BIGINT) AS rank,
  round(tfidf, 6) AS tfidf, round(bm25, 6) AS bm25
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        ORDER BY tfidf DESC, term) AS rank FROM scored)
WHERE rank <= {mining.TOP_TERMS}""",
    ),
    _q(
        "lm_cross_entropy",
        lambda spark, sf: mining.bigram_lm_scores(views(spark, sf)["documents"]),
        """WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
), big AS (
  SELECT doc_id, w[i] AS prev, w[i + 1] AS cur
  FROM (SELECT doc_id, w,
          unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
        FROM words)
), dbc AS (
  SELECT doc_id, prev, cur, count(*) AS n FROM big GROUP BY 1, 2, 3
), c2 AS (
  SELECT prev, cur, sum(n) AS c2 FROM dbc GROUP BY 1, 2
), c1 AS (
  SELECT prev, sum(c2) AS c1 FROM c2 GROUP BY 1
), v AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(w) AS tok FROM words)
)
SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
  round(-sum(n * log2((c2 + 1.0) / (c1 + v))) / sum(n), 6)
    AS cross_entropy_bits,
  round(power(2.0, -sum(n * log2((c2 + 1.0) / (c1 + v))) / sum(n)), 4)
    AS perplexity
FROM dbc JOIN c2 USING (prev, cur) JOIN c1 USING (prev) CROSS JOIN v
GROUP BY doc_id""",
    ),
    _q(
        "shingle_cardinality_kmv",
        lambda spark, sf: sketch.kmv_shingle_estimate(views(spark, sf)["documents"]),
        f"""WITH words AS (
  SELECT source, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
), toks AS (
  SELECT DISTINCT source, w FROM (
    SELECT source, w[i] || ' ' || w[i + 1] AS w
    FROM (SELECT source, w,
            unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
          FROM words))
), h AS (
  SELECT source, w,
    CAST(('0x' || substr(md5(w), 1, 13)) AS BIGINT) AS h
  FROM toks
), r AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, w) AS rn
  FROM h
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS exact_distinct,
    max(CASE WHEN rn = {sketch.KMV_K} THEN h END) AS hk
  FROM r GROUP BY 1
), est AS (
  SELECT source, exact_distinct,
    CASE WHEN exact_distinct < {sketch.KMV_K}
         THEN CAST(exact_distinct AS DOUBLE)
         ELSE {(sketch.KMV_K - 1) * float(1 << 52)} / hk END AS e
  FROM agg
)
SELECT source, exact_distinct, round(e, 4) AS kmv_estimate,
  round(abs(e - exact_distinct) / exact_distinct, 6) AS rel_error
FROM est""",
    ),
    _q(
        "weighted_sample",
        lambda spark, sf: sketch.weighted_sample(views(spark, sf)["documents"]),
        f"""WITH keyed AS (
  SELECT doc_id, n_chars AS weight,
    -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                  || '{sketch.WS_SALT}'), 1, 13))
         AS BIGINT) + 1) / 4.503599627370496e15) / n_chars AS key
  FROM documents
), top AS (
  SELECT * FROM keyed ORDER BY key, doc_id LIMIT {sketch.SAMPLE_K}
)
SELECT doc_id, weight, round(key, 9) AS sample_key,
  CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT) AS rank
FROM top""",
    ),
    _q(
        "bloom_membership",
        lambda spark, sf: sketch.bloom_membership_report(
            views(spark, sf)["documents"]),
        f"""WITH fps AS (
  SELECT doc_id,
    md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp
  FROM documents
), train AS (
  SELECT fp FROM fps WHERE doc_id % 5 <> 0
), probe AS (
  SELECT DISTINCT fp FROM fps
), tpos AS (
  SELECT CAST(('0x' || substr(md5(fp || '{sketch.BLOOM_SALT}-'
                                  || CAST(j AS VARCHAR)), 1, 13))
              AS BIGINT) % {sketch.BLOOM_M} AS pos
  FROM train, range({sketch.BLOOM_K}) t(j)
), words AS (
  SELECT pos // {sketch.WORD_BITS} AS word_idx,
    bit_or(1::BIGINT << CAST(pos % {sketch.WORD_BITS} AS INT)) AS word_bits
  FROM tpos GROUP BY 1
), ppos AS (
  SELECT fp AS item,
    CAST(('0x' || substr(md5(fp || '{sketch.BLOOM_SALT}-'
                             || CAST(j AS VARCHAR)), 1, 13))
         AS BIGINT) % {sketch.BLOOM_M} AS pos
  FROM probe, range({sketch.BLOOM_K}) t(j)
), chk AS (
  SELECT item,
    CASE WHEN coalesce(word_bits, 0)
              & (1::BIGINT << CAST(pos % {sketch.WORD_BITS} AS INT)) <> 0
         THEN 1 ELSE 0 END AS ok
  FROM ppos LEFT JOIN words ON pos // {sketch.WORD_BITS} = word_idx
), hit AS (
  SELECT item, min(ok) = 1 AS maybe FROM chk GROUP BY 1
), actual AS (
  SELECT DISTINCT fp AS item, true AS present FROM train
)
SELECT maybe, coalesce(present, false) AS present,
  CAST(count(*) AS BIGINT) AS n
FROM hit LEFT JOIN actual USING (item)
GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "cms_heavy_hitters",
        lambda spark, sf: sketch.cms_token_counts(views(spark, sf)["documents"]),
        f"""WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
  FROM documents
), rows_ AS (
  SELECT w, j AS r,
    CAST(('0x' || substr(md5(w || '{sketch.CMS_SALT}-'
                            || CAST(j AS VARCHAR)), 1, 13))
         AS BIGINT) % {sketch.CMS_W} AS slot
  FROM toks, range({sketch.CMS_D}) t(j)
), grid AS (
  SELECT r, slot, count(*) AS c FROM rows_ GROUP BY 1, 2
), exact AS (
  SELECT w, count(*) AS exact_count FROM toks GROUP BY 1
), probes AS (
  SELECT e.w, e.exact_count, j AS r,
    CAST(('0x' || substr(md5(e.w || '{sketch.CMS_SALT}-'
                            || CAST(j AS VARCHAR)), 1, 13))
         AS BIGINT) % {sketch.CMS_W} AS slot
  FROM exact e, range({sketch.CMS_D}) t(j)
)
SELECT w AS token, CAST(exact_count AS BIGINT) AS exact_count,
  CAST(min(c) AS BIGINT) AS cms_estimate,
  CAST(min(c) - exact_count AS BIGINT) AS overcount
FROM probes JOIN grid USING (r, slot)
GROUP BY w, exact_count ORDER BY 2 DESC, 1 LIMIT 50""",
    ),
    _q(
        "asof_last_click",
        lambda spark, sf: eops.asof_last_click(views(spark, sf)["events"]),
        """WITH u AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS m
  FROM events WHERE event_type IN ('click', 'purchase')
), f AS (
  SELECT *,
    last_value(CASE WHEN m = 0 THEN ts_ms END IGNORE NULLS) OVER w
      AS click_ms,
    last_value(CASE WHEN m = 0 THEN event_id END IGNORE NULLS) OVER w
      AS click_event_id
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, m, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_event_id, user_id, ts_ms AS purchase_ms,
  click_ms, click_event_id, ts_ms - click_ms AS gap_ms
FROM f WHERE m = 1""",
    ),
    _q(
        "rolling_user_1h",
        lambda spark, sf: eops.rolling_user_1h(views(spark, sf)["events"]),
        """WITH e AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, event_type, ts_ms,
  count(*) OVER w AS n_1h,
  CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)""",
    ),
    _q(
        "events_rollup_daily",
        lambda spark, sf: eops.events_rollup_daily(views(spark, sf)["events"]),
        """WITH e AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT coalesce(event_type, 'ALL') AS event_type,
  coalesce(day, 'ALL') AS day,
  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS total_cents
FROM e GROUP BY ROLLUP(event_type, day)""",
    ),
    _q(
        "props_k_histogram",
        lambda spark, sf: eops.props_k_histogram(views(spark, sf)["events"]),
        """SELECT event_type,
  CAST(floor(CAST(props->>'$.k' AS BIGINT) / 10) AS BIGINT) AS k_bucket,
  count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "kmeans_assign",
        lambda spark, sf: similarity.kmeans_assign(
            views(spark, sf)["embeddings"]),
        _kmeans_oracle(),
    ),
    _q(
        "pq_codes",
        lambda spark, sf: similarity.pq_codes(views(spark, sf)["embeddings"]),
        _PQ_CTES + """
SELECT vec_id, sub, cid AS code, dist AS dist_sq
FROM best WHERE rn = 1 ORDER BY vec_id, sub""",
    ),
    _q(
        "knn_pq",
        lambda spark, sf: similarity.knn_pq(
            views(spark, sf)["embeddings"], [20, 21, 22], k=10),
        # the query->codebook distance rows in `d` ARE the ADC lookup
        # table; a candidate's distance is the sum of its m looked-up
        # entries (all integer math — exact in both engines)
        _PQ_CTES + """
, codes AS (
  SELECT vec_id, sub, cid AS code FROM best WHERE rn = 1
), qd AS (
  SELECT vec_id AS query_id, sub, cid, dist FROM d
  WHERE vec_id IN (20, 21, 22)
), adc AS (
  SELECT qd.query_id, c.vec_id, CAST(sum(qd.dist) AS BIGINT) AS adc_dist
  FROM codes c JOIN qd ON qd.sub = c.sub AND qd.cid = c.code
  GROUP BY 1, 2
)
SELECT query_id, rank, vec_id, adc_dist FROM (
  SELECT query_id, vec_id, adc_dist,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY adc_dist, vec_id) AS rank
  FROM adc WHERE vec_id <> query_id
) WHERE rank <= 10 ORDER BY query_id, rank""",
    ),
    _q(
        "knn_ivf_pq",
        lambda spark, sf: similarity.knn_ivf_pq(
            views(spark, sf)["embeddings"], [20, 21, 22], k=10),
        bench=True,
        # IVF probe (knn_ivf oracle) restricted candidates, ADC-scored
        # over PQ codes (knn_pq oracle) — integer math, exact replay
        oracle=_PQ_CTES + f"""
, codes AS (
  SELECT vec_id, sub, cid AS code FROM best WHERE rn = 1
), cents AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings
  WHERE vec_id < 16
), assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_DOT.format(a='e.embedding', b='c.c')} DESC,
                 c.centroid_id DESC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
), qs AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (20, 21, 22)
), probe AS (
  SELECT query_id, centroid_id FROM (
    SELECT q2.query_id, c.centroid_id,
      row_number() OVER (PARTITION BY q2.query_id
        ORDER BY {_DOT.format(a='q2.qe', b='c.c')} DESC,
                 c.centroid_id ASC) AS rn
    FROM qs q2, cents c
  ) WHERE rn <= 2
), cand AS (
  SELECT p.query_id, a.vec_id
  FROM assigned a JOIN probe p USING (centroid_id)
  WHERE a.vec_id <> p.query_id
), qd AS (
  SELECT vec_id AS query_id, sub, cid, dist FROM d
  WHERE vec_id IN (20, 21, 22)
), adc AS (
  SELECT cd.query_id, cd.vec_id, CAST(sum(qd.dist) AS BIGINT) AS adc_dist
  FROM cand cd
  JOIN codes c ON c.vec_id = cd.vec_id
  JOIN qd ON qd.query_id = cd.query_id AND qd.sub = c.sub
         AND qd.cid = c.code
  GROUP BY 1, 2
)
SELECT query_id, rank, vec_id, adc_dist FROM (
  SELECT query_id, vec_id, adc_dist,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY adc_dist, vec_id) AS rank
  FROM adc
) WHERE rank <= 10 ORDER BY query_id, rank""",
    ),
]


def _streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ozone_spark.streaming import windows as swin
    import tempfile

    _stream_seq[0] += 1
    name = f"gate_attrib_{_stream_seq[0]}"
    stream = swin.read_events_stream(spark, f"{sf_dir}/events.parquet")
    return swin.drain_to_memory(
        swin.streaming_attribution(stream), spark, name,
        tempfile.mkdtemp(prefix="ozs_ckpt_"), output_mode="append")


_RDS_N = pipeline.SPAN_REMOVE_NGRAM

# Round-4 additions (registered BEHIND the round-3 gate backlog: this
# list is last in _REGISTRY_ORDER, so never-verified round-3 queries
# keep their place at the head of the driver's capped gate).
R4_QUERIES: list[QuerySpec] = [
    _q(
        "remove_duplicate_spans",
        lambda spark, sf: pipeline.remove_duplicate_spans(
            views(spark, sf)["documents"]),
        # keep-first span deletion replayed positionally: same 60-bit
        # md5 span hash (wide enough that no birthday collision can
        # falsely delete text), same 1-based starts, cleaned text
        # re-joined with ORDER BY pos and fingerprinted
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), spans AS (
  SELECT doc_id, pos AS start,
    CAST(('0x' || substr(md5(array_to_string(w[pos:pos+{_RDS_N - 1}], ' ')),
          1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, w,
          unnest(range(1, greatest(len(w) - {_RDS_N - 1}, 0) + 1)) AS pos
        FROM words)
), stats AS (
  SELECT h, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keeper
  FROM spans GROUP BY 1
), covered AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT s.doc_id, unnest(range(s.start, s.start + {_RDS_N})) AS pos
    FROM spans s JOIN stats t USING (h)
    WHERE t.n_docs >= 2 AND s.doc_id > t.keeper)
), toks AS (
  SELECT doc_id, pos, w[CAST(pos AS INT)] AS tok
  FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS pos FROM words)
), flagged AS (
  SELECT t.doc_id, t.pos, t.tok, c.pos IS NOT NULL AS cov
  FROM toks t LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN cov THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  round(sum(CASE WHEN cov THEN 1 ELSE 0 END) / count(*), 6) AS frac_removed,
  md5(coalesce(string_agg(CASE WHEN NOT cov THEN tok END, ' ' ORDER BY pos),
      '')) AS cleaned_fp
FROM flagged GROUP BY doc_id ORDER BY doc_id""",
        bench=True,
    ),
    _q(
        "payload_chunk_near_dup",
        lambda spark, sf: multimodal.payload_chunk_near_dup(
            multimodal.as_media_table(views(spark, sf)["documents"])),
        # rolling-hash cut rule replayed with lag() windows; chunk md5s
        # via substr on the ASCII fixture (byte == char positions)
        f"""WITH pos AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
  FROM documents
), bytes AS (
  SELECT doc_id, i - 1 AS p, unicode(substr(text, i, 1)) AS b FROM pos
), hh AS (
  SELECT doc_id, p, b,
    lag(b, 1) OVER w AS b1, lag(b, 2) OVER w AS b2, lag(b, 3) OVER w AS b3
  FROM bytes WINDOW w AS (PARTITION BY doc_id ORDER BY p)
), flags AS (
  SELECT doc_id, p,
    CASE WHEN p >= 3 AND (b + 9*b1 + 81*b2 + 729*b3)
             % {multimodal.CHUNK_MOD} = 0
         THEN 1 ELSE 0 END AS cut
  FROM hh
), cid AS (
  SELECT doc_id, p,
    coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY p
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
  FROM flags
), spans AS (
  SELECT doc_id, chunk_id, min(p) AS lo, count(*) AS clen
  FROM cid GROUP BY 1, 2
), ch AS (
  SELECT DISTINCT s.doc_id,
    md5(substr(d.text, CAST(s.lo + 1 AS INT), CAST(s.clen AS INT))) AS cm
  FROM spans s JOIN documents d USING (doc_id)
), sizes AS (
  SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY 1
), cold AS (
  SELECT cm FROM ch GROUP BY cm
  HAVING count(*) <= {multimodal.CHUNK_MAX_BUCKET}
), probe AS (
  SELECT ch.* FROM ch JOIN cold USING (cm)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM probe a JOIN probe b ON a.cm = b.cm AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
  round(n_common / (sa.n_chunks + sb.n_chunks - n_common), 6) AS jaccard
FROM common JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_chunks + sb.n_chunks - n_common)
      >= {multimodal.CHUNK_JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b""",
        bench=True,
    ),
    _q(
        "perplexity_buckets",
        lambda spark, sf: mining.perplexity_buckets(
            views(spark, sf)["documents"]),
        # lm_cross_entropy's model replay + a per-lang ntile(3) ordered
        # by (COARSE 3-decimal rounded cross-entropy, doc_id) — the
        # coarse grid makes a cross-engine float-boundary flip ~1000x
        # less likely than ordering on the displayed 6-decimal score
        """WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
), big AS (
  SELECT doc_id, w[i] AS prev, w[i + 1] AS cur
  FROM (SELECT doc_id, w,
          unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
        FROM words)
), dbc AS (
  SELECT doc_id, prev, cur, count(*) AS n FROM big GROUP BY 1, 2, 3
), c2 AS (
  SELECT prev, cur, sum(n) AS c2 FROM dbc GROUP BY 1, 2
), c1 AS (
  SELECT prev, sum(c2) AS c1 FROM c2 GROUP BY 1
), v AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(w) AS tok FROM words)
), scored AS (
  SELECT doc_id,
    round(-sum(n * log2((c2 + 1.0) / (c1 + v))) / sum(n), 6)
      AS cross_entropy_bits,
    round(power(2.0, -sum(n * log2((c2 + 1.0) / (c1 + v))) / sum(n)), 4)
      AS perplexity
  FROM dbc JOIN c2 USING (prev, cur) JOIN c1 USING (prev) CROSS JOIN v
  GROUP BY doc_id
), tiled AS (
  SELECT s.doc_id, d.lang, s.cross_entropy_bits, s.perplexity,
    ntile(3) OVER (PARTITION BY d.lang
                   ORDER BY round(s.cross_entropy_bits, 3), s.doc_id) AS t
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, cross_entropy_bits, perplexity,
  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM tiled ORDER BY doc_id""",
    ),
    _q(
        "streaming_attribution",
        _streaming_attribution,
        # inner stream-stream interval join == batch inequality join
        """SELECT v.user_id, v.event_id AS view_event_id,
  c.event_id AS click_event_id,
  (epoch_us(c.ts) - epoch_us(v.ts)) AS gap_us
FROM events v JOIN events c
  ON c.user_id = v.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
ORDER BY 1, 2, 3""",
    ),
]


def _cdc_incremental_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 for A5 (QuotaRepairTask contract): synthesize the CDC log,
    maintain per-bucket usedNamespace/usedBytes/usedReplicatedBytes
    incrementally through the real streaming drain, return the
    materialized store (oracle: batch recompute over the final key
    state)."""
    import tempfile

    from ozone_spark.streaming import cdc as scdc

    t = views(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ozs_quota_gate_")
    scdc.synthesize_cdc_log(t["keys"], t["deleted_keys"], f"{work}/cdc")
    scdc.run_incremental_quota(spark, f"{work}/cdc", f"{work}/store",
                               f"{work}/ckpt")
    return spark.read.parquet(f"{work}/store").drop("view_bucket")


def _cdc_task_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 as a gate row: drain an incremental view, then read the
    TaskStatusService analog off the streaming checkpoint's commit log
    (cdc.task_status).  Wall-clock columns (commit mtime) and the raw
    batch counter are projected to deterministic booleans: `started`
    (any committed batch) and `drained` (the last committed batch id
    equals pending-file count - 1 — AvailableNow with
    maxFilesPerTrigger=1 commits exactly one batch per log file)."""
    import glob
    import tempfile

    import pyspark.sql.functions as F

    from ozone_spark.streaming import cdc as scdc

    t = views(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="ozs_ts_gate_")
    scdc.synthesize_cdc_log(t["keys"], t["deleted_keys"], f"{work}/cdc")
    scdc.run_incremental_histogram(spark, f"{work}/cdc", f"{work}/store",
                                   f"{work}/ckpt")
    n_files = len(glob.glob(f"{work}/cdc/chunk=*/*.parquet"))
    status = scdc.task_status(spark, {"histogram": f"{work}/ckpt",
                                      "never_ran": f"{work}/no_such_ckpt"})
    return status.select(
        "task",
        (F.col("last_batch_id") >= 0).alias("started"),
        (F.col("last_batch_id") == F.lit(n_files - 1)).alias("drained"),
    ).orderBy("task")


def _cdc_overflow_reprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 as a gate row: the bounded-buffer fallback.  Runs the SAME
    view maintenance twice — once with capacity 0 (pending log
    overflows, full reprocess() from current state) and once with an
    ample buffer (true incremental drain through Structured Streaming)
    — and unions the two tagged frames.  The oracle is the batch
    histogram crossed with both path labels, so the gate hash-verifies
    process() == reprocess() row-for-row."""
    import tempfile

    from ozone_spark.streaming import cdc as scdc

    t = views(spark, sf_dir)
    keys_now = t["keys"].join(t["deleted_keys"].select("object_id"),
                              "object_id", "left_anti")
    work = tempfile.mkdtemp(prefix="ozs_ovf_gate_")
    scdc.synthesize_cdc_log(t["keys"], t["deleted_keys"], f"{work}/cdc")
    over = scdc.process_or_reprocess(
        spark, f"{work}/cdc", keys_now, f"{work}/store_o", f"{work}/ckpt_o",
        capacity=0)
    # capacity explicitly above any fixture's pending-log size: the
    # point of this branch is the TRUE incremental drain.  The module
    # default (sized to the gate fixture) overflowed at sf0.1, and the
    # silent fallback made both branches reprocess — rows still
    # matched per path-label only by accident of the union, and the
    # sf0.1 sweep caught the hash mismatch.
    incr = scdc.process_or_reprocess(
        spark, f"{work}/cdc", keys_now, f"{work}/store_i", f"{work}/ckpt_i",
        capacity=1 << 40)
    return over.unionByName(incr).orderBy(
        "path", "volume", "bucket", "bin_index")


# Round-5 additions (behind the r3/r4 gate backlog, same freeze rule as
# every round since r2: new registrations never starve the never-gated
# queue out of the driver's per-round cap).
R5_QUERIES: list[QuerySpec] = [
    _q(
        "cdc_task_status",
        _cdc_task_status,
        """SELECT * FROM (VALUES ('histogram', true, true),
  ('never_ran', false, false)) t(task, started, drained) ORDER BY task""",
    ),
    _q(
        "cdc_overflow_reprocess",
        _cdc_overflow_reprocess,
        with_views(
            f"""SELECT volume, bucket, {_FILE_BIN} AS bin_index,
  count(*) AS delta, path
FROM keys, (SELECT unnest(['incremental', 'reprocess']) AS path)
WHERE object_id NOT IN (SELECT object_id FROM deleted_keys)
GROUP BY 1, 2, 3, 5 ORDER BY path, volume, bucket, bin_index""",
            ["keys", "deleted_keys"],
        ),
    ),
    _q(
        "snapshot_diff_job_ids",
        lambda spark, sf: snops.snapshot_diff_job_ids(
            views(spark, sf)["snapshot_chain"]),
        # the same md5 -> 8-4-4-4-12 regrouping with version nibble 3
        # and variant nibble via translate, replayed in DuckDB
        with_views(
            """SELECT previous_snapshot AS from_snapshot,
  snapshot_name AS to_snapshot,
  substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-3' || substr(h, 14, 3)
    || '-' || translate(substr(h, 17, 1), '0123456789abcdef',
                        '89ab89ab89ab89ab') || substr(h, 18, 3)
    || '-' || substr(h, 21, 12) AS job_id
FROM (
  SELECT *, md5('vol1/b1/' || previous_snapshot || '/' || snapshot_name) AS h
  FROM snapshot_chain WHERE previous_snapshot IS NOT NULL
) ORDER BY to_snapshot""",
            ["snapshot_chain"],
        ),
    ),
    _q(
        "cdc_incremental_quota",
        _cdc_incremental_quota,
        # ST4 for A5: incrementally-maintained per-bucket quota usage ==
        # the QuotaRepairTask-style recompute over the final key state
        with_views(
            """SELECT volume, bucket,
  CAST(count(*) AS BIGINT) AS used_namespace,
  CAST(sum(data_size) AS BIGINT) AS used_bytes,
  CAST(sum(replicated_size) AS BIGINT) AS used_replicated_bytes
FROM keys WHERE object_id NOT IN (SELECT object_id FROM deleted_keys)
GROUP BY 1, 2""",
            ["keys", "deleted_keys"],
        ),
    ),
    _q(
        "event_funnel",
        lambda spark, sf: eops.event_funnel(views(spark, sf)["events"]),
        # ordered min-timestamp cascade: step k's clock starts at the
        # user's earliest completion of step k-1
        """WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1
), counts AS (
  SELECT 1 AS step_idx, 'view' AS step, count(*) AS n_users FROM s1
  UNION ALL SELECT 2, 'click', count(*) FROM s2
  UNION ALL SELECT 3, 'purchase', count(*) FROM s3
)
SELECT step_idx, step, CAST(n_users AS BIGINT) AS n_users,
  CASE WHEN coalesce(lag(n_users) OVER (ORDER BY step_idx), n_users) > 0
    THEN round(n_users / coalesce(lag(n_users) OVER (ORDER BY step_idx),
                                  n_users), 6) END AS conv_from_prev,
  CASE WHEN first_value(n_users) OVER (ORDER BY step_idx) > 0
    THEN round(n_users / first_value(n_users) OVER (ORDER BY step_idx), 6)
  END AS conv_from_top
FROM counts ORDER BY step_idx""",
    ),
    _q(
        "customer_order_distribution",
        lambda spark, sf: tpch.customer_order_distribution(
            views(spark, sf)["customer"], views(spark, sf)["orders"]),
        # TPC-H Q13 shape: left-outer keeps zero-order customers
        """SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
        bench=True,
    ),
    _q(
        "large_volume_orders",
        lambda spark, sf: tpch.large_volume_orders(
            views(spark, sf)["customer"], views(spark, sf)["orders"],
            views(spark, sf)["lineitem"]),
        # TPC-H Q18 shape: aggregated-filter (HAVING) semi-join
        """SELECT c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
  round(o_totalprice, 2) AS o_totalprice,
  round(h.total_qty, 2) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300) h
  ON o_orderkey = h.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
        bench=True,
    ),
    _q(
        "decontaminate_bloom",
        lambda spark, sf: pipeline.decontaminate_bloom(
            views(spark, sf)["documents"].where("doc_id % 25 <> 0"),
            views(spark, sf)["documents"].where("doc_id % 25 = 0")),
        # deterministic Bloom membership (k=3, m=2^18) via
        # Kirsch-Mitzenmacher double hashing of ONE md5 per shingle:
        # the oracle replays the filter bit-for-bit, false positives
        # and all
        f"""WITH shl AS (
  SELECT doc_id, {_SH5} AS shs
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents)
  WHERE len(w) >= 5
), ev AS (
  SELECT md5(s) AS h
  FROM (SELECT DISTINCT unnest(shs) AS s FROM shl WHERE doc_id % 25 = 0)
), pos AS (
  SELECT DISTINCT (CAST('0x' || substr(h, 1, 15) AS BIGINT)
    + j * CAST('0x' || substr(h, 17, 15) AS BIGINT))
      % {pipeline.BLOOM_M_BITS} AS p
  FROM ev, range({pipeline.BLOOM_K}) r(j)
), tr AS (
  SELECT doc_id, n_sh,
    CAST('0x' || substr(h, 1, 15) AS BIGINT) AS h1,
    CAST('0x' || substr(h, 17, 15) AS BIGINT) AS h2
  FROM (SELECT doc_id, len(shs) AS n_sh, md5(unnest(shs)) AS h FROM shl
        WHERE doc_id % 25 <> 0)
), mem AS (
  SELECT tr.doc_id, tr.n_sh,
    CASE WHEN p0.p IS NOT NULL AND p1.p IS NOT NULL AND p2.p IS NOT NULL
         THEN 1 ELSE 0 END AS maybe
  FROM tr
  LEFT JOIN pos p0 ON p0.p = tr.h1 % {pipeline.BLOOM_M_BITS}
  LEFT JOIN pos p1 ON p1.p = (tr.h1 + tr.h2) % {pipeline.BLOOM_M_BITS}
  LEFT JOIN pos p2 ON p2.p = (tr.h1 + 2 * tr.h2) % {pipeline.BLOOM_M_BITS}
), agg AS (
  SELECT doc_id, any_value(n_sh) AS n_sh, sum(maybe) AS n_maybe
  FROM mem GROUP BY 1
)
SELECT doc_id, CAST(n_sh AS BIGINT) AS n_shingles,
  CAST(n_maybe AS BIGINT) AS n_bloom_hits,
  round(n_maybe / n_sh, 6) AS bloom_fraction,
  n_maybe / n_sh >= {pipeline.DECONTAM_MIN_OVERLAP} AS flagged
FROM agg ORDER BY doc_id""",
    ),
    _q(
        "source_overlap_matrix",
        lambda spark, sf: pipeline.source_overlap_matrix(
            views(spark, sf)["documents"]),
        # cross-source shingle Jaccard over 60-bit shingle hashes (the
        # distinct/self-join move longs, not strings — same md5 both
        # engines); zero-overlap pairs absent in both engines
        f"""WITH shl AS (
  SELECT source, {_SH5} AS shs
  FROM (SELECT source, string_split({_NORM}, ' ') AS w FROM documents)
  WHERE len(w) >= 5
), sh AS (
  SELECT DISTINCT source,
    CAST('0x' || substr(md5(unnest(shs)), 1, 15) AS BIGINT) AS s
  FROM shl
), sizes AS (
  SELECT source, count(*) AS n_sh FROM sh GROUP BY 1
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
    count(*) AS shared
  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b,
  x.n_sh AS n_a, y.n_sh AS n_b, shared,
  round(shared / (x.n_sh + y.n_sh - shared), 6) AS jaccard
FROM shared
JOIN sizes x ON source_a = x.source
JOIN sizes y ON source_b = y.source
ORDER BY source_a, source_b""",
    ),
    _q(
        "returned_item_customers",
        lambda spark, sf: tpch.returned_item_customers(
            views(spark, sf)["customer"], views(spark, sf)["orders"],
            views(spark, sf)["lineitem"], views(spark, sf)["nation"]),
        # TPC-H Q10 shape: top-k customers by returned-item revenue;
        # top-k cut ordered on the rounded sum + custkey tiebreak
        """SELECT c_custkey, c_name, revenue,
  round(c_acctbal, 2) AS c_acctbal, n_name
FROM (
  SELECT c_custkey, c_name, c_acctbal, n_name,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY 1, 2, 3, 4
) ORDER BY revenue DESC, c_custkey LIMIT 20""",
    ),
    _q(
        "priority_line_counts",
        lambda spark, sf: tpch.priority_line_counts(
            views(spark, sf)["orders"], views(spark, sf)["lineitem"]),
        # TPC-H Q12 shape: conditional agg after the fact join
        """SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1 ORDER BY 1""",
        # benched since r6: the r5 driver-red row (HUGEINT oracle sum)
        # — a tracked number makes any environment sensitivity visible
        bench=True,
    ),
    _q(
        "forecast_revenue_change",
        lambda spark, sf: tpch.forecast_revenue_change(
            views(spark, sf)["lineitem"]),
        # TPC-H Q6 shape: scan-only agg, every predicate pushed
        """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.039 AND l_discount <= 0.061
  AND l_quantity < 24""",
    ),
    _q(
        "discounted_brand_revenue",
        lambda spark, sf: tpch.discounted_brand_revenue(
            views(spark, sf)["lineitem"], views(spark, sf)["part"]),
        # TPC-H Q19 shape: OR-of-ANDs spanning both join sides
        """SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2)
    AS revenue,
  count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 20
       AND p_size <= 10)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 30
       AND p_size <= 20)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 40
       AND p_size <= 30)
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "promo_revenue_share",
        lambda spark, sf: tpch.promo_revenue_share(
            views(spark, sf)["lineitem"], views(spark, sf)["part"]),
        # TPC-H Q14 shape: broadcast part join, per-month promo ratio
        """SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m')
    AS ship_month,
  round(100 * sum(CASE WHEN p_type = 'PROMO'
      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
    / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "volume_shipping",
        lambda spark, sf: tpch.volume_shipping(
            views(spark, sf)["lineitem"], views(spark, sf)["orders"],
            views(spark, sf)["customer"], views(spark, sf)["supplier"],
            views(spark, sf)["nation"]),
        # TPC-H Q7 shape: bilateral nation-pair trade flows per year
        """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
  year(l_shipdate) AS ship_year,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(*) AS n_lines
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE ns.n_name IN ('NATION_1', 'NATION_2')
  AND nc.n_name IN ('NATION_1', 'NATION_2')
  AND ns.n_name <> nc.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
        bench=True,
    ),
    _q(
        "national_market_share",
        lambda spark, sf: tpch.national_market_share(
            views(spark, sf)["lineitem"], views(spark, sf)["orders"],
            views(spark, sf)["customer"], views(spark, sf)["supplier"],
            views(spark, sf)["nation"], views(spark, sf)["region"]),
        # TPC-H Q8 shape: target nation's share of a region's market
        """SELECT year(o_orderdate) AS order_year,
  round(100 * sum(CASE WHEN ns.n_name = 'NATION_3'
      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
    / sum(l_extendedprice * (1 - l_discount)), 4) AS market_share_pct,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS region_revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE o_custkey IN (
  SELECT c_custkey FROM customer
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN region ON nc.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA')
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "product_type_profit",
        lambda spark, sf: tpch.product_type_profit(
            views(spark, sf)["lineitem"], views(spark, sf)["part"],
            views(spark, sf)["supplier"], views(spark, sf)["nation"]),
        # TPC-H Q9 shape: per-nation, per-year profit on one part type
        """SELECT n_name AS nation, year(l_shipdate) AS ship_year,
  round(sum(l_extendedprice * (1 - l_discount)
            - 0.1 * p_retailprice * l_quantity), 2) AS profit,
  count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'ECONOMY'
GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "top_supplier",
        lambda spark, sf: tpch.top_supplier(
            views(spark, sf)["lineitem"], views(spark, sf)["supplier"]),
        # TPC-H Q15 shape: max-over-aggregated-view; exact-integer qty
        """WITH sq AS (
  SELECT l_suppkey, sum(l_quantity) AS total_qty,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1)
SELECT s_suppkey, s_name, round(total_qty, 1) AS total_qty, revenue
FROM sq JOIN supplier ON l_suppkey = s_suppkey
WHERE total_qty = (SELECT max(total_qty) FROM sq)
ORDER BY s_suppkey""",
    ),
    _q(
        "important_suppliers",
        lambda spark, sf: tpch.important_suppliers(
            views(spark, sf)["lineitem"], views(spark, sf)["supplier"]),
        # TPC-H Q11 shape: HAVING against a global-scalar fraction
        """WITH sq AS (
  SELECT l_suppkey, sum(l_quantity) AS total_qty FROM lineitem GROUP BY 1)
SELECT s_suppkey, s_name, round(total_qty, 1) AS total_qty,
  round(100 * total_qty / (SELECT sum(total_qty) FROM sq), 4) AS share_pct
FROM sq JOIN supplier ON l_suppkey = s_suppkey
WHERE total_qty > 0.0105 * (SELECT sum(total_qty) FROM sq)
ORDER BY total_qty DESC, s_suppkey""",
    ),
    _q(
        "small_quantity_revenue",
        lambda spark, sf: tpch.small_quantity_revenue(
            views(spark, sf)["lineitem"], views(spark, sf)["part"]),
        # TPC-H Q17 shape: per-part correlated average-quantity cutoff
        """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
  count(*) AS n_lines
FROM (
  SELECT l_extendedprice, l_quantity,
    avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_brand = 'Brand#12'))
WHERE l_quantity < 0.5 * avg_qty""",
    ),
    _q(
        "waiting_orders_suppliers",
        lambda spark, sf: tpch.waiting_orders_suppliers(
            views(spark, sf)["lineitem"], views(spark, sf)["orders"],
            views(spark, sf)["supplier"]),
        # TPC-H Q21 shape: sole-late-shipper blame via per-order counts
        """WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        THEN 1 ELSE 0 END) AS was_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), blamed AS (
  SELECT l_suppkey FROM (
    SELECT l_suppkey, was_late,
      count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
      sum(was_late) OVER (PARTITION BY l_orderkey) AS n_late
    FROM per_os)
  WHERE was_late = 1 AND n_supp > 1 AND n_late = 1)
SELECT s_suppkey, s_name, numwait
FROM (SELECT l_suppkey, count(*) AS numwait FROM blamed GROUP BY 1)
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY numwait DESC, s_suppkey LIMIT 20""",
        bench=True,
    ),
    _q(
        "sales_opportunity",
        lambda spark, sf: tpch.sales_opportunity(
            views(spark, sf)["customer"], views(spark, sf)["orders"],
            views(spark, sf)["nation"]),
        # TPC-H Q22 shape: above-average balance + dormant anti-join
        """SELECT n_name, count(*) AS numcust,
  round(sum(c_acctbal), 2) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT round(avg(c_acctbal), 2) FROM customer
                   WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "min_cost_supplier",
        lambda spark, sf: tpch.min_cost_supplier(
            views(spark, sf)["lineitem"], views(spark, sf)["part"],
            views(spark, sf)["supplier"]),
        # TPC-H Q2 shape: per-part min-unit-price supplier via keyed
        # rank; unit cents in exact integer half-up math ((2a+b)//(2b))
        # — round(double ratio, 2) diverged cross-engine at sf0.1
        """WITH per_ps AS (
  SELECT p_partkey, p_name, l_suppkey,
    min((2 * CAST(round(l_extendedprice * 100) AS BIGINT)
         + CAST(l_quantity AS BIGINT))
        // (2 * CAST(l_quantity AS BIGINT))) / 100.0 AS min_unit_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size <= 15
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY p_partkey ORDER BY min_unit_price, l_suppkey) AS rn
  FROM per_ps)
SELECT p_partkey, p_name, s_suppkey, s_name, min_unit_price
FROM ranked JOIN supplier ON l_suppkey = s_suppkey
WHERE rn = 1 ORDER BY p_partkey""",
    ),
    _q(
        "cohort_retention",
        lambda spark, sf: eops.cohort_retention(views(spark, sf)["events"]),
        # weekly first-touch cohorts x week-offset retention triangle
        """WITH first AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_w
  FROM events GROUP BY 1
), sizes AS (
  SELECT cohort_w, count(*) AS cohort_size FROM first GROUP BY 1
), active AS (
  SELECT f.cohort_w,
    CAST(date_diff('day', f.cohort_w, a.w) / 7 AS INT) AS week_offset,
    count(*) AS n_active
  FROM (SELECT DISTINCT user_id, date_trunc('week', ts) AS w
        FROM events) a
  JOIN first f USING (user_id)
  GROUP BY 1, 2)
SELECT strftime(a.cohort_w, '%Y-%m-%d') AS cohort_week, week_offset,
  n_active, cohort_size, round(n_active * 1.0 / cohort_size, 6) AS retention
FROM active a JOIN sizes s ON a.cohort_w = s.cohort_w
ORDER BY 1, 2""",
    ),
    _q(
        "path_transitions",
        lambda spark, sf: eops.path_transitions(views(spark, sf)["events"]),
        # per-user consecutive event-type Markov transition matrix
        """WITH pairs AS (
  SELECT lag(event_type) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
    event_type AS next_type
  FROM events
), counts AS (
  SELECT prev_type, next_type, count(*) AS n_trans
  FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, n_trans,
  round(n_trans * 1.0 / sum(n_trans) OVER (PARTITION BY prev_type), 6)
    AS p_next
FROM counts ORDER BY 1, 2""",
    ),
    _q(
        "zipf_curve",
        lambda spark, sf: mining.zipf_curve(views(spark, sf)["documents"]),
        # top-20 token ranks + ln-ln least-squares slope over the top-1000
        """WITH words AS (
  SELECT unnest(string_split(
    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' ')) AS word
  FROM documents
), vocab AS (
  SELECT word, count(*) AS cnt FROM words WHERE word <> ''
  GROUP BY 1 ORDER BY cnt DESC, word LIMIT 1000
), ranked AS (
  SELECT word, cnt,
    row_number() OVER (ORDER BY cnt DESC, word) AS rank,
    ln(row_number() OVER (ORDER BY cnt DESC, word)) AS lx,
    ln(cnt) AS ly
  FROM vocab
), fit AS (
  SELECT
    round((count(*) * sum(lx * ly) - sum(lx) * sum(ly))
      / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)), 4) AS zipf_slope,
    round((sum(ly) - (count(*) * sum(lx * ly) - sum(lx) * sum(ly))
      / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)) * sum(lx))
      / count(*), 4) AS intercept
  FROM ranked)
SELECT rank, word, cnt, zipf_slope, intercept
FROM ranked, fit WHERE rank <= 20 ORDER BY rank""",
    ),
    _q(
        "parts_supplier_counts",
        lambda spark, sf: tpch.parts_supplier_counts(
            views(spark, sf)["lineitem"], views(spark, sf)["part"],
            views(spark, sf)["supplier"]),
        # TPC-H Q16 shape: distinct suppliers per part segment, NOT IN
        # blacklist as an anti-join
        """SELECT p_brand, p_type,
  CAST(floor(p_size / 10) * 10 AS INT) AS size_band,
  count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, size_band""",
    ),
    _q(
        "dominant_part_suppliers",
        lambda spark, sf: tpch.dominant_part_suppliers(
            views(spark, sf)["lineitem"], views(spark, sf)["part"],
            views(spark, sf)["supplier"]),
        # TPC-H Q20 shape: suppliers shipping >half a part's volume
        """WITH per_ps AS (
  SELECT p_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
  GROUP BY 1, 2
), dom AS (
  SELECT l_suppkey, qty FROM (
    SELECT l_suppkey, qty,
      sum(qty) OVER (PARTITION BY p_partkey) AS part_qty
    FROM per_ps)
  WHERE qty > 0.2 * part_qty)
SELECT s_suppkey, s_name, n_dominated_parts, dominated_qty
FROM (SELECT l_suppkey, count(*) AS n_dominated_parts,
        round(sum(qty), 1) AS dominated_qty
      FROM dom GROUP BY 1)
JOIN supplier ON l_suppkey = s_suppkey
ORDER BY n_dominated_parts DESC, s_suppkey""",
    ),
    _q(
        "minhash_recall",
        lambda spark, sf: dedup.minhash_recall(views(spark, sf)["documents"]),
        # sketch-vs-exact eval over a fixed-COUNT md5-ranked doc slice
        # (the whole corpus at gate scales): replay BOTH pair
        # generators (the exact capped-bucket Jaccard truth at >=0.5
        # and the banded minhash candidates at est>=0.35) and
        # full-outer join the pair keys
        f"""WITH sampdocs AS (
  SELECT doc_id, text FROM documents
  ORDER BY CAST(('0x' || substr(md5('{dedup.MINRECALL_SALT}:'
    || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT), doc_id
  LIMIT {dedup.MINRECALL_SAMPLE_N}
), words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM sampdocs
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.5
), hs AS (
  SELECT doc_id, list_transform(
    list_distinct(list_transform(
      range(1, greatest(len(w) - 2, 0) + 1),
      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])),
    s -> CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT)) AS hs
  FROM words
), sig AS (
  SELECT doc_id, [{_minhash_sig_sql()}] AS sig FROM hs
), bands AS (
  SELECT doc_id, sig, band,
    md5(concat_ws(',', sig[band * 4 + 1], sig[band * 4 + 2],
                  sig[band * 4 + 3], sig[band * 4 + 4])) AS bucket
  FROM (SELECT doc_id, sig, unnest(range(8)) AS band FROM sig)
), okb AS (
  SELECT band, bucket FROM bands GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND 200
), bf AS (
  SELECT bands.* FROM bands JOIN okb USING (band, bucket)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bf a JOIN bf b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  WHERE len(list_filter(list_zip(a.sig, b.sig), x -> x[1] = x[2])) / 32.0
    >= 0.35
), ev AS (
  SELECT coalesce(t.doc_a, c.doc_a) AS doc_a,
    (t.doc_a IS NOT NULL)::INT AS in_truth,
    (c.doc_a IS NOT NULL)::INT AS in_cand
  FROM truth t FULL JOIN cand c USING (doc_a, doc_b))
SELECT CAST(sum(in_truth) AS BIGINT) AS n_truth,
  CAST(sum(in_cand) AS BIGINT) AS n_cand,
  CAST(sum(in_truth * in_cand) AS BIGINT) AS n_hit,
  (CAST(sum(in_truth * in_cand) AS BIGINT) * 1000000)
    // CAST(sum(in_truth) AS BIGINT) AS recall_ppm,
  (CAST(sum(in_truth * in_cand) AS BIGINT) * 1000000)
    // CAST(sum(in_cand) AS BIGINT) AS precision_ppm
FROM ev""",
    ),
    _q(
        "ann_recall",
        lambda spark, sf: similarity.ann_recall(
            views(spark, sf)["embeddings"]),
        # recall@10 of the LSH index vs the exact brute-force top-k,
        # replaying both sides (same literal hyperplanes as knn_lsh)
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (0, 1, 2)
), scored AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6) AS cos_sim
  FROM embeddings, q WHERE vec_id <> query_id
), truth AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM scored
  ) WHERE rank <= 10
), sig AS (
  SELECT vec_id, embedding,
    ({_lsh_sig_adaptive_sql('embedding')})
    AS sig
  FROM embeddings
), ql AS (
  SELECT vec_id AS query_id, embedding AS qe, sig AS qsig FROM sig
  WHERE vec_id IN (0, 1, 2)
), cand AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6) AS cos_sim
  FROM sig, ql
  WHERE bit_count(xor(sig, qsig)) <= 2 AND vec_id <> query_id
), approx AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM cand
  ) WHERE rank <= 10
)
SELECT t.query_id,
  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hit,
  count(*) AS n_truth,
  (CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000) // count(*) AS recall_ppm,
  (SELECT CASE WHEN count(*) <= {_GATE_EMB_N}
     THEN {similarity.suggest_n_planes(_GATE_EMB_N)}
     ELSE {similarity.suggest_n_planes(_SF01_EMB_N)} END
   FROM embeddings) AS n_planes
FROM truth t LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "dedup_cluster_stats",
        lambda spark, sf: dedup.cluster_size_stats(
            views(spark, sf)["documents"]),
        # size histogram over the same cluster membership as
        # dedup_clusters (shared _CLUSTERS_CTE)
        oracle=f"""{_CLUSTERS_CTE},
csizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM members GROUP BY 1)
SELECT cluster_size, count(*) AS n_clusters,
  cluster_size * count(*) AS n_docs
FROM csizes GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "source_lang_matrix",
        lambda spark, sf: text.source_lang_matrix(
            views(spark, sf)["documents"]),
        # wide per-source language composition (explicit pivot domain)
        """SELECT source,
  count(*) FILTER (lang = 'de') AS de,
  count(*) FILTER (lang = 'en') AS en,
  count(*) FILTER (lang = 'es') AS es,
  count(*) FILTER (lang = 'fr') AS fr,
  count(*) FILTER (lang = 'zh') AS zh,
  count(*) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "events_weekly_growth",
        lambda spark, sf: eops.weekly_growth(views(spark, sf)["events"]),
        # week-over-week growth via lag over the weekly aggregate
        """WITH weekly AS (
  SELECT event_type, date_trunc('week', ts) AS w,
    count(*) AS n_events
  FROM events GROUP BY 1, 2)
SELECT event_type, strftime(w, '%Y-%m-%d') AS week, n_events,
  lag(n_events) OVER (PARTITION BY event_type ORDER BY w) AS prev_events,
  round((n_events - lag(n_events) OVER (PARTITION BY event_type
      ORDER BY w)) * 100.0
    / lag(n_events) OVER (PARTITION BY event_type ORDER BY w), 4)
    AS wow_pct
FROM weekly ORDER BY 1, 2""",
    ),
    _q(
        "quality_funnel",
        lambda spark, sf: text.quality_funnel(views(spark, sf)["documents"]),
        # sequential Gopher-rule attrition: stage i survivors = conj of
        # rules 1..i (same rule exprs as the gopher_quality oracle)
        f"""WITH m AS (
  SELECT
    len(string_split(text, ' ')) AS n_words,
    (length(text) - len(string_split(text, ' ')) + 1)
      / len(string_split(text, ' ')) AS mean_wl,
    (length(text)
      - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))
      / greatest(len(string_split(text, ' ')), 1) AS sym_ratio,
    len(list_intersect(list_distinct(string_split(text, ' ')),
        ['the', 'a', 'of', 'and', 'to', 'in'])) AS n_sw,
    len(list_filter(string_split(text, ' '),
        w -> regexp_matches(w, '[a-zA-Z]')))
      / greatest(len(string_split(text, ' ')), 1) AS alpha_ratio
  FROM documents
), f AS (
  SELECT count(*) AS n_in,
    CAST(sum(((n_words >= {text.GOPHER_MIN_WORDS}
      AND n_words <= {text.GOPHER_MAX_WORDS}))::INT) AS BIGINT) AS s0,
    CAST(sum(((n_words >= {text.GOPHER_MIN_WORDS}
      AND n_words <= {text.GOPHER_MAX_WORDS})
      AND (mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
        AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN}))::INT)
      AS BIGINT) AS s1,
    CAST(sum(((n_words >= {text.GOPHER_MIN_WORDS}
      AND n_words <= {text.GOPHER_MAX_WORDS})
      AND (mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
        AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN})
      AND sym_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO})::INT)
      AS BIGINT) AS s2,
    CAST(sum(((n_words >= {text.GOPHER_MIN_WORDS}
      AND n_words <= {text.GOPHER_MAX_WORDS})
      AND (mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
        AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN})
      AND sym_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO}
      AND n_sw >= {text.GOPHER_MIN_DISTINCT_STOPWORDS})::INT)
      AS BIGINT) AS s3,
    CAST(sum(((n_words >= {text.GOPHER_MIN_WORDS}
      AND n_words <= {text.GOPHER_MAX_WORDS})
      AND (mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
        AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN})
      AND sym_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO}
      AND n_sw >= {text.GOPHER_MIN_DISTINCT_STOPWORDS}
      AND alpha_ratio >= {text.GOPHER_MIN_ALPHA_WORD_RATIO})::INT)
      AS BIGINT) AS s4
  FROM m
)
SELECT * FROM (
  SELECT CAST(1 AS INT) AS stage, 'ok_word_count' AS rule,
    n_in AS docs_in, s0 AS docs_out, n_in - s0 AS n_dropped,
    round(s0 * 100.0 / n_in, 4) AS cum_pct FROM f
  UNION ALL SELECT CAST(2 AS INT), 'ok_mean_word_len', s0, s1, s0 - s1,
    round(s1 * 100.0 / n_in, 4) FROM f
  UNION ALL SELECT CAST(3 AS INT), 'ok_symbol_ratio', s1, s2, s1 - s2,
    round(s2 * 100.0 / n_in, 4) FROM f
  UNION ALL SELECT CAST(4 AS INT), 'ok_stopwords', s2, s3, s2 - s3,
    round(s3 * 100.0 / n_in, 4) FROM f
  UNION ALL SELECT CAST(5 AS INT), 'ok_alpha_words', s3, s4, s3 - s4,
    round(s4 * 100.0 / n_in, 4) FROM f
) ORDER BY stage""",
    ),
    _q(
        "boilerplate_paragraphs",
        lambda spark, sf: dedup.boilerplate_paragraphs(
            views(spark, sf)["documents"], para_words=20, min_df=3),
        # frequency-threshold boilerplate: every occurrence of a
        # paragraph seen in >= 3 distinct docs removed (no keeper);
        # cleaned_fp = md5 over the kept fingerprints in para order
        f"""WITH w AS (
  SELECT doc_id, string_split_regex(trim({_NORM}), ' +') AS ws
  FROM documents WHERE trim({_NORM}) <> ''
), ix AS (
  SELECT doc_id, ws,
    unnest(range(0, CAST(ceil(len(ws) / 20.0) AS BIGINT))) AS i
  FROM w
), e AS (
  SELECT doc_id, CAST(i AS INT) AS para_idx,
    md5(array_to_string(ws[(i * 20 + 1):(i * 20 + 20)], ' ')) AS fp
  FROM ix
), dfreq AS (
  SELECT fp, count(DISTINCT doc_id) AS df FROM e GROUP BY 1
), flagged AS (
  SELECT e.doc_id, e.para_idx, e.fp, dfreq.df >= 3 AS boiler
  FROM e JOIN dfreq USING (fp)
)
SELECT doc_id, count(*) AS n_paras,
  CAST(sum(boiler::INT) AS BIGINT) AS n_removed,
  round((count(*) - sum(boiler::INT)) / count(*), 6) AS frac_kept,
  md5(coalesce(string_agg(CASE WHEN NOT boiler THEN fp END, ''
    ORDER BY para_idx), '')) AS cleaned_fp
FROM flagged GROUP BY doc_id ORDER BY doc_id""",
        bench=True,
    ),
    _q(
        "embedding_outliers",
        lambda spark, sf: similarity.embedding_outliers(
            views(spark, sf)["embeddings"]),
        # per-label top-5 centroid-distance outliers in the
        # kmeans_assign fixed-point scheme: exact int sums -> one
        # int/int division per mean, same left-assoc distance fold,
        # floored int distances ranked desc with a vec_id tiebreak
        f"""WITH q AS (
  SELECT vec_id, label, list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * {similarity.KM_QUANT}) AS BIGINT))
    AS qv
  FROM embeddings
), c AS (
  SELECT label,
    {", ".join(f"sum(qv[{i + 1}]) / count(*) AS m{i + 1}"
               for i in range(64))}
  FROM q GROUP BY label
), s AS (
  SELECT q.vec_id, q.label,
    CAST(floor({" + ".join(
        f"(q.qv[{i + 1}] - c.m{i + 1}) * (q.qv[{i + 1}] - c.m{i + 1})"
        for i in range(64))}) AS BIGINT) AS d
  FROM q JOIN c ON q.label = c.label
), t AS (
  SELECT label, CAST(sum(d) AS BIGINT) AS sum_d, count(*) AS n
  FROM s GROUP BY 1
), r AS (
  SELECT vec_id, label, d,
    CAST(row_number() OVER (PARTITION BY label
      ORDER BY d DESC, vec_id) AS INT) AS rank
  FROM s
)
SELECT r.label, r.rank, r.vec_id, r.d AS dist_sq_q,
  round((r.d * t.n) / t.sum_d, 4) AS dist_ratio
FROM r JOIN t USING (label)
WHERE r.rank <= 5
ORDER BY r.label, r.rank""",
    ),
    _q(
        "ivf_recall",
        lambda spark, sf: similarity.ivf_recall(
            views(spark, sf)["embeddings"]),
        # recall@10 of the IVF index (same centroid/probe math as the
        # knn_ivf oracle) vs the exact brute-force top-k
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (20, 21, 22)
), scored AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6) AS cos_sim
  FROM embeddings, q WHERE vec_id <> query_id
), truth AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM scored
  ) WHERE rank <= 10
), ncent AS (
  -- half-even power-of-two rounding; see the knn_ivf oracle note
  SELECT greatest(4, least(65536, CAST(power(2,
    floor(x) + CASE WHEN x - floor(x) > 0.5 THEN 1
      WHEN x - floor(x) = 0.5 THEN CAST(floor(x) AS BIGINT) % 2
      ELSE 0 END) AS BIGINT))) AS nc
  FROM (SELECT log2(greatest(sqrt(count(*) * 1.0), 4)) AS x
        FROM embeddings)
), cents AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings, ncent
  WHERE vec_id < nc
), assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_DOT.format(a='e.embedding', b='c.c')} DESC,
                 c.centroid_id DESC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
), probe AS (
  SELECT query_id, qe, centroid_id FROM (
    SELECT q.query_id, q.qe, c.centroid_id,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY {_DOT.format(a='q.qe', b='c.c')} DESC,
                 c.centroid_id ASC) AS rn
    FROM q, cents c
  ) WHERE rn <= {similarity.N_PROBE}
), cand AS (
  SELECT p.query_id, a.vec_id,
    round({_DOT.format(a='p.qe', b='a.embedding')}
      / (sqrt({_DOT.format(a='p.qe', b='p.qe')})
         * sqrt({_DOT.format(a='a.embedding', b='a.embedding')})), 6)
      AS cos_sim
  FROM assigned a JOIN probe p ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id
), approx AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM cand
  ) WHERE rank <= 10
)
SELECT t.query_id,
  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hit,
  count(*) AS n_truth,
  (CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000) // count(*) AS recall_ppm
FROM truth t LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "lsh_bucket_stats",
        lambda spark, sf: dedup.lsh_bucket_stats(
            views(spark, sf)["documents"]),
        # per-band bucket-size skew report over the same banding as
        # dedup_minhash_lsh (shared _MINHASH_BANDS_CTES prelude)
        _MINHASH_BANDS_CTES.format(norm=_NORM, sig_body=_minhash_sig_sql())
        + """, sizes AS (
  SELECT band, bucket, count(*) AS sz FROM bands GROUP BY 1, 2
)
SELECT CAST(band AS INT) AS band, count(*) AS n_buckets,
  CAST(sum((sz = 1)::INT) AS BIGINT) AS n_singleton,
  CAST(sum((sz BETWEEN 2 AND 200)::INT) AS BIGINT) AS n_pairable,
  CAST(sum((sz > 200)::INT) AS BIGINT) AS n_saturated,
  CAST(sum(CASE WHEN sz > 200 THEN sz ELSE 0 END) AS BIGINT)
    AS docs_in_saturated,
  max(sz) AS max_bucket_sz,
  CAST(sum(CASE WHEN sz BETWEEN 2 AND 200 THEN sz * (sz - 1) // 2
    ELSE 0 END) AS BIGINT) AS pair_candidates
FROM sizes GROUP BY band ORDER BY band""",
        bench=True,
    ),
    _q(
        "events_daily_anomalies",
        lambda spark, sf: eops.daily_anomalies(views(spark, sf)["events"]),
        # median/MAD robust anomaly flag over exact-integer daily counts
        """WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events GROUP BY 1, 2
), med AS (
  SELECT event_type, median(n_events) AS med FROM daily GROUP BY 1
), dev AS (
  SELECT d.event_type, d.day, d.n_events, m.med,
    abs(d.n_events - m.med) AS adev
  FROM daily d JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1
)
SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n_events,
  d.med, m.mad, d.adev > 3.0 * m.mad AS is_anomaly
FROM dev d JOIN mad m USING (event_type)
ORDER BY 1, 2""",
    ),
    _q(
        "table_profile",
        lambda spark, sf: sketch.table_profile(
            views(spark, sf)["lineitem"],
            ["l_orderkey", "l_suppkey", "l_linenumber",
             "l_returnflag", "l_linestatus"]),
        # one-pass per-column profile; KMV estimate replays the 52-bit
        # md5 math exactly ((k-1) * 2^52 / h_k, k = 256)
        f"""WITH vals AS (
  SELECT 'l_orderkey' AS col_name, CAST(l_orderkey AS VARCHAR) AS v
  FROM lineitem
  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
  UNION ALL SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR)
  FROM lineitem
  UNION ALL SELECT 'l_returnflag', l_returnflag FROM lineitem
  UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
), stats AS (
  SELECT col_name, count(*) AS n_rows,
    CAST(sum((v IS NULL)::INT) AS BIGINT) AS n_nulls,
    min(v) AS min_val, max(v) AS max_val
  FROM vals GROUP BY 1
), d AS (
  SELECT DISTINCT col_name, v FROM vals WHERE v IS NOT NULL
), h AS (
  SELECT col_name, v,
    CAST(('0x' || substr(md5(v), 1, 13)) AS BIGINT) AS h
  FROM d
), r AS (
  SELECT col_name, h,
    row_number() OVER (PARTITION BY col_name ORDER BY h, v) AS rn
  FROM h
), agg AS (
  SELECT col_name, count(*) AS n_distinct,
    max(CASE WHEN rn = {sketch.KMV_K} THEN h END) AS hk
  FROM r GROUP BY 1
)
SELECT s.col_name, s.n_rows, s.n_nulls, a.n_distinct,
  round(CASE WHEN a.n_distinct < {sketch.KMV_K}
    THEN a.n_distinct * 1.0
    ELSE {(sketch.KMV_K - 1) * float(1 << 52)} / a.hk END, 4)
    AS kmv_estimate,
  s.min_val, s.max_val
FROM stats s JOIN agg a USING (col_name) ORDER BY col_name""",
    ),
    _q(
        "dedup_containment",
        lambda spark, sf: dedup.containment_pairs(
            views(spark, sf)["documents"], threshold=0.8),
        # Broder max-containment over the same capped inverted index as
        # dedup_ngram_jaccard; WHERE applies to the unrounded ratio
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
  round(n_common / least(sa.n_sh, sb.n_sh), 6) AS containment,
  round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / least(sa.n_sh, sb.n_sh) >= 0.8
ORDER BY 1, 2""",
    ),
    _q(
        "corpus_growth_curve",
        lambda spark, sf: dedup.growth_curve(views(spark, sf)["documents"]),
        # dedup-saturation curve: first-occurrence fingerprints per
        # doc_id-range decile, with cumulative distinct fraction
        f"""WITH base AS (
  SELECT doc_id, md5({_NORM}) AS fp FROM documents
), mx AS (SELECT max(doc_id) AS m FROM base),
flagged AS (
  SELECT doc_id,
    (row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1)::INT
    AS is_new
  FROM base
), b AS (
  SELECT CAST(doc_id * 10 // (m + 1) AS INT) AS bucket, is_new
  FROM flagged, mx
), agg AS (
  SELECT bucket, count(*) AS n_docs,
    CAST(sum(is_new) AS BIGINT) AS n_new
  FROM b GROUP BY 1
)
SELECT bucket, n_docs, n_new,
  CAST(sum(n_docs) OVER (ORDER BY bucket) AS BIGINT) AS cum_docs,
  CAST(sum(n_new) OVER (ORDER BY bucket) AS BIGINT) AS cum_new,
  round(sum(n_new) OVER (ORDER BY bucket) * 1.0
    / sum(n_docs) OVER (ORDER BY bucket), 6) AS distinct_frac
FROM agg ORDER BY bucket""",
        bench=True,
    ),
    _q(
        "events_stickiness",
        lambda spark, sf: eops.stickiness(views(spark, sf)["events"]),
        # DAU / trailing-7d-WAU: (user, day) pairs fanned to the 7
        # target days they count toward, then exact distinct per day
        """WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), fan AS (
  SELECT ud.day + CAST(o.o AS INT) AS day, ud.user_id
  FROM ud, (SELECT unnest(range(0, 7)) AS o) o
), wau AS (
  SELECT day, count(DISTINCT user_id) AS wau FROM fan GROUP BY 1
), dau AS (
  SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
  round(d.dau * 1.0 / w.wau, 6) AS stickiness
FROM dau d JOIN wau w USING (day) ORDER BY 1""",
    ),
    _q(
        "events_type_cooccurrence",
        lambda spark, sf: eops.type_cooccurrence(views(spark, sf)["events"]),
        # distinct-user overlap per type pair + lift vs independence
        """WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
), per_type AS (
  SELECT event_type, count(*) AS n FROM ut GROUP BY 1
), nu AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    count(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_both, ta.n AS n_a, tb.n AS n_b,
  round((p.n_both * nu.n_users) / (ta.n * tb.n), 6) AS lift
FROM pairs p
JOIN per_type ta ON ta.event_type = p.type_a
JOIN per_type tb ON tb.event_type = p.type_b
CROSS JOIN nu
ORDER BY 1, 2""",
    ),
    _q(
        "kmv_source_overlap",
        lambda spark, sf: sketch.kmv_source_overlap(
            views(spark, sf)["documents"]),
        # mergeable KMV set algebra per source pair: union k-minima =
        # k smallest of the two k-min lists; inclusion-exclusion for
        # the intersection; same 52-bit md5 hashes as the Spark side
        f"""WITH words AS (
  SELECT source, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
), toks AS (
  SELECT DISTINCT source,
    CAST(('0x' || substr(md5(g), 1, 13)) AS BIGINT) AS h
  FROM (
    SELECT source, w[i] || ' ' || w[i + 1] AS g
    FROM (SELECT source, w,
            unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
          FROM words))
), stats AS (
  SELECT source, count(*) AS nd FROM toks GROUP BY 1
), r AS (
  SELECT source, h,
    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM toks
), sk AS (
  SELECT source, list_sort(list(h)) AS hs
  FROM r WHERE rn <= {sketch.KMV_K} GROUP BY 1
), p AS (
  SELECT a.source AS src_a, b.source AS src_b, a.hs AS ha, b.hs AS hb,
    sa.nd AS nd_a, sb.nd AS nd_b
  FROM sk a JOIN sk b ON a.source < b.source
  JOIN stats sa ON sa.source = a.source
  JOIN stats sb ON sb.source = b.source
), m AS (
  SELECT *,
    list_sort(list_distinct(list_concat(ha, hb)))[1:{sketch.KMV_K}] AS mg
  FROM p
), e AS (
  SELECT src_a, src_b,
    CASE WHEN nd_a < {sketch.KMV_K} THEN CAST(nd_a AS DOUBLE)
      ELSE {(sketch.KMV_K - 1) * float(1 << 52)} / ha[{sketch.KMV_K}] END
      AS ea,
    CASE WHEN nd_b < {sketch.KMV_K} THEN CAST(nd_b AS DOUBLE)
      ELSE {(sketch.KMV_K - 1) * float(1 << 52)} / hb[{sketch.KMV_K}] END
      AS eb,
    CASE WHEN len(mg) < {sketch.KMV_K} THEN CAST(len(mg) AS DOUBLE)
      ELSE {(sketch.KMV_K - 1) * float(1 << 52)} / mg[{sketch.KMV_K}] END
      AS eu
  FROM m
)
SELECT src_a, src_b, round(ea, 4) AS est_a, round(eb, 4) AS est_b,
  round(eu, 4) AS union_est,
  round(greatest(0.0, ea + eb - eu), 4) AS inter_est,
  round(greatest(0.0, ea + eb - eu) / eu, 6) AS jaccard_est
FROM e ORDER BY 1, 2""",
    ),
    _q(
        "label_agreement",
        lambda spark, sf: text.label_agreement(views(spark, sf)["documents"]),
        # same stopword-profile classifier as language_id, folded to a
        # per-source agreement/undecided report
        """WITH s AS (
  SELECT source, lang,
    len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a', 'and'))) AS hits_en,
    len(list_filter(string_split(text, ' '), w -> w IN ('der', 'und', 'die'))) AS hits_de,
    len(list_filter(string_split(text, ' '), w -> w IN ('el', 'la', 'los'))) AS hits_es,
    len(list_filter(string_split(text, ' '), w -> w IN ('le', 'et', 'les'))) AS hits_fr
  FROM documents
), p AS (
  SELECT source, lang, CASE
    WHEN greatest(hits_en, hits_de, hits_es, hits_fr) = 0 THEN 'und'
    WHEN hits_en = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'en'
    WHEN hits_de = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'de'
    WHEN hits_es = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'es'
    ELSE 'fr' END AS predicted
  FROM s
)
SELECT source, count(*) AS n_docs,
  CAST(sum((predicted = lang)::INT) AS BIGINT) AS n_agree,
  CAST(sum((predicted = 'und')::INT) AS BIGINT) AS n_undecided,
  round(sum((predicted = lang)::INT) / count(*), 6) AS agree_rate
FROM p GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "frequent_ngrams",
        lambda spark, sf: dedup.frequent_ngrams(views(spark, sf)["documents"]),
        # top-50 8-grams by distinct-document frequency (memorization
        # removal list); ties broken by the ngram string
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 7, 0) + 1),
    i -> {" || ' ' || ".join(f"w[i + {j}]" for j in range(8))}))) AS shingle
  FROM words WHERE len(w) >= 8
), dfreq AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY 1
)
SELECT row_number() OVER (ORDER BY df DESC, shingle) AS rank,
  shingle AS ngram, df
FROM dfreq ORDER BY df DESC, shingle LIMIT 50""",
    ),
    _q(
        "pq_reconstruction_report",
        lambda spark, sf: similarity.pq_reconstruction_report(
            views(spark, sf)["embeddings"]),
        # per-label exact-integer PQ reconstruction error over the same
        # codes as pq_codes (shared _PQ_CTES)
        _PQ_CTES + f""", lab AS (
  SELECT vec_id, label FROM embeddings
)
SELECT label,
  CAST(count(*) // {similarity.PQ_M} AS BIGINT) AS n_vecs,
  CAST(sum(dist) AS BIGINT) AS total_err,
  round(sum(dist) * 1.0 / count(*), 4) AS avg_err_per_sub
FROM best JOIN lab USING (vec_id)
WHERE rn = 1 GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "ivf_list_balance",
        lambda spark, sf: similarity.ivf_list_balance(
            views(spark, sf)["embeddings"]),
        # list sizes under the same assignment rule as knn_ivf
        f"""WITH cents AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings
  WHERE vec_id < {similarity.N_CENTROIDS}
), assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_DOT.format(a='e.embedding', b='c.c')} DESC,
                 c.centroid_id DESC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
), sizes AS (
  SELECT centroid_id, count(*) AS n_vecs FROM assigned GROUP BY 1
), t AS (SELECT sum(n_vecs) AS tot FROM sizes)
SELECT centroid_id, n_vecs,
  round(n_vecs / tot, 6) AS share,
  round(n_vecs * {similarity.N_CENTROIDS} / tot, 4) AS skew
FROM sizes, t ORDER BY 1""",
    ),
    _q(
        "events_session_distribution",
        lambda spark, sf: eops.session_distribution(
            views(spark, sf)["events"]),
        # one-row session-shape summary over the shared sessionize CTE;
        # quantile_cont matches Spark's exact interpolated percentile
        _SESSIONIZE_CTES + """
SELECT count(*) AS n_sessions,
  round(quantile_cont(n_events, 0.5), 4) AS p50_events,
  round(quantile_cont(n_events, 0.9), 4) AS p90_events,
  round(quantile_cont(n_events, 0.99), 4) AS p99_events,
  max(n_events) AS max_events,
  round(quantile_cont(duration_s, 0.5), 4) AS p50_duration_s,
  round(quantile_cont(duration_s, 0.9), 4) AS p90_duration_s,
  round(quantile_cont(duration_s, 0.99), 4) AS p99_duration_s,
  max(duration_s) AS max_duration_s
FROM sess""",
    ),
    _q(
        "order_ship_latency",
        lambda spark, sf: tpch.order_ship_latency(
            views(spark, sf)["orders"], views(spark, sf)["lineitem"]),
        # exact integer day latencies; per-priority exact percentiles
        """WITH lat AS (
  SELECT o.o_orderpriority,
    date_diff('day', CAST(o.o_orderdate AS DATE),
              CAST(l.l_shipdate AS DATE)) AS days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority, count(*) AS n_items,
  round(quantile_cont(days, 0.5), 4) AS p50_days,
  round(quantile_cont(days, 0.9), 4) AS p90_days,
  round(quantile_cont(days, 0.99), 4) AS p99_days,
  CAST(max(days) AS BIGINT) AS max_days
FROM lat GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "split_leakage",
        lambda spark, sf: pipeline.split_leakage(views(spark, sf)["documents"]),
        # same md5 split rule as training_shards; split-set per content
        # fingerprint, leak = a set spanning more than one split
        f"""WITH base AS (
  SELECT CASE
    WHEN CAST('0x' || substr(md5('{pipeline.SPLIT_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10000
      < {pipeline.SPLIT_CUTS[0][1]} THEN 'train'
    WHEN CAST('0x' || substr(md5('{pipeline.SPLIT_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10000
      < {pipeline.SPLIT_CUTS[1][1]} THEN 'val'
    ELSE 'test' END AS split,
    md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp
  FROM documents
), per AS (
  SELECT fp,
    array_to_string(list_sort(list_distinct(list(split))), '+')
      AS split_set,
    count(*) AS n_docs
  FROM base GROUP BY fp
)
SELECT split_set, count(*) AS n_fingerprints,
  CAST(sum(n_docs) AS BIGINT) AS n_docs,
  contains(split_set, '+') AS is_leak
FROM per GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "events_ewma_forecast",
        lambda spark, sf: eops.ewma_forecast(views(spark, sf)["events"]),
        # alpha=1/2 EWMA: every halving is an exact exponent shift, so
        # the left fold replays bit-identically via list_reduce
        """WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), arr AS (
  SELECT event_type,
    list_transform(list(n ORDER BY day), x -> CAST(x AS DOUBLE)) AS vals
  FROM daily GROUP BY 1
), e AS (
  SELECT event_type, vals, len(vals) AS n_days,
    list_reduce(vals, (a, x) -> (a + x) / 2) AS ewma,
    list_transform(range(2, len(vals) + 1), t -> abs(
      vals[CAST(t AS INT)] - CASE WHEN t = 2 THEN vals[1]
        ELSE list_reduce(vals[1:CAST(t AS INT) - 1],
                         (a, x) -> (a + x) / 2) END)) AS errs
  FROM arr
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
  round(ewma, 6) AS ewma_forecast,
  CASE WHEN n_days >= 2
    THEN round(list_reduce(errs, (a, x) -> a + x) / len(errs), 6)
  END AS backtest_mae
FROM e ORDER BY 1""",
    ),
    _q(
        "approx_group_counts",
        lambda spark, sf: pipeline.approx_group_counts(
            views(spark, sf)["documents"]),
        # Horvitz-Thompson scale-up from the md5 Bernoulli sample (rate
        # 0.1 -> key < 1000 of 10000), exact count alongside
        """WITH k AS (
  SELECT lang,
    (CAST('0x' || substr(md5('htsample-v1:' || CAST(doc_id AS VARCHAR)),
      1, 7) AS BIGINT) % 10000 < 1000) AS in_sample
  FROM documents
)
SELECT lang, count(*) AS exact_docs,
  CAST(sum(in_sample::INT) AS BIGINT) AS sampled_docs,
  round(sum(in_sample::INT) / 0.1, 4) AS ht_estimate,
  round(abs(sum(in_sample::INT) / 0.1 - count(*)) / count(*), 6)
    AS rel_err
FROM k GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "bpe_merge_candidates",
        lambda spark, sf: mining.bpe_merge_candidates(
            views(spark, sf)["documents"]),
        # one BPE training step: adjacent symbol-pair counts over the
        # vocabulary, weighted by word frequency with multiplicity
        f"""WITH w AS (
  SELECT unnest(list_filter(string_split({_NORM}, ' '), x -> x <> ''))
    AS word
  FROM documents
), vocab AS (
  SELECT word, count(*) AS freq FROM w GROUP BY 1
), pairs AS (
  SELECT word, freq, substr(word, CAST(i AS INT), 2) AS pair
  FROM (SELECT word, freq, unnest(range(1, length(word))) AS i
        FROM vocab WHERE length(word) >= 2)
), agg AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS total_count,
    count(DISTINCT word) AS n_words
  FROM pairs GROUP BY 1
)
SELECT row_number() OVER (ORDER BY total_count DESC, pair) AS rank,
  pair, total_count, n_words
FROM agg ORDER BY total_count DESC, pair LIMIT 50""",
    ),
]


def _centrality_sql(iters: int = dedup.CENTRALITY_ITERS,
                    k: int = dedup.CENTRALITY_K,
                    reps: bool = False) -> str:
    """DuckDB twin of dup_graph_centrality (and, with reps=True, of
    dup_graph_centrality_reps): the capped-bucket Jaccard pair graph at
    threshold 0.1 — over raw docs, or over exact-duplicate
    representatives (md5-fingerprint contraction, rep = min doc_id) —
    then `iters` unrolled damped integer-ppm propagation steps (floor
    division throughout — bit-identical to the Spark loop); the reps
    variant fans final scores back to every member of each
    representative's fingerprint group."""
    damp = dedup.CENTRALITY_DAMP_PPM
    base = 1_000_000 - damp
    if reps:
        head = f"""WITH fpt AS (
  SELECT doc_id, md5({_NORM}) AS fp FROM documents
), grp AS (
  SELECT fp, min(doc_id) AS rep, count(*) AS n_members FROM fpt GROUP BY 1
), words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w
  FROM documents JOIN grp ON doc_id = grp.rep
  WHERE len(string_split({_NORM}, ' ')) >= 3
)"""
    else:
        head = f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
)"""
    sql = head + f""", sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), deg AS (
  SELECT src, count(*) AS deg FROM edges GROUP BY 1
), s0 AS (
  SELECT src AS node, CAST(1000000 AS BIGINT) AS score FROM deg
)"""
    for t in range(1, iters + 1):
        sql += f""", s{t} AS (
  SELECT d.src AS node,
    CAST({base} + ({damp} * coalesce(i.infl, 0)) // 1000000 AS BIGINT)
      AS score
  FROM deg d LEFT JOIN (
    SELECT e.dst, CAST(sum(s.score // dg.deg) AS BIGINT) AS infl
    FROM edges e JOIN deg dg ON e.src = dg.src
    JOIN s{t - 1} s ON s.node = e.src
    GROUP BY 1) i ON i.dst = d.src
)"""
    if reps:
        sql += f"""
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY score DESC, m.doc_id) AS BIGINT)
      AS rank,
    m.doc_id, g.rep AS rep_id, deg, score,
    CAST(g.n_members AS BIGINT) AS n_members
  FROM s{iters} s JOIN deg ON s.node = deg.src
  JOIN grp g ON g.rep = s.node
  JOIN fpt m ON m.fp = g.fp
) WHERE rank <= {k} ORDER BY rank"""
    else:
        sql += f"""
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY score DESC, node) AS BIGINT)
      AS rank,
    node AS doc_id, deg, score
  FROM s{iters} JOIN deg ON node = src
) WHERE rank <= {k} ORDER BY rank"""
    return sql


# Round-6 additions.  All outputs are exact integers (counts, ppm floor
# divisions, order statistics) except where an existing verified float
# pattern is reused — the r5 hash-robustness rule applied from birth.
R6_QUERIES = [
    _q(
        "dup_graph_centrality",
        lambda spark, sf: dedup.dup_graph_centrality(
            views(spark, sf)["documents"]),
        # damped integer-ppm propagation over the near-dup pair graph,
        # 3 unrolled iterations, floor division both engines
        _centrality_sql(),
    ),
    _q(
        "events_funnel_latency",
        lambda spark, sf: eops.funnel_latency(views(spark, sf)["events"]),
        # time-to-convert per funnel transition: exact integer-second
        # deltas off the same min-timestamp cascade as event_funnel,
        # percentiles as exact order statistics (rank = ceil(n/2) /
        # ceil(0.9n), user_id tiebreak) — never interpolated quantiles
        """WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1
), d AS (
  SELECT 2 AS step_idx, 'view->click' AS transition, s2.user_id,
    date_diff('second', s1.t, s2.t) AS delta_s
  FROM s2 JOIN s1 USING (user_id)
  UNION ALL
  SELECT 3, 'click->purchase', s3.user_id,
    date_diff('second', s2.t, s3.t)
  FROM s3 JOIN s2 USING (user_id)
), r AS (
  SELECT *, row_number() OVER (PARTITION BY step_idx
      ORDER BY delta_s, user_id) AS rn,
    count(*) OVER (PARTITION BY step_idx) AS n
  FROM d
), stats AS (
  SELECT step_idx, transition, count(*) AS n_users,
    min(delta_s) AS min_s, max(delta_s) AS max_s
  FROM d GROUP BY 1, 2
), qs AS (
  SELECT step_idx,
    max(CASE WHEN rn = (n + 1) // 2 THEN delta_s END) AS median_s,
    max(CASE WHEN rn = (9 * n + 9) // 10 THEN delta_s END) AS p90_s
  FROM r GROUP BY 1
)
SELECT s.step_idx, transition, n_users, min_s, max_s, median_s, p90_s
FROM stats s JOIN qs ON s.step_idx = qs.step_idx ORDER BY 1""",
    ),
    _q(
        "events_power_users",
        lambda spark, sf: eops.power_users(views(spark, sf)["events"]),
        # heavy-hitter report: exact ordering (volume DESC, user_id),
        # corpus share in integer ppm
        """WITH per AS (
  SELECT user_id, count(*) AS n_events,
    count(DISTINCT CAST(ts AS DATE)) AS n_active_days,
    count(DISTINCT event_type) AS n_types
  FROM events GROUP BY 1
), t AS (SELECT count(*) AS total FROM events)
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY n_events DESC, user_id)
      AS BIGINT) AS rank,
    user_id, n_events, n_active_days, n_types,
    (n_events * 1000000) // total AS share_ppm
  FROM per, t
) WHERE rank <= 20 ORDER BY rank""",
    ),
    _q(
        "source_length_drift",
        lambda spark, sf: text.source_length_drift(
            views(spark, sf)["documents"]),
        # total-variation drift of per-source log2-length histograms vs
        # the corpus: pure BIGINT count products, absent bins folded in
        # as rt*(g - sum_present(bt)) — no source x bin grid, no floats
        """WITH o AS (
  SELECT source, CAST(length(bin(n_chars + 1)) - 1 AS BIGINT) AS bin,
    count(*) AS o
  FROM documents GROUP BY 1, 2
), rt AS (SELECT source, CAST(sum(o) AS BIGINT) AS rt FROM o GROUP BY 1),
bt AS (SELECT bin, CAST(sum(o) AS BIGINT) AS bt FROM o GROUP BY 1),
g AS (SELECT CAST(sum(o) AS BIGINT) AS g FROM o),
per AS (
  SELECT source, any_value(rt) AS rt, any_value(g) AS g,
    CAST(sum(abs(o * g - rt * bt)) AS BIGINT) AS s1,
    CAST(sum(bt) AS BIGINT) AS s2,
    count(*) AS n_bins_active
  FROM o JOIN bt USING (bin) JOIN rt USING (source), g
  GROUP BY source
)
SELECT source, rt AS n_docs, n_bins_active,
  (s1 + rt * (g - s2)) * 1000000 // (2 * rt * g) AS tv_ppm
FROM per ORDER BY source""",
    ),
    _q(
        "reading_ease",
        lambda spark, sf: text.reading_ease(views(spark, sf)["documents"]),
        # Flesch-style complexity: regexp-match counts (identical
        # semantics both engines), ratios as BIGINT ppm floor divisions
        f"""WITH per AS (
  SELECT lang,
    len(list_filter(string_split({_NORM}, ' '), x -> x <> '')) AS w,
    len(regexp_extract_all(text, '[.!?]+')) AS s,
    len(regexp_extract_all({_NORM}, '[aeiou]+')) AS y
  FROM documents
)
SELECT lang, count(*) AS n_docs,
  CAST(sum(w) AS BIGINT) AS total_words,
  CAST(sum(s) AS BIGINT) AS total_sentences,
  CAST(sum(y) AS BIGINT) AS total_syllables,
  CASE WHEN CAST(sum(s) AS BIGINT) > 0
    THEN (CAST(sum(w) AS BIGINT) * 1000000) // CAST(sum(s) AS BIGINT)
  END AS words_per_sentence_ppm,
  CASE WHEN CAST(sum(w) AS BIGINT) > 0
    THEN (CAST(sum(y) AS BIGINT) * 1000000) // CAST(sum(w) AS BIGINT)
  END AS syllables_per_word_ppm
FROM per GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "ngram_novelty_curve",
        lambda spark, sf: dedup.ngram_novelty_curve(
            views(spark, sf)["documents"]),
        # shingle-level novelty per ingest decile: distinct n-grams vs
        # never-seen-before n-grams (first bucket = min over buckets),
        # 60-bit md5 shingle ids replayed exactly
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), hs AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
  FROM sh
), mx AS (SELECT max(doc_id) AS m FROM documents),
b AS (
  SELECT DISTINCT CAST(doc_id * 10 // (m + 1) AS INT) AS bucket, h
  FROM hs, mx
), per AS (SELECT bucket, count(*) AS n_distinct FROM b GROUP BY 1),
fs AS (SELECT h, min(bucket) AS bucket FROM b GROUP BY 1),
np AS (SELECT bucket, count(*) AS n_new FROM fs GROUP BY 1)
SELECT per.bucket, n_distinct, coalesce(n_new, 0) AS n_new,
  CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY per.bucket) AS BIGINT)
    AS cum_new,
  (coalesce(n_new, 0) * 1000000) // n_distinct AS novelty_ppm
FROM per LEFT JOIN np ON per.bucket = np.bucket ORDER BY 1""",
    ),
    _q(
        "embedding_dim_fidelity",
        lambda spark, sf: similarity.dim_truncation_fidelity(
            views(spark, sf)["embeddings"]),
        # matryoshka truncation eval: exact top-10 over the first 32
        # dims vs the full-dim exact top-10, recall in integer ppm
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (30, 31, 32)
), scored AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6)
      AS cos_sim
  FROM embeddings, q WHERE vec_id <> query_id
), truth AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM scored
  ) WHERE rank <= 10
), tr AS (
  SELECT vec_id, embedding[1:32] AS te FROM embeddings
), qt AS (
  SELECT vec_id AS query_id, te AS qe2 FROM tr
  WHERE vec_id IN (30, 31, 32)
), scored2 AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe2', b='te')}
      / (sqrt({_DOT.format(a='qe2', b='qe2')})
         * sqrt({_DOT.format(a='te', b='te')})), 6) AS cos_sim
  FROM tr, qt WHERE vec_id <> query_id
), approx AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM scored2
  ) WHERE rank <= 10
)
SELECT t.query_id,
  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hit,
  count(*) AS n_truth,
  (CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000) // count(*) AS recall_ppm,
  CAST(32 AS BIGINT) AS keep_dims
FROM truth t LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "contamination_by_source",
        lambda spark, sf: pipeline.contamination_by_source(
            views(spark, sf)["documents"].where("doc_id % 25 <> 0"),
            views(spark, sf)["documents"].where("doc_id % 25 = 0")),
        # decontaminate's per-doc flags rolled up to the source grain
        # (same eval split as decontaminate_overlap); rates in ppm
        f"""WITH shl AS (
  SELECT doc_id, {_SH5} AS shs
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents)
  WHERE len(w) >= 5
), ev AS (
  SELECT DISTINCT unnest(shs) AS s FROM shl WHERE doc_id % 25 = 0
), tr AS (
  SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS s FROM shl
  WHERE doc_id % 25 <> 0
), agg AS (
  SELECT tr.doc_id, any_value(tr.n_sh) AS n_sh, count(ev.s) AS n_hit
  FROM tr LEFT JOIN ev ON tr.s = ev.s GROUP BY 1
), flagged AS (
  SELECT d.source, a.n_hit,
    (a.n_hit / a.n_sh >= {pipeline.DECONTAM_MIN_OVERLAP})::BIGINT AS c
  FROM documents d JOIN agg a ON d.doc_id = a.doc_id
)
SELECT source, count(*) AS n_docs,
  CAST(sum(c) AS BIGINT) AS n_contaminated,
  CAST(sum(n_hit) AS BIGINT) AS overlap_shingles,
  (CAST(sum(c) AS BIGINT) * 1000000) // count(*) AS contamination_ppm
FROM flagged GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "curation_report",
        lambda spark, sf: text.curation_report(views(spark, sf)["documents"]),
        # per-source Gopher pass rate in integer ppm + threshold verdict
        f"""WITH m AS (
  SELECT source,
    len(string_split(text, ' ')) AS n_words,
    (length(text) - len(string_split(text, ' ')) + 1)
      / len(string_split(text, ' ')) AS mean_wl,
    (length(text)
      - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))
      / greatest(len(string_split(text, ' ')), 1) AS sym_ratio,
    len(list_intersect(list_distinct(string_split(text, ' ')),
        ['the', 'a', 'of', 'and', 'to', 'in'])) AS n_sw,
    len(list_filter(string_split(text, ' '),
        w -> regexp_matches(w, '[a-zA-Z]')))
      / greatest(len(string_split(text, ' ')), 1) AS alpha_ratio
  FROM documents
), p AS (
  SELECT source,
    ((n_words >= {text.GOPHER_MIN_WORDS}
      AND n_words <= {text.GOPHER_MAX_WORDS})
     AND (mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
       AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN})
     AND sym_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO}
     AND n_sw >= {text.GOPHER_MIN_DISTINCT_STOPWORDS}
     AND alpha_ratio >= {text.GOPHER_MIN_ALPHA_WORD_RATIO})::BIGINT AS p
  FROM m
), t AS (SELECT count(*) AS total FROM p),
per AS (
  SELECT source, count(*) AS n_docs, CAST(sum(p) AS BIGINT) AS n_pass
  FROM p GROUP BY 1
)
SELECT source, n_docs,
  (n_docs * 1000000) // total AS share_ppm, n_pass,
  (n_pass * 1000000) // n_docs AS pass_ppm,
  CASE WHEN (n_pass * 1000000) // n_docs >= {text.CURATION_KEEP_PPM}
    THEN 'keep'
    WHEN (n_pass * 1000000) // n_docs >= {text.CURATION_DOWNSAMPLE_PPM}
    THEN 'downsample' ELSE 'drop' END AS verdict
FROM per, t ORDER BY source""",
    ),
    _q(
        "length_percentiles_by_source",
        lambda spark, sf: text.length_percentiles_by_source(
            views(spark, sf)["documents"]),
        # exact order-statistic p50/p90/p99 of n_chars per source
        # (rank = ceil(q*n), doc_id tiebreak)
        """WITH r AS (
  SELECT source, n_chars,
    row_number() OVER (PARTITION BY source
      ORDER BY n_chars, doc_id) AS rn,
    count(*) OVER (PARTITION BY source) AS n
  FROM documents
), stats AS (
  SELECT source, count(*) AS n_docs, min(n_chars) AS min_chars,
    max(n_chars) AS max_chars
  FROM documents GROUP BY 1
), qs AS (
  SELECT source,
    max(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50_chars,
    max(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90_chars,
    max(CASE WHEN rn = (99 * n + 99) // 100 THEN n_chars END) AS p99_chars
  FROM r GROUP BY 1
)
SELECT s.source, n_docs, min_chars, p50_chars, p90_chars, p99_chars,
  max_chars
FROM stats s JOIN qs ON s.source = qs.source ORDER BY 1""",
    ),
    _q(
        "dedup_savings",
        lambda spark, sf: dedup.dedup_savings(views(spark, sf)["documents"]),
        # per-source exact-dedup savings: corpus-wide keeper rule (min
        # doc_id per fingerprint), character savings in integer ppm
        f"""WITH base AS (
  SELECT doc_id, source, n_chars, md5({_NORM}) AS fp FROM documents
), keep AS (
  SELECT fp, min(doc_id) AS keeper FROM base GROUP BY 1
), flagged AS (
  SELECT source, n_chars,
    (base.doc_id <> keeper)::BIGINT AS red
  FROM base JOIN keep USING (fp)
)
SELECT source, count(*) AS n_docs,
  CAST(sum(red) AS BIGINT) AS n_redundant,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  CAST(sum(red * n_chars) AS BIGINT) AS redundant_chars,
  (CAST(sum(red * n_chars) AS BIGINT) * 1000000)
    // CAST(sum(n_chars) AS BIGINT) AS savings_ppm
FROM flagged GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "shard_balance",
        lambda spark, sf: pipeline.shard_balance(
            views(spark, sf)["documents"]),
        # per-split shard token-load balance off the training_shards
        # assignment; imbalance in integer ppm
        f"""WITH k AS (
  SELECT doc_id,
    CAST('0x' || substr(md5('{pipeline.SPLIT_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10000 AS split_key,
    CAST('0x' || substr(md5('{pipeline.SHARD_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) AS skey,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), a AS (
  SELECT CASE WHEN split_key < {pipeline.SPLIT_CUTS[0][1]} THEN 'train'
         WHEN split_key < {pipeline.SPLIT_CUTS[1][1]} THEN 'val'
         ELSE 'test' END AS split,
    skey % {pipeline.N_SHARDS} AS shard, n_tok
  FROM k
), per AS (
  SELECT split, shard, CAST(sum(n_tok) AS BIGINT) AS tok
  FROM a GROUP BY 1, 2
)
SELECT split, count(*) AS n_shards,
  min(tok) AS min_tokens, max(tok) AS max_tokens,
  CAST(sum(tok) AS BIGINT) AS total_tokens,
  ((max(tok) - min(tok)) * 1000000) // max(tok) AS imbalance_ppm
FROM per GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "events_interarrival",
        lambda spark, sf: eops.interarrival_stats(views(spark, sf)["events"]),
        # per-type whole-second gap distribution between a user's
        # consecutive same-type events; exact order-statistic
        # percentiles with (user_id, event_id) tiebreak
        """WITH g AS (
  SELECT event_type, user_id, event_id,
    date_diff('second',
      lag(ts) OVER (PARTITION BY user_id, event_type
                    ORDER BY ts, event_id), ts) AS delta_s
  FROM events
), gaps AS (SELECT * FROM g WHERE delta_s IS NOT NULL),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
      ORDER BY delta_s, user_id, event_id) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM gaps
), stats AS (
  SELECT event_type, count(*) AS n_gaps,
    min(delta_s) AS min_s, max(delta_s) AS max_s
  FROM gaps GROUP BY 1
), qs AS (
  SELECT event_type,
    max(CASE WHEN rn = (n + 1) // 2 THEN delta_s END) AS median_s,
    max(CASE WHEN rn = (9 * n + 9) // 10 THEN delta_s END) AS p90_s
  FROM r GROUP BY 1
)
SELECT s.event_type, n_gaps, min_s, max_s, median_s, p90_s
FROM stats s JOIN qs ON s.event_type = qs.event_type ORDER BY 1""",
    ),
]


# Round-7 additions (registered with oracles in the same commit, per the
# r6 zero-debt gate discipline).
R7_QUERIES = [
    _q(
        "dup_graph_centrality_reps",
        lambda spark, sf: dedup.dup_graph_centrality_reps(
            views(spark, sf)["documents"]),
        # exact-contraction first, propagation over representatives,
        # scores fanned back to members (VERDICT r6 item 4) — same
        # integer-ppm loop as the member-level twin
        _centrality_sql(reps=True),
        bench=True,
    ),
    _q(
        "media_ppm_features",
        lambda spark, sf: multimodal.ppm_features(
            multimodal.ppm_media_table(
                views(spark, sf)["documents"])).orderBy("doc_id"),
        # REAL decode path (VERDICT r6 item 7): each doc becomes a
        # genuine spec-compliant P6 PPM payload (header + raster) and
        # is parsed back by the pure-numpy netpbm decoder; channel sums
        # are exact integers the oracle replays from the encoder's
        # pixel pattern flat[i] = (doc_id + i) % 256
        """WITH d AS (
  SELECT doc_id, greatest((n_chars + 47) // 48, 1) AS h FROM documents
), px AS (
  SELECT doc_id, h, unnest(range(16 * h)) AS p FROM d
), s AS (
  SELECT doc_id,
    CAST(sum((doc_id + 3 * p + 0) % 256) AS BIGINT) AS sum_r,
    CAST(sum((doc_id + 3 * p + 1) % 256) AS BIGINT) AS sum_g,
    CAST(sum((doc_id + 3 * p + 2) % 256) AS BIGINT) AS sum_b
  FROM px GROUP BY doc_id
)
SELECT d.doc_id, CAST(16 AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
  CAST(16 * h AS BIGINT) AS n_pixels, sum_r, sum_g, sum_b
FROM d JOIN s USING (doc_id) ORDER BY doc_id""",
        bench=True,
    ),
    _q(
        "ivf_probe_sweep",
        lambda spark, sf: similarity.ivf_probe_sweep(
            views(spark, sf)["embeddings"]),
        # recall@10 as a function of n_probe (1..8): a true neighbor is
        # retrieved at level p iff its centroid's probe rank <= p, so
        # the whole curve is one truth pass + one assignment pass +
        # a centroid-rank join — integer ppm throughout
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (40, 41, 42)
), scored AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6) AS cos_sim
  FROM embeddings, q WHERE vec_id <> query_id
), truth AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM scored
  ) WHERE rank <= 10
), ncent AS (
  -- half-even power-of-two rounding; see the knn_ivf oracle note
  SELECT greatest(4, least(65536, CAST(power(2,
    floor(x) + CASE WHEN x - floor(x) > 0.5 THEN 1
      WHEN x - floor(x) = 0.5 THEN CAST(floor(x) AS BIGINT) % 2
      ELSE 0 END) AS BIGINT))) AS nc
  FROM (SELECT log2(greatest(sqrt(count(*) * 1.0), 4)) AS x
        FROM embeddings)
), cents AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings, ncent
  WHERE vec_id < nc
), assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_DOT.format(a='e.embedding', b='c.c')} DESC,
                 c.centroid_id DESC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
), prank AS (
  SELECT q.query_id, c.centroid_id,
    row_number() OVER (PARTITION BY q.query_id
      ORDER BY {_DOT.format(a='q.qe', b='c.c')} DESC,
               c.centroid_id ASC) AS r
  FROM q, cents c
), tr AS (
  SELECT t.query_id, p.r
  FROM truth t JOIN assigned a ON t.vec_id = a.vec_id
  JOIN prank p ON p.query_id = t.query_id AND p.centroid_id = a.centroid_id
), ntr AS (
  SELECT query_id, count(*) AS n_truth FROM truth GROUP BY 1
), spine AS (
  SELECT query_id, unnest(range(1, {similarity.IVF_SWEEP_MAX_PROBE + 1}))
    AS n_probe
  FROM q
)
SELECT s.query_id, CAST(s.n_probe AS BIGINT) AS n_probe,
  CAST(count(tr.r) AS BIGINT) AS n_hit,
  any_value(ntr.n_truth) AS n_truth,
  (CAST(count(tr.r) AS BIGINT) * 1000000) // any_value(ntr.n_truth)
    AS recall_ppm
FROM spine s JOIN ntr USING (query_id)
LEFT JOIN tr ON tr.query_id = s.query_id AND tr.r <= s.n_probe
GROUP BY s.query_id, s.n_probe ORDER BY 1, 2""",
    ),
    _q(
        "embedding_sq_fidelity",
        lambda spark, sf: similarity.sq_quantize_fidelity(
            views(spark, sf)["embeddings"]),
        # int8-style scalar-quantization gate: exact top-10 over
        # floor(x*127)/127-snapped vectors vs the full-precision exact
        # top-10 (double-cast before the multiply on both engines)
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (50, 51, 52)
), scored AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6)
      AS cos_sim
  FROM embeddings, q WHERE vec_id <> query_id
), truth AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM scored
  ) WHERE rank <= 10
), tr AS (
  SELECT vec_id, list_transform(embedding,
    x -> floor(CAST(x AS DOUBLE) * 127.0) / 127.0) AS te
  FROM embeddings
), qt AS (
  SELECT vec_id AS query_id, te AS qe2 FROM tr
  WHERE vec_id IN (50, 51, 52)
), scored2 AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe2', b='te')}
      / (sqrt({_DOT.format(a='qe2', b='qe2')})
         * sqrt({_DOT.format(a='te', b='te')})), 6) AS cos_sim
  FROM tr, qt WHERE vec_id <> query_id
), approx AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM scored2
  ) WHERE rank <= 10
)
SELECT t.query_id,
  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hit,
  count(*) AS n_truth,
  (CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000) // count(*) AS recall_ppm,
  CAST({similarity.SQ_LEVELS} AS BIGINT) AS sq_levels
FROM truth t LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "lsh_band_yield",
        lambda spark, sf: dedup.lsh_band_yield(
            views(spark, sf)["documents"]),
        # band-count tuning curve: first-discovery band per candidate
        # pair over the same capped banding as the pair pass, then an
        # N_BANDS-row cumulative report in integer ppm
        _MINHASH_BANDS_CTES.format(norm=_NORM, sig_body=_minhash_sig_sql())
        + """, bsz AS (
  SELECT band, bucket, count(*) AS sz FROM bands GROUP BY 1, 2
), ok AS (
  SELECT band, bucket FROM bsz WHERE sz BETWEEN 2 AND 200
), bp AS (
  SELECT x.band, x.doc_id AS a, y.doc_id AS b
  FROM bands x
  JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
    AND x.doc_id < y.doc_id
  JOIN ok ON ok.band = x.band AND ok.bucket = x.bucket
), fb AS (
  SELECT a, b, min(band) AS band FROM bp GROUP BY 1, 2
), per AS (
  SELECT band, count(*) AS n_new_pairs FROM fb GROUP BY 1
), spine AS (
  SELECT unnest(range(8)) AS band
), tot AS (SELECT count(*) AS total FROM fb)
SELECT CAST(s.band AS INT) AS band,
  CAST(coalesce(per.n_new_pairs, 0) AS BIGINT) AS n_new_pairs,
  CAST(sum(coalesce(per.n_new_pairs, 0)) OVER (ORDER BY s.band) AS BIGINT)
    AS cum_pairs,
  (CAST(sum(coalesce(per.n_new_pairs, 0)) OVER (ORDER BY s.band) AS BIGINT)
    * 1000000) // greatest(tot.total, 1) AS cum_share_ppm
FROM spine s LEFT JOIN per ON per.band = s.band, tot
ORDER BY band""",
    ),
    _q(
        "events_disorder",
        lambda spark, sf: eops.disorder_stats(views(spark, sf)["events"]),
        # out-of-order depth vs the running event-time max in arrival
        # (event_id) order — the watermark-sizing report; whole-second
        # integer lateness, exact order-statistic percentiles
        """WITH o AS (
  SELECT event_type, event_id, ts,
    max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
  FROM events
), d AS (
  SELECT event_type, event_id,
    greatest(0, date_diff('second', ts, mx)) AS dis
  FROM o WHERE mx IS NOT NULL
), late AS (SELECT * FROM d WHERE dis > 0),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
      ORDER BY dis, event_id) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM late
), agg AS (
  SELECT event_type, count(*) AS n_events,
    CAST(sum((dis > 0)::INT) AS BIGINT) AS n_late,
    CAST(max(dis) AS BIGINT) AS late_max_s
  FROM d GROUP BY 1
), qs AS (
  SELECT event_type,
    max(CASE WHEN rn = (n + 1) // 2 THEN dis END) AS late_p50_s,
    max(CASE WHEN rn = (9 * n + 9) // 10 THEN dis END) AS late_p90_s
  FROM r GROUP BY 1
)
SELECT a.event_type, n_events, n_late,
  (n_late * 1000000) // n_events AS late_ppm,
  CAST(coalesce(late_p50_s, 0) AS BIGINT) AS late_p50_s,
  CAST(coalesce(late_p90_s, 0) AS BIGINT) AS late_p90_s,
  late_max_s
FROM agg a LEFT JOIN qs ON a.event_type = qs.event_type
ORDER BY 1""",
    ),
    _q(
        "dedup_source_affinity",
        lambda spark, sf: dedup.dedup_source_affinity(
            views(spark, sf)["documents"]),
        # near-dup pairs rolled up to the unordered (source, source)
        # grain with integer-ppm shares — which crawls copy from which
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
), sp AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b
  FROM pairs p
  JOIN documents da ON p.doc_a = da.doc_id
  JOIN documents db ON p.doc_b = db.doc_id
), agg AS (
  SELECT source_a, source_b, count(*) AS n_pairs FROM sp GROUP BY 1, 2
), tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS t FROM agg)
SELECT source_a, source_b, CAST(n_pairs AS BIGINT) AS n_pairs,
  (CAST(n_pairs AS BIGINT) * 1000000) // greatest(t, 1) AS share_ppm,
  source_a <> source_b AS is_cross_source
FROM agg, tot ORDER BY source_a, source_b""",
    ),
    _q(
        "context_length_coverage",
        lambda spark, sf: pipeline.context_length_coverage(
            views(spark, sf)["documents"]),
        # truncation-loss sweep over candidate max_seq_len values: one
        # corpus scan to a token-length histogram, broadcast spine join
        f"""WITH hist AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
    count(*) AS n
  FROM documents GROUP BY 1
), spine AS (
  SELECT unnest([{', '.join(str(l) for l in pipeline.CTX_LENGTHS)}])
    AS ctx_len
), j AS (
  SELECT CAST(ctx_len AS BIGINT) AS ctx_len,
    CAST(sum(n) AS BIGINT) AS docs,
    CAST(sum(CASE WHEN n_tok <= ctx_len THEN n ELSE 0 END) AS BIGINT)
      AS n_docs_fit,
    CAST(sum(n_tok * n) AS BIGINT) AS tokens,
    CAST(sum(least(n_tok, ctx_len) * n) AS BIGINT) AS tokens_kept
  FROM hist, spine GROUP BY 1
)
SELECT ctx_len, n_docs_fit,
  (n_docs_fit * 1000000) // docs AS docs_fit_ppm,
  tokens_kept, tokens - tokens_kept AS tokens_lost,
  (tokens_kept * 1000000) // tokens AS tokens_kept_ppm
FROM j ORDER BY ctx_len""",
    ),
    _q(
        "events_watermark_drop",
        lambda spark, sf: eops.watermark_drop_matrix(
            views(spark, sf)["events"]),
        # per-(type, horizon) events a withWatermark(horizon) query
        # would drop — the decision table on top of events_disorder
        f"""WITH o AS (
  SELECT event_type, event_id, ts,
    max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
  FROM events
), lat AS (
  SELECT event_type,
    greatest(0, date_diff('second', ts, mx)) AS dis, count(*) AS n
  FROM o WHERE mx IS NOT NULL GROUP BY 1, 2
), spine AS (
  SELECT unnest([{', '.join(str(h)
                            for h in eops.WATERMARK_CANDIDATES_S)}])
    AS horizon_s
)
SELECT event_type, CAST(horizon_s AS BIGINT) AS horizon_s,
  CAST(sum(n) AS BIGINT) AS n_events,
  CAST(sum(CASE WHEN dis > horizon_s THEN n ELSE 0 END) AS BIGINT)
    AS n_dropped,
  (CAST(sum(CASE WHEN dis > horizon_s THEN n ELSE 0 END) AS BIGINT)
    * 1000000) // CAST(sum(n) AS BIGINT) AS drop_ppm
FROM lat, spine GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "embedding_batch_drift",
        lambda spark, sf: similarity.embedding_batch_drift(
            views(spark, sf)["embeddings"]),
        # per-dim |mean_a - mean_b| between the even/odd vec_id batches
        # in exact integer micro units (common-denominator cross
        # products over kmeans-scheme quantized vectors)
        f"""WITH qv AS (
  SELECT vec_id % 2 = 0 AS is_a, list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * {similarity.KM_QUANT})
         AS BIGINT)) AS qv
  FROM embeddings
), q AS (
  SELECT is_a, dim, qv[CAST(dim AS INT) + 1] AS x
  FROM (SELECT is_a, qv, unnest(range(0, {similarity.DIM})) AS dim
        FROM qv)
), agg AS (
  SELECT dim,
    CAST(sum(CASE WHEN is_a THEN x ELSE 0 END) AS BIGINT) AS sum_a,
    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN is_a THEN 0 ELSE x END) AS BIGINT) AS sum_b,
    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM q GROUP BY 1
)
SELECT CAST(dim AS BIGINT) AS dim, n_a, n_b,
  abs(sum_a * n_b - sum_b * n_a) * 1000000
    // (n_a * n_b * {similarity.KM_QUANT}) AS drift_micro
FROM agg ORDER BY dim""",
    ),
    _q(
        "near_dup_leakage",
        lambda spark, sf: pipeline.near_dup_leakage(
            views(spark, sf)["documents"]),
        # near-dup pairs straddling train/val/test under the standard
        # md5 split rule — the leakage exact fingerprints miss
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common)
    >= {pipeline.NEAR_LEAK_THRESHOLD}
), sp AS (
  SELECT doc_id, CASE
    WHEN CAST('0x' || substr(md5('{pipeline.SPLIT_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10000 < 9800
      THEN 'train'
    WHEN CAST('0x' || substr(md5('{pipeline.SPLIT_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10000 < 9900
      THEN 'val'
    ELSE 'test' END AS split
  FROM documents
), o AS (
  SELECT least(pa.split, pb.split) AS split_lo,
    greatest(pa.split, pb.split) AS split_hi,
    CASE WHEN pa.split < pb.split THEN p.doc_a ELSE p.doc_b END AS doc_lo,
    CASE WHEN pa.split < pb.split THEN p.doc_b ELSE p.doc_a END AS doc_hi
  FROM pairs p
  JOIN sp pa ON p.doc_a = pa.doc_id
  JOIN sp pb ON p.doc_b = pb.doc_id
  WHERE pa.split <> pb.split
)
SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(count(DISTINCT doc_lo) AS BIGINT) AS n_docs_lo,
  CAST(count(DISTINCT doc_hi) AS BIGINT) AS n_docs_hi
FROM o GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "keeper_policy_audit",
        lambda spark, sf: pipeline.keeper_policy_audit(
            views(spark, sf)["documents"]),
        # keep-first vs keep-best agreement across multi-member
        # duplicate clusters (shared contracted-clusters CTE), with the
        # quality regret in exact integer micro units
        _CLUSTERS_CTE + f""", m AS (
  SELECT mem.doc_id, mem.cluster_id,
    CAST(round(round(least(len(string_split(d.text, ' ')) / 64.0, 1.0) * 0.5
      + least(len(list_filter(string_split(d.text, ' '), w -> w IN {_SW}))
              / len(string_split(d.text, ' ')) * 5.0, 1.0) * 0.5, 6)
      * 1000000) AS BIGINT) AS q
  FROM members mem JOIN documents d ON d.doc_id = mem.doc_id
), best AS (
  SELECT cluster_id, doc_id AS best_id, q AS best_q FROM (
    SELECT *, row_number() OVER (PARTITION BY cluster_id
      ORDER BY q DESC, doc_id) AS rn FROM m) WHERE rn = 1
), sz AS (
  SELECT cluster_id, count(*) AS sz, min(doc_id) AS minid
  FROM m GROUP BY 1
), minq AS (
  SELECT m.cluster_id, m.q AS min_q
  FROM m JOIN sz ON m.cluster_id = sz.cluster_id AND m.doc_id = sz.minid
)
SELECT CAST(count(*) AS BIGINT) AS n_clusters,
  CAST(sum(sz) AS BIGINT) AS n_docs,
  CAST(sum((best_id = minid)::INT) AS BIGINT) AS n_same_pick,
  (CAST(sum((best_id = minid)::INT) AS BIGINT) * 1000000)
    // greatest(count(*), 1) AS same_pick_ppm,
  CAST(sum(best_q - min_q) AS BIGINT) AS quality_regret_micro
FROM sz JOIN best USING (cluster_id) JOIN minq USING (cluster_id)""",
    ),
    _q(
        "join_key_skew",
        lambda spark, sf: sketch.join_key_skew(
            views(spark, sf)["lineitem"], "l_orderkey"),
        # per-key row-count distribution of the join key: exact order
        # statistics off the count-of-counts histogram + top-10 share
        """WITH per AS (
  SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1
), hist AS (
  SELECT c, count(*) AS n_keys FROM per GROUP BY 1
), ranked AS (
  SELECT c, n_keys,
    sum(n_keys) OVER (ORDER BY c) AS cum,
    sum(n_keys) OVER () AS total_keys,
    sum(c * n_keys) OVER () AS total_rows
  FROM hist
), p50 AS (
  SELECT min(c) AS p50_per_key FROM ranked
  WHERE cum >= (total_keys + 1) // 2
), p99 AS (
  SELECT min(c) AS p99_per_key FROM ranked
  WHERE cum >= (99 * total_keys + 99) // 100
), top10 AS (
  SELECT CAST(sum(c) AS BIGINT) AS top10_rows FROM (
    SELECT c FROM per ORDER BY c DESC, k LIMIT 10)
), totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
    CAST(sum(c) AS BIGINT) AS n_rows,
    CAST(max(c) AS BIGINT) AS max_per_key
  FROM per
)
SELECT n_keys, n_rows, max_per_key,
  CAST(p50_per_key AS BIGINT) AS p50_per_key,
  CAST(p99_per_key AS BIGINT) AS p99_per_key,
  top10_rows,
  (top10_rows * 1000000) // greatest(n_rows, 1) AS top10_share_ppm
FROM totals, p50, p99, top10""",
    ),
    _q(
        "quality_by_dup_degree",
        lambda spark, sf: pipeline.quality_by_dup_degree(
            views(spark, sf)["documents"]),
        # mean quality (integer micro) per near-dup-degree bucket —
        # does dedup double as a quality filter on this corpus?
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
), deg AS (
  SELECT doc_id, count(*) AS deg FROM (
    SELECT doc_a AS doc_id FROM pairs
    UNION ALL SELECT doc_b FROM pairs) GROUP BY 1
), q AS (
  SELECT d.doc_id, coalesce(g.deg, 0) AS deg,
    CAST(round(round(least(len(string_split(d.text, ' ')) / 64.0, 1.0) * 0.5
      + least(len(list_filter(string_split(d.text, ' '), w -> w IN {_SW}))
              / len(string_split(d.text, ' ')) * 5.0, 1.0) * 0.5, 6)
      * 1000000) AS BIGINT) AS q_micro
  FROM documents d LEFT JOIN deg g ON g.doc_id = d.doc_id
)
SELECT CAST(CASE WHEN deg = 0 THEN 0 WHEN deg = 1 THEN 1
  WHEN deg <= 3 THEN 2 WHEN deg <= 7 THEN 3 ELSE 4 END AS BIGINT)
    AS bucket_order,
  CASE WHEN deg = 0 THEN '0' WHEN deg = 1 THEN '1'
    WHEN deg <= 3 THEN '2-3' WHEN deg <= 7 THEN '4-7' ELSE '8+' END
    AS dup_degree_bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(q_micro) AS BIGINT) // count(*) AS mean_quality_micro
FROM q GROUP BY 1, 2 ORDER BY 1""",
    ),
]


# Round-8 additions (registered with oracles in the same commit, per the
# zero-debt gate discipline).
R8_QUERIES = [
    _q(
        "media_bmp_features",
        lambda spark, sf: multimodal.bmp_features(
            multimodal.bmp_media_table(
                views(spark, sf)["documents"])).orderBy("doc_id"),
        # second REAL decode path (VERDICT r7 item 7): each doc becomes
        # a genuine uncompressed 24-bit BMP (file+info header, BGR,
        # bottom-up rows, 4-byte row padding — width 15 so padding is
        # non-zero on every payload) and is parsed back by the
        # pure-numpy decoder; channel sums replay the encoder's pixel
        # pattern flat[i] = (doc_id + i) % 256, exactly like the PPM twin
        """WITH d AS (
  SELECT doc_id, greatest((n_chars + 44) // 45, 1) AS h FROM documents
), px AS (
  SELECT doc_id, h, unnest(range(15 * h)) AS p FROM d
), s AS (
  SELECT doc_id,
    CAST(sum((doc_id + 3 * p + 0) % 256) AS BIGINT) AS sum_r,
    CAST(sum((doc_id + 3 * p + 1) % 256) AS BIGINT) AS sum_g,
    CAST(sum((doc_id + 3 * p + 2) % 256) AS BIGINT) AS sum_b
  FROM px GROUP BY doc_id
)
SELECT d.doc_id, CAST(15 AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
  CAST(15 * h AS BIGINT) AS n_pixels, sum_r, sum_g, sum_b
FROM d JOIN s USING (doc_id) ORDER BY doc_id""",
    ),
]


_REGISTRY_ORDER: list[QuerySpec] = (
    MINING_QUERIES
    + LISTING_QUERIES + SNAPSHOT_QUERIES + CONTAINER_QUERIES + INSIGHT_QUERIES
    + NAMESPACE_QUERIES + LIFECYCLE_QUERIES + SCALAR_QUERIES + TPCH_QUERIES
    + EVENT_QUERIES + TEXT_QUERIES + PIPELINE_QUERIES + DEDUP_QUERIES
    + SIMILARITY_QUERIES
    + MULTIMODAL_QUERIES + FSO_QUERIES + ADMIN_QUERIES + STREAMING_QUERIES
    + ACL_GROWTH_QUERIES + COMPACTION_QUERIES + SCM_QUERIES + R4_QUERIES
    + R5_QUERIES + R6_QUERIES + R7_QUERIES + R8_QUERIES
)


def _code_module_names(fn) -> set[str]:
    """Global names referenced by a callable's code object, recursively
    through nested lambdas/comprehensions — used to map a QuerySpec's
    lambda to the operator modules it calls."""
    import types as _types

    def walk(code) -> set[str]:
        names = set(code.co_names)
        for c in code.co_consts:
            if isinstance(c, _types.CodeType):
                names |= walk(c)
        return names

    code = getattr(fn, "__code__", None)
    return walk(code) if code is not None else set()


def _spec_source_files(spec: QuerySpec) -> set[str]:
    """Package source files implementing a query: the ozone_spark modules
    the spec's lambda references, closed transitively over package-module
    imports (pipeline imports dedup, so a dedup.py edit marks pipeline
    queries stale too).  registry.py itself is deliberately EXCLUDED —
    it changes every round (each new registration edits it) and would
    mark the whole registry stale."""
    import os as _os
    import types as _types

    pkg_root = _os.path.dirname(_os.path.abspath(__file__))
    g = getattr(spec.fn, "__globals__", globals())
    seen: set[_types.ModuleType] = set()
    # seed from module globals AND from directly-imported callables
    # (a lambda referencing `quality_by_dup_degree` instead of
    # `pipeline.quality_by_dup_degree` must still resolve its defining
    # module — ADVICE r7)
    import sys as _sys
    work = []
    for n in _code_module_names(spec.fn):
        v = g.get(n)
        if isinstance(v, _types.ModuleType):
            work.append(v)
        elif callable(v) and getattr(v, "__module__", "").startswith(
                "ozone_spark"):
            m = _sys.modules.get(v.__module__)
            if m is not None:
                work.append(m)
        elif v is None and n.startswith("ozone_spark"):
            # function-local `from ozone_spark.x import y` leaves only
            # the dotted module path in co_names (the bound name is a
            # local) — import it (package-internal, side-effect-free)
            # and seed the walk with it
            import importlib as _importlib
            try:
                work.append(_importlib.import_module(n))
            except ImportError:
                pass
    while work:
        mod = work.pop()
        f = getattr(mod, "__file__", "") or ""
        if mod in seen or not f.startswith(pkg_root):
            continue
        seen.add(mod)
        for v in vars(mod).values():
            if isinstance(v, _types.ModuleType):
                work.append(v)
            elif callable(v) and getattr(v, "__module__", "").startswith(
                    "ozone_spark"):
                m = __import__("sys").modules.get(v.__module__)
                if m is not None:
                    work.append(m)
    here = _os.path.abspath(__file__)
    out: set[str] = set()
    for m in seen:
        f = _os.path.abspath(m.__file__)
        if f == here:
            continue
        out.add(f)
        # a PACKAGE reached via a lazy dotted import (the streaming
        # helpers) may not have its submodules imported yet — include
        # the package's .py files so edits there still read as stale
        if _os.path.basename(f) == "__init__.py":
            d = _os.path.dirname(f)
            out.update(
                _os.path.join(d, p) for p in _os.listdir(d)
                if p.endswith(".py"))
    out.discard(here)
    return out


def _gate_priority_order(specs: list[QuerySpec]) -> list[QuerySpec]:
    """Rotate the registry so the driver's capped correctness gate (it
    records the first ~50 queries in registry order per round) always
    verifies the least-recently-verified queries first: never-verified
    queries lead, then queries whose implementing module was EDITED
    after their last green row was recorded (stale greens — VERDICT r6
    item 6: a query rewritten this round must not wait a full rotation
    behind its own aging green row), then queries whose last green
    CORRECTNESS_r*.json row is oldest.  Purely a presentation order —
    every query stays registered; ties keep the hand-written registry
    order."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    last_green: dict[str, int] = {}
    # newest artifact (driver OR self-recorded sweep) with a green row
    # per query — the staleness reference time.  Self sweeps count here
    # (they re-verify the whole registry at each round's tip) even
    # though only driver rows drive the last_green ROUND ordering.
    green_mtime: dict[str, float] = {}
    for path in _glob.glob(_os.path.join(root, "CORRECTNESS_*r*.json")):
        m = _re.search(r"_r(\d+)\.json$", _os.path.basename(path))
        # driver artifacts are exactly CORRECTNESS_r{N}.json; SELF/SF01
        # sweeps count toward green_mtime only, not the round ordering
        is_driver = _os.path.basename(path).startswith("CORRECTNESS_r")
        rnd = int(m.group(1)) if m else -1
        try:
            art_t = _os.path.getmtime(path)
            with open(path) as fh:
                data = _json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for qname, row in data.items():
            if not isinstance(row, dict):
                continue
            # Green = an actual value verification: hash_match for
            # oracle-backed queries; rows_match counts ONLY for queries
            # with no registered oracle (the driver's sanctioned weaker
            # rows-only check).  A bare rows_match on an oracle-backed
            # query (hash red, or a rows-only artifact row) must NOT
            # deprioritize it out of future gate rounds (ADVICE r5).
            oracle_less = qname in _NO_ORACLE
            green = (row.get("hash_match") is True
                     or (oracle_less and row.get("rows_match") is True))
            if green:
                green_mtime[qname] = max(green_mtime.get(qname, 0.0), art_t)
                if is_driver and rnd >= 0:
                    last_green[qname] = max(last_green.get(qname, -1), rnd)
    pos = {q.name: i for i, q in enumerate(specs)}
    # Among never-verified queries, the round-1 registry backlog (queries
    # that existed when CORRECTNESS_r01 was recorded but fell past the
    # driver's ~50-row cap) outranks later additions: they have waited
    # the longest and the round-1 judge explicitly called them out.
    def tier(name: str) -> int:
        if name in _R01_GATE_BACKLOG:
            return 0
        if name in _R02_GATE_BACKLOG:
            return 1
        if name in _R34_GATE_BACKLOG:
            return 2
        return 3

    def _mtime(path: str) -> float:
        try:
            return _os.path.getmtime(path)
        except OSError:
            return 0.0

    def stale(q: QuerySpec) -> bool:
        """True when any implementing module file is newer than the
        NEWEST artifact (driver or self sweep) with a green row for this
        query (+2 s slack for same-checkout writes).  After a fresh
        clone all mtimes are checkout-time, so nothing reads as stale —
        only genuine post-verification edits trigger a re-gate."""
        t = green_mtime.get(q.name)
        if t is None:
            return False
        return any(_mtime(f) > t + 2.0 for f in _spec_source_files(q))

    def key(q: QuerySpec):
        g = last_green.get(q.name, -1)
        if g >= 0 and stale(q):
            # edited since its green row: re-verify ahead of everything
            # except genuinely never-gated queries (tier 4 > backlog
            # tiers 0-3, so never-gated still lead)
            return (-1, 4, pos[q.name])
        return (g, tier(q.name), pos[q.name])

    return sorted(specs, key=key)


# Registered in round 1 but never gate-verified (VERDICT.md round 1,
# "Close the driver gate"): keep first in line until each has a green
# CORRECTNESS row, ahead of anything added in later rounds.
_R01_GATE_BACKLOG = frozenset({
    "dedup_minhash_lsh", "dedup_simhash", "dedup_winnowing",
    "knn_bruteforce", "knn_lsh", "knn_ivf",
    "embedding_near_dup", "embedding_norms",
    "media_summary", "media_features", "media_frame_sample", "media_resize",
    "fso_list_status", "fso_dir_delete_expansion", "fso_resolve_subtree",
    "rename_subtree", "range_read_plan", "multipart_etag",
    "topology_sorted_replicas", "longest_prefix_acl", "ec_read_plan",
    "unique_snapshot_objects", "list_volumes", "list_snapshots",
    "conditional_rewrite", "replica_bcsid_lag", "balancer_move_candidates",
    "snapshot_move_deleted_keys", "tenant_access_report",
    "cdc_incremental_histogram", "cdc_incremental_container_index",
    "streaming_tumbling_daily", "streaming_sessionize",
})


# Registered in round 2 but never gate-verified (VERDICT.md round 2 item
# 2: "freeze new query additions until r3's gate has drained the queue"):
# these outrank anything added in round 3+, so new registrations cannot
# starve the backlog out of the driver's ~50-row per-round cap.
_R02_GATE_BACKLOG = frozenset({
    "snapshot_renamed_entries", "snapshot_chain_info",
    "snapshot_diff_renamed_table", "size_percentiles", "namespace_dist",
    "lifecycle_tagged_expired", "lifecycle_mpu_aborts",
    "trash_expired_checkpoints", "trash_checkpoint_plan",
    "lease_recovery_plan", "document_chunks", "gopher_quality",
    "decontaminate_overlap", "repetition_metrics", "stratified_sample",
    "stratified_sample_summary", "pack_sequences", "dedup_keep_best",
    "domain_mixture", "duplicated_spans", "training_shards",
    "cross_corpus_dedup", "dedup_clusters", "ec_reconstruction_plan",
    "cdc_incremental_namespace_dist", "streaming_session_stats",
    "streaming_dedup", "skewed_event_totals", "acl_effective_rights",
    "acl_read_allowed", "cluster_growth_daily", "sst_diff_pruning",
    "dtoken_expiry", "list_pipelines", "safemode_status",
    "decommission_plan",
})


# Registered in rounds 3/4 but never driver-gated (VERDICT.md round 4
# item 1: "drain the last 15-query driver-gate queue — change nothing
# about their order"): these outrank any round-5+ addition until each
# has a green CORRECTNESS row.
_R34_GATE_BACKLOG = frozenset({
    "node_status", "blocks_pending_deletion", "key_insight_summary",
    "storage_distribution", "pending_deleted_dirs", "deleted_dirs_summary",
    "dedup_threshold_sweep", "paragraph_dedup", "semantic_dedup",
    "lookup_key", "streaming_dedup_bounded", "remove_duplicate_spans",
    "payload_chunk_near_dup", "perplexity_buckets", "streaming_attribution",
})


# Queries with no DuckDB oracle (driver runs the weaker rows-only
# check): for these — and ONLY these — a rows_match row counts as a
# green verification in the gate rotation.
_NO_ORACLE = frozenset(
    q.name for q in _REGISTRY_ORDER if q.oracle is None)


ALL_QUERIES: list[QuerySpec] = _gate_priority_order(_REGISTRY_ORDER)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in ALL_QUERIES}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in ALL_QUERIES if q.oracle is not None}


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # stable hand-written order (NOT the rotated gate order) so per-query
    # bench timings are comparable round over round
    return {q.name: q.fn for q in _REGISTRY_ORDER if q.bench}
