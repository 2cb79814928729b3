"""Snapshots and snapshot diff — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace


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
