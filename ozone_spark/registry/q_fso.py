"""FSO tree operators — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace


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
