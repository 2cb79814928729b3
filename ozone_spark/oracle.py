"""DuckDB-dialect CTE text mirroring ozone_spark.tables derived views.

The driver's correctness gate runs each oracle SQL in DuckDB over the
same parquet tables (pre-registered views: region nation customer
supplier part orders lineitem events documents embeddings).  Any oracle
for a namespace operator therefore re-derives the namespace with these
CTEs.  KEEP IN LOCKSTEP with ozone_spark/tables.py — every expression is
chosen to be bit-exact across engines (integer modular arithmetic,
floor() on doubles, exact powers of two, UTC epoch millis).
"""

from __future__ import annotations

NOW_MS = 1009843200000  # must match tables.NOW_MS

_CTES: dict[str, str] = {}

_CTES["keys"] = """keys AS (
  SELECT *, '/' || volume || '/' || bucket || '/' || key_name AS db_key
  FROM (
    SELECT
      o_orderkey AS object_id,
      'vol' || CAST(o_custkey % 4 AS VARCHAR) AS volume,
      'b' || CAST(o_custkey % 3 AS VARCHAR) AS bucket,
      lower(o_orderstatus) || '/y' || CAST(year(o_orderdate) AS VARCHAR)
        || CASE WHEN o_orderkey % 10 = 7
           THEN '/m' || lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0')
             || '/d' || lpad(CAST(day(o_orderdate) AS VARCHAR), 2, '0')
           ELSE '' END
        || '/order-' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_name,
      CAST(floor(o_totalprice * 100) AS BIGINT) AS data_size,
      CAST(1 + o_orderkey % 3 AS INT) AS repl_factor,
      CAST(floor(o_totalprice * 100) AS BIGINT) * (1 + o_orderkey % 3) AS replicated_size,
      epoch_ms(o_orderdate) AS creation_time,
      'user' || CAST(o_custkey % 10 AS VARCHAR) AS owner,
      o_orderpriority AS priority,
      CASE WHEN o_orderkey % 5 = 0
        THEN map(['tier', 'tmp'],
                 [lower(string_split(o_orderpriority, '-')[-1]), 'true'])
        ELSE map(['tier'], [lower(string_split(o_orderpriority, '-')[-1])])
      END AS tags
    FROM orders
  )
)"""

_CTES["locations"] = """locations AS (
  SELECT *,
    CAST(sum(block_len) OVER (PARTITION BY object_id
      ORDER BY block_seq, container_id, block_len, local_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - block_len
      AS block_offset
  FROM (
    SELECT
      l_orderkey AS object_id,
      l_linenumber AS block_seq,
      (l_partkey * 7 + l_suppkey) % 55 AS container_id,
      l_orderkey * 100 + l_linenumber AS local_id,
      CAST(floor(l_extendedprice) AS BIGINT) AS block_len
    FROM lineitem
  )
)"""

_CTES["containers"] = """containers AS (
  SELECT
    container_id,
    CASE
      WHEN container_id % 10 = 0 THEN 'DELETED'
      WHEN container_id % 10 = 1 THEN 'DELETING'
      WHEN container_id % 10 IN (2, 3) THEN 'OPEN'
      WHEN container_id % 10 = 4 THEN 'CLOSING'
      ELSE 'CLOSED'
    END AS state,
    CASE WHEN container_id % 13 = 0 THEN CAST(0 AS BIGINT)
         ELSE CAST(pow(2.0, CAST(26 + container_id % 8 AS DOUBLE)) AS BIGINT)
              + container_id
    END AS used_bytes,
    CAST(3 AS INT) AS expected_replicas,
    'svc' || CAST(container_id % 3 AS VARCHAR) AS owner
  FROM (SELECT range AS container_id FROM range(50))
)"""

_CTES["replicas"] = """replicas AS (
  SELECT
    container_id,
    replica_idx,
    'dn' || CAST((container_id * 5 + replica_idx) % 8 AS VARCHAR) AS datanode,
    CASE WHEN container_id % 9 = 4 AND replica_idx = 1 THEN 'bad' ELSE 'ok' END
      AS checksum,
    container_id * 10
      + CASE WHEN container_id % 8 = 3 AND replica_idx = 2 THEN 3 ELSE 7 END
      AS bcsid
  FROM (SELECT range AS container_id FROM range(50)),
       (SELECT range AS replica_idx FROM range(1, 5))
  WHERE replica_idx <= CASE container_id % 7
      WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 4 THEN 4 ELSE 3 END
)"""

_CTES["datanodes"] = f"""datanodes AS (
  SELECT
    'dn' || CAST(dn_idx AS VARCHAR) AS datanode,
    CAST(34359738368 AS BIGINT) * (1 + dn_idx % 3) AS capacity,
    'rack' || CAST(dn_idx % 2 AS VARCHAR) AS rack,
    '/dc' || CAST(dn_idx // 4 AS VARCHAR) || '/rack'
      || CAST(dn_idx % 2 AS VARCHAR) || '/dn' || CAST(dn_idx AS VARCHAR)
      AS topology_path,
    CASE WHEN dn_idx = 7 THEN 'DEAD'
         WHEN dn_idx = 5 THEN 'STALE' ELSE 'HEALTHY' END AS state,
    CAST({NOW_MS} AS BIGINT)
      - CASE WHEN dn_idx = 7 THEN 900000
             WHEN dn_idx = 5 THEN 120000
             ELSE dn_idx * 1000 END AS last_heartbeat_ms
  FROM (SELECT range AS dn_idx FROM range(8))
)"""

_CTES["directories"] = """directories AS (
  SELECT DISTINCT volume, bucket,
    CASE WHEN depth = 1 THEN '/' || volume || '/' || bucket
         ELSE '/' || volume || '/' || bucket || '/'
              || array_to_string(parts[1:depth-1], '/') END AS parent_path,
    '/' || volume || '/' || bucket || '/'
      || array_to_string(parts[1:depth], '/') AS path,
    parts[depth] AS name,
    depth
  FROM (
    SELECT volume, bucket, string_split(key_name, '/') AS parts,
      unnest(range(1, len(string_split(key_name, '/')))) AS depth
    FROM keys
  )
)"""

_CTES["snap1"] = """snap1 AS (
  SELECT object_id, volume, bucket,
    CASE WHEN object_id % 11 = 0 THEN key_name || '.old' ELSE key_name END
      AS key_name,
    data_size
  FROM keys WHERE object_id % 13 <> 0
)"""

_CTES["snap2"] = """snap2 AS (
  SELECT object_id, volume, bucket, key_name,
    CASE WHEN object_id % 5 = 0 THEN data_size + 1024 ELSE data_size END
      AS data_size
  FROM keys WHERE object_id % 7 <> 0
)"""

_CTES["snap3"] = """snap3 AS (
  SELECT object_id, volume, bucket,
    CASE WHEN object_id % 19 = 0 THEN key_name || '.v3' ELSE key_name END
      AS key_name,
    data_size + CASE WHEN object_id % 5 = 0 THEN 1024 ELSE 0 END
              + CASE WHEN object_id % 4 = 0 THEN 3072 ELSE 0 END AS data_size
  FROM keys
  WHERE (object_id % 7 <> 0 OR object_id % 14 = 0) AND object_id % 17 <> 0
)"""

_CTES["snapshot_chain"] = """snapshot_chain AS (
  SELECT 'snap' || CAST(i AS VARCHAR) AS snapshot_name,
    CAST(i AS INT) AS chain_pos,
    CASE WHEN i > 1 THEN 'snap' || CAST(i - 1 AS VARCHAR) END
      AS previous_snapshot,
    CAST(1009843200000 - (4 - i) * 30 * 86400000 AS BIGINT) AS create_time
  FROM (SELECT range AS i FROM range(1, 4))
)"""

_CTES["open_keys"] = """open_keys AS (
  SELECT db_key, object_id, volume, bucket, key_name, data_size,
    replicated_size, creation_time,
    object_id * 3 AS client_id,
    object_id % 2 = 0 AS hsync
  FROM keys WHERE object_id % 17 = 0
)"""

_CTES["deleted_keys"] = """deleted_keys AS (
  SELECT db_key, object_id, volume, bucket, data_size, replicated_size,
    creation_time,
    CAST(1 + object_id % 2 AS BIGINT) AS num_versions,
    data_size * (1 + object_id % 2) AS pending_bytes,
    replicated_size * (1 + object_id % 2) AS pending_replicated_bytes
  FROM keys WHERE object_id % 9 = 0
)"""

_CTES["multipart_uploads"] = """multipart_uploads AS (
  SELECT md5(db_key) AS upload_id, db_key, object_id, volume, bucket,
    key_name, owner, creation_time AS initiated_ms,
    CAST(1 + object_id % 5 AS INT) AS n_parts,
    data_size AS part_bytes, repl_factor
  FROM keys WHERE object_id % 23 = 0
)"""

_CTES["user_volumes"] = """user_volumes AS (
  SELECT owner AS "user", volume FROM (
    SELECT owner, volume,
      row_number() OVER (PARTITION BY volume
                         ORDER BY creation_time, object_id) AS rn
    FROM keys
  ) WHERE rn = 1
)"""

_CTES["trash_entries"] = f"""trash_entries AS (
  SELECT object_id, volume, bucket, owner, key_name, data_size,
    checkpoint_ms,
    CASE WHEN checkpoint_ms IS NULL THEN 'Current'
         ELSE 'ckpt-' || CAST(checkpoint_ms AS VARCHAR) END AS checkpoint,
    '/' || volume || '/' || bucket || '/.Trash/' || owner || '/'
      || CASE WHEN checkpoint_ms IS NULL THEN 'Current'
              ELSE 'ckpt-' || CAST(checkpoint_ms AS VARCHAR) END
      || '/' || key_name AS trash_path
  FROM (
    SELECT *,
      CASE WHEN (object_id // 21) % 3 = 1 THEN CAST({NOW_MS - 10 * 86400000} AS BIGINT)
           WHEN (object_id // 21) % 3 = 2 THEN CAST({NOW_MS - 40 * 86400000} AS BIGINT)
      END AS checkpoint_ms
    FROM keys WHERE object_id % 21 = 0
  )
)"""

_CTES["acl_entries"] = """acl_entries AS (
  SELECT '/vol' || CAST(v AS VARCHAR) AS path, 'USER' AS entity_type,
    'user' || CAST(v AS VARCHAR) AS entity, r AS "right"
  FROM (SELECT range AS v FROM range(4)), (SELECT unnest(['r','w']) AS r)
  UNION ALL
  SELECT '/vol' || CAST(v AS VARCHAR), 'WORLD', '', 'r'
  FROM (SELECT range AS v FROM range(4)) WHERE v % 2 = 0
  UNION ALL
  SELECT '/vol' || CAST(v AS VARCHAR) || '/b' || CAST(b AS VARCHAR),
    'GROUP', 'grp' || CAST(b AS VARCHAR), 'r'
  FROM (SELECT range AS v FROM range(4)), (SELECT range AS b FROM range(3))
  UNION ALL
  SELECT '/vol' || CAST(v AS VARCHAR) || '/b' || CAST(b AS VARCHAR),
    'USER', 'user' || CAST((v + b) % 10 AS VARCHAR), 'w'
  FROM (SELECT range AS v FROM range(4)), (SELECT range AS b FROM range(3))
)"""

_CTES["tenant_access"] = """tenant_access AS (
  SELECT
    'access-' || CAST(c_custkey AS VARCHAR) AS access_id,
    'tenant' || CAST(c_custkey % 5 AS VARCHAR) AS tenant_id,
    'user' || CAST(c_custkey % 10 AS VARCHAR) AS principal,
    c_custkey % 7 = 0 AS is_admin,
    md5('access-' || CAST(c_custkey AS VARCHAR)) AS secret
  FROM customer WHERE c_custkey % 6 = 0
)"""

_CTES["sst_catalog"] = """sst_catalog AS (
  SELECT sst_id,
    CAST(CASE WHEN sst_id < 40 THEN sst_id + 1
         WHEN sst_id < 60 THEN 50 + ((sst_id - 40) // 2) * 10
         WHEN sst_id < 62 THEN 160
         WHEN sst_id = 62 THEN 170
         WHEN sst_id < 69 THEN sst_id + 38
         ELSE 210 END AS BIGINT) AS gen,
    '/vol' || CAST(sst_id % 4 AS VARCHAR) AS start_key,
    '/vol' || CAST(sst_id % 4 AS VARCHAR) || '/~' AS end_key
  FROM (SELECT range AS sst_id FROM range(70))
)"""

_CTES["compaction_edges"] = """compaction_edges AS (
  SELECT CAST(40 + g * 2 + o AS BIGINT) AS out_sst,
         CAST(g * 4 + i AS BIGINT) AS in_sst,
         CAST(50 + g * 10 AS BIGINT) AS seq
  FROM (SELECT range AS g FROM range(10)),
       (SELECT range AS o FROM range(2)),
       (SELECT range AS i FROM range(4))
  UNION ALL
  SELECT CAST(oo + 60 AS BIGINT), CAST(ii AS BIGINT), CAST(160 AS BIGINT)
  FROM (SELECT range AS oo FROM range(2)),
       (SELECT range AS ii FROM range(40, 44))
  UNION ALL
  SELECT CAST(62 AS BIGINT), CAST(ii AS BIGINT), CAST(170 AS BIGINT)
  FROM (SELECT range AS ii FROM range(44, 48))
  UNION ALL
  SELECT CAST(69 AS BIGINT), CAST(68 AS BIGINT), CAST(210 AS BIGINT)
)"""

_CTES["sst_snapshot_files"] = """sst_snapshot_files AS (
  SELECT 'snap-d' AS snapshot_name, CAST(95 AS BIGINT) AS snapshot_gen,
         CAST(range AS BIGINT) AS sst_id FROM range(20, 50)
  UNION ALL
  SELECT 'snap-s', CAST(200 AS BIGINT), CAST(range AS BIGINT)
  FROM range(48, 69)
)"""

_CTES["pipelines"] = """pipelines AS (
  SELECT p AS pipeline_id,
    CASE WHEN p % 4 = 3 THEN 'CLOSED' ELSE 'OPEN' END AS state,
    'THREE' AS replication,
    'dn' || CAST((p * 3 + k) % 10 AS VARCHAR) AS datanode
  FROM (SELECT range AS p FROM range(12)), (SELECT range AS k FROM range(3))
  WHERE p % 3 <> 0
  UNION ALL
  SELECT p, CASE WHEN p % 4 = 3 THEN 'CLOSED' ELSE 'OPEN' END, 'ONE',
    'dn' || CAST(p % 10 AS VARCHAR)
  FROM (SELECT range AS p FROM range(12)) WHERE p % 3 = 0
)"""

_CTES["delegation_tokens"] = f"""delegation_tokens AS (
  SELECT t AS token_id,
    'user' || CAST(t % 10 AS VARCHAR) AS owner,
    'svc' || CAST(t % 3 AS VARCHAR) AS renewer,
    {NOW_MS} - (t % 14) * 86400000 AS issue_ms,
    {NOW_MS} - (t % 14) * 86400000 + (1 + t % 10) * 86400000
      AS renew_till_ms
  FROM (SELECT range AS t FROM range(40))
)"""

# dependency order matters: keys first
_ORDER = ["keys", "locations", "containers", "replicas", "datanodes",
          "directories", "snap1", "snap2", "snap3", "snapshot_chain",
          "open_keys", "deleted_keys", "multipart_uploads", "user_volumes",
          "trash_entries",
          "acl_entries", "tenant_access",
          "sst_catalog", "compaction_edges", "sst_snapshot_files",
          "pipelines", "delegation_tokens"]
_DEPS = {"directories": ["keys"], "snap1": ["keys"], "snap2": ["keys"],
         "snap3": ["keys"], "open_keys": ["keys"], "deleted_keys": ["keys"],
         "multipart_uploads": ["keys"], "user_volumes": ["keys"],
         "trash_entries": ["keys"]}


def with_views(sql: str, views: list[str]) -> str:
    """Prefix `sql` with the WITH-clause for `views` (+ dependencies)."""
    needed: list[str] = []
    for v in views:
        for dep in _DEPS.get(v, []):
            if dep not in needed:
                needed.append(dep)
        if v not in needed:
            needed.append(v)
    ordered = [v for v in _ORDER if v in needed]
    if not ordered:
        return sql
    prefix = "WITH " + ",\n".join(_CTES[v] for v in ordered)
    stripped = sql.lstrip()
    if stripped[:5].upper() == "WITH ":
        # merge the query's own CTE list into ours
        return prefix + ",\n" + stripped[5:]
    return prefix + "\n" + sql
