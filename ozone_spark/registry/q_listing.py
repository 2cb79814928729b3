"""Listing / scan / pagination — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace



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
