"""Namespace rollups (du/quota) — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_insights import _FILE_BIN  # noqa: F401 — cross-domain helper


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
