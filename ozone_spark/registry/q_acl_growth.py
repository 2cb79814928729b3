"""ACL evaluation and growth curves — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace


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
