"""Lifecycle / expiry / trash / GDPR — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_namespace import _TTL_5Y  # noqa: F401 — cross-domain helper


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
