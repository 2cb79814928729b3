"""Multimodal payloads — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace


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
