"""Round-8 additions — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace



# Round-8 additions (registered with oracles in the same commit, per the
# zero-debt gate discipline).
R8_QUERIES = [
    _q(
        "events_disorder_partitioned",
        lambda spark, sf: eops.disorder_stats_partitioned(
            views(spark, sf)["events"]),
        # production-grain disorder (VERDICT r7 item 4): the same
        # running-max lateness stats as events_disorder, keyed by the
        # md5-derived ingest partition (user_id mod 8) instead of the
        # type vocabulary — the grain withWatermark actually advances on
        f"""WITH e AS (
  SELECT CAST('0x' || substr(md5('{eops.DISORDER_PART_SALT}:'
      || CAST(user_id AS VARCHAR)), 1, 7) AS BIGINT)
      % {eops.DISORDER_PARTITIONS} AS ingest_part,
    event_id, ts
  FROM events
), o AS (
  SELECT ingest_part, event_id, ts,
    max(ts) OVER (PARTITION BY ingest_part ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
  FROM e
), d AS (
  SELECT ingest_part, event_id,
    greatest(0, date_diff('second', ts, mx)) AS dis
  FROM o WHERE mx IS NOT NULL
), late AS (SELECT * FROM d WHERE dis > 0),
r AS (
  SELECT *, row_number() OVER (PARTITION BY ingest_part
      ORDER BY dis, event_id) AS rn,
    count(*) OVER (PARTITION BY ingest_part) AS n
  FROM late
), agg AS (
  SELECT ingest_part, count(*) AS n_events,
    CAST(sum((dis > 0)::INT) AS BIGINT) AS n_late,
    CAST(max(dis) AS BIGINT) AS late_max_s
  FROM d GROUP BY 1
), qs AS (
  SELECT ingest_part,
    max(CASE WHEN rn = (n + 1) // 2 THEN dis END) AS late_p50_s,
    max(CASE WHEN rn = (9 * n + 9) // 10 THEN dis END) AS late_p90_s
  FROM r GROUP BY 1
)
SELECT a.ingest_part, n_events, n_late,
  (n_late * 1000000) // n_events AS late_ppm,
  CAST(coalesce(late_p50_s, 0) AS BIGINT) AS late_p50_s,
  CAST(coalesce(late_p90_s, 0) AS BIGINT) AS late_p90_s,
  late_max_s
FROM agg a LEFT JOIN qs ON a.ingest_part = qs.ingest_part
ORDER BY 1""",
    ),
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
