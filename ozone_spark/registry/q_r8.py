"""Round-8 additions — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_text import _NORM  # noqa: F401 — cross-domain helper



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
        "incremental_ingest_dedup",
        lambda spark, sf: dedup.incremental_ingest_dedup(
            views(spark, sf)["documents"].where("doc_id % 10 <> 0"),
            views(spark, sf)["documents"].where("doc_id % 10 = 0")),
        # ingestion-shaped dedup: classify each batch doc (doc_id%10=0)
        # against the resident corpus — exact fingerprint hit, best
        # capped-index Jaccard in integer ppm, or new; the 100 TB shape
        # where the corpus index is built once and batches probe it
        f"""WITH corpus AS (
  SELECT * FROM documents WHERE doc_id % 10 <> 0
), batch AS (
  SELECT * FROM documents WHERE doc_id % 10 = 0
), cfps AS (
  SELECT DISTINCT md5({_NORM}) AS c_fp FROM corpus
), bfp AS (
  SELECT doc_id AS b_doc, md5({_NORM}) AS b_fp FROM batch
), exact AS (
  SELECT b_doc, c_fp IS NOT NULL AS is_exact
  FROM bfp LEFT JOIN cfps ON b_fp = c_fp
), cw AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM corpus
  WHERE len(string_split({_NORM}, ' ')) >= 3
), csh AS (
  SELECT doc_id AS c_doc, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS sh
  FROM cw
), csz AS (
  SELECT c_doc, count(*) AS n_c FROM csh GROUP BY 1
), ok AS (
  SELECT sh FROM csh GROUP BY 1 HAVING count(*) <= 200
), cidx AS (
  SELECT csh.* FROM csh JOIN ok USING (sh)
), bw AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM batch
  WHERE len(string_split({_NORM}, ' ')) >= 3
), bsh AS (
  SELECT doc_id AS b_doc, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS sh
  FROM bw
), bsz AS (
  SELECT b_doc, count(*) AS n_b FROM bsh GROUP BY 1
), com AS (
  SELECT b_doc, c_doc, count(*) AS n_common
  FROM bsh JOIN cidx USING (sh) GROUP BY 1, 2
), scored AS (
  SELECT b_doc, c_doc,
    (n_common * 1000000) // (n_b + n_c - n_common) AS jac_ppm
  FROM com JOIN bsz USING (b_doc) JOIN csz USING (c_doc)
), best AS (
  SELECT b_doc, CAST(count(*) AS BIGINT) AS n_candidates,
    max(CASE WHEN rk = 1 THEN c_doc END) AS best_match_id,
    max(CASE WHEN rk = 1 THEN jac_ppm END) AS best_jaccard_ppm
  FROM (SELECT *, row_number() OVER (PARTITION BY b_doc
          ORDER BY jac_ppm DESC, c_doc) AS rk FROM scored)
  GROUP BY 1
)
SELECT e.b_doc AS doc_id, e.is_exact AS is_exact_dup,
  coalesce(n_candidates, 0) AS n_candidates,
  CAST(coalesce(best_match_id, -1) AS BIGINT) AS best_match_id,
  CAST(coalesce(best_jaccard_ppm, 0) AS BIGINT) AS best_jaccard_ppm,
  CASE WHEN e.is_exact THEN 'exact_dup'
       WHEN coalesce(best_jaccard_ppm, 0) >= 500000 THEN 'near_dup'
       ELSE 'new' END AS verdict
FROM exact e LEFT JOIN best ON e.b_doc = best.b_doc
ORDER BY doc_id""",
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
