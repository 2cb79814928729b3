"""Round-8 additions — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_text import _NORM  # noqa: F401 — cross-domain helper
from .q_mining import _kmeans_oracle  # noqa: F401 — cross-domain helper
from .q_pipeline import _SPAN_CAT  # noqa: F401 — cross-domain helper

# shared literals for the round-8 additions
_LINK_POS = "CAST(1 + (k * 7) % len(nm) AS INT)"
_KMEANS_ORACLE_SQL = _kmeans_oracle()
# md5 ingest-batch membership (~10% of docs, uniform across sources)
_INGEST_SPARK = ("pmod(CAST(conv(substring(md5(concat('ingest-v1:', "
                 "CAST(doc_id AS STRING))), 1, 7), 16, 10) AS BIGINT), 10)"
                 " = 0")
_INGEST_DUCK = ("CAST('0x' || substr(md5('ingest-v1:' || "
                "CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10 = 0")


def _hdr_est_sql(where: str) -> str:
    """HDR quantile-estimate block over documents restricted by
    `where` — mirrors sketch.hdr_histogram + hdr_quantiles_from_hist
    term for term (log2 octave via length(bin(x)), 16 linear
    sub-buckets, ceil-rank bucket-midpoint estimates)."""
    p = "(CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT))"
    mid = (f"(({p} + ((bucket % 16) * {p}) // 16)"
           f" + ({p} + (((bucket % 16) + 1) * {p}) // 16)) // 2")
    return f"""(
  WITH base AS (
    SELECT source AS g, CAST(n_chars AS BIGINT) AS x FROM documents
    WHERE n_chars > 0 AND ({where})
  ), bk AS (
    SELECT g, (CAST(length(bin(x)) - 1 AS BIGINT) * 16
      + ((x - (CAST(1 AS BIGINT) << CAST(length(bin(x)) - 1 AS INT))) * 16)
        // (CAST(1 AS BIGINT) << CAST(length(bin(x)) - 1 AS INT))) AS bucket
    FROM base
  ), hist AS (
    SELECT g, bucket, count(*) AS cnt FROM bk GROUP BY 1, 2
  ), rk AS (
    SELECT g, bucket,
      CAST(sum(cnt) OVER (PARTITION BY g ORDER BY bucket) AS BIGINT) AS cum,
      CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n,
      {mid} AS mid
    FROM hist
  )
  SELECT g, max(n) AS n,
    min(CASE WHEN cum >= (50 * n + 99) // 100 THEN mid END) AS p50_est,
    min(CASE WHEN cum >= (90 * n + 99) // 100 THEN mid END) AS p90_est,
    min(CASE WHEN cum >= (99 * n + 99) // 100 THEN mid END) AS p99_est
  FROM rk GROUP BY g)"""


# Round-8 additions (registered with oracles in the same commit, per the
# zero-debt gate discipline).
_INGEST_DEDUP_ORACLE = f"""WITH corpus AS (
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
ORDER BY doc_id"""


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
        _INGEST_DEDUP_ORACLE,
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
    _q(
        "hdr_quantiles",
        lambda spark, sf: sketch.hdr_quantile_report(
            views(spark, sf)["documents"]),
        # HDR-histogram quantile sketch (log2 octaves x 16 linear
        # sub-buckets, pure integer bucketing) graded against the exact
        # order statistic per source; the sketch side is the mergeable
        # one-pass 100 TB path, the exact side is the fidelity truth
        """WITH base AS (
  SELECT source AS g, CAST(n_chars AS BIGINT) AS x FROM documents
  WHERE n_chars > 0
), bk AS (
  SELECT g, (CAST(length(bin(x)) - 1 AS BIGINT) * 16
    + ((x - (CAST(1 AS BIGINT) << CAST(length(bin(x)) - 1 AS INT))) * 16)
      // (CAST(1 AS BIGINT) << CAST(length(bin(x)) - 1 AS INT))) AS bucket
  FROM base
), hist AS (
  SELECT g, bucket, count(*) AS cnt FROM bk GROUP BY 1, 2
), rk AS (
  SELECT g, bucket, cnt,
    CAST(sum(cnt) OVER (PARTITION BY g ORDER BY bucket) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n,
    (((CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT))
      + ((bucket % 16) * (CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT))) // 16)
     + ((CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT))
      + (((bucket % 16) + 1) * (CAST(1 AS BIGINT) << CAST(bucket // 16 AS INT))) // 16)
    ) // 2 AS mid
  FROM hist
), est AS (
  SELECT g, max(n) AS n,
    min(CASE WHEN cum >= (50 * n + 99) // 100 THEN mid END) AS p50_est,
    min(CASE WHEN cum >= (90 * n + 99) // 100 THEN mid END) AS p90_est,
    min(CASE WHEN cum >= (99 * n + 99) // 100 THEN mid END) AS p99_est
  FROM rk GROUP BY g
), ex AS (
  SELECT g,
    max(CASE WHEN rn = (50 * n + 99) // 100 THEN x END) AS p50_exact,
    max(CASE WHEN rn = (90 * n + 99) // 100 THEN x END) AS p90_exact,
    max(CASE WHEN rn = (99 * n + 99) // 100 THEN x END) AS p99_exact
  FROM (SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
               count(*) OVER (PARTITION BY g) AS n FROM base)
  GROUP BY g
)
SELECT est.g AS source, est.n,
  p50_est, p50_exact,
  (abs(p50_est - p50_exact) * 1000000) // greatest(p50_exact, 1) AS p50_err_ppm,
  p90_est, p90_exact,
  (abs(p90_est - p90_exact) * 1000000) // greatest(p90_exact, 1) AS p90_err_ppm,
  p99_est, p99_exact,
  (abs(p99_est - p99_exact) * 1000000) // greatest(p99_exact, 1) AS p99_err_ppm,
  CAST(31250 AS BIGINT) AS bound_ppm
FROM est JOIN ex ON est.g = ex.g ORDER BY source""",
        bench=True,
    ),
    _q(
        "session_concurrency",
        lambda spark, sf: eops.session_concurrency(
            views(spark, sf)["events"]),
        # the range-join shape: per session [s, e], purchases by OTHER
        # users inside the interval.  Spark side counts via two-level
        # prefix sums (order statistics, no pair blow-up); the oracle is
        # the naive BETWEEN join (DuckDB IEJoin) — an independent
        # derivation that cross-checks the whole prefix-sum algebra
        """WITH e AS (
  SELECT user_id, event_id, ts, epoch_ms(ts) // 1000 AS tss FROM events
), l AS (
  SELECT *, lag(tss) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM e
), s AS (
  SELECT *, CASE WHEN prev IS NOT NULL AND tss - prev > 1800 THEN 1 ELSE 0 END
    AS new_sess FROM l
), c AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM s
), iv AS (
  SELECT user_id, session_id, min(tss) AS s, max(tss) AS e FROM c GROUP BY 1, 2
), p AS (
  SELECT user_id AS u, epoch_ms(ts) // 1000 AS t FROM events
  WHERE event_type = 'purchase'
), cnt AS (
  SELECT iv.user_id, iv.session_id, count(p.t) AS concurrent
  FROM iv LEFT JOIN p ON p.t BETWEEN iv.s AND iv.e AND p.u <> iv.user_id
  GROUP BY 1, 2
)
SELECT concurrent, count(*) AS n_sessions FROM cnt GROUP BY 1 ORDER BY 1""",
        bench=True,
    ),
    _q(
        "record_linkage",
        lambda spark, sf: linkage.record_linkage(
            views(spark, sf)["customer"]),
        # SymSpell-blocked 1-edit entity resolution against the
        # deterministically perturbed system-B twin, graded per
        # perturbation class vs known ground truth (precision < 1 by
        # construction: digit-structured names collide under 1 edit)
        f"""WITH a AS (
  SELECT c_custkey AS k, c_name AS nm FROM customer
), b AS (
  SELECT k AS bk, CASE k % 3
    WHEN 0 THEN nm
    WHEN 1 THEN substr(nm, 1, {_LINK_POS} - 1) || substr(nm, {_LINK_POS} + 1)
    ELSE substr(nm, 1, {_LINK_POS} - 1) || 'x' || substr(nm, {_LINK_POS} + 1)
  END AS bnm FROM a
), av AS (
  SELECT DISTINCT k, CASE WHEN i = 0 THEN nm
    ELSE substr(nm, 1, i - 1) || substr(nm, i + 1) END AS v
  FROM a, LATERAL (SELECT unnest(range(0, len(nm) + 1)) AS i)
), bv AS (
  SELECT DISTINCT bk, CASE WHEN i = 0 THEN bnm
    ELSE substr(bnm, 1, i - 1) || substr(bnm, i + 1) END AS v
  FROM b, LATERAL (SELECT unnest(range(0, len(bnm) + 1)) AS i)
), cand AS (
  SELECT DISTINCT k, bk FROM av JOIN bv USING (v)
), pairs AS (
  SELECT cand.k, cand.bk, levenshtein(a.nm, b.bnm) AS lev,
    CASE cand.bk % 3 WHEN 0 THEN 'exact' WHEN 1 THEN 'delete'
      ELSE 'substitute' END AS b_class
  FROM cand JOIN a ON a.k = cand.k JOIN b ON b.bk = cand.bk
), ent AS (
  SELECT CASE bk % 3 WHEN 0 THEN 'exact' WHEN 1 THEN 'delete'
    ELSE 'substitute' END AS b_class, count(*) AS n_entities
  FROM b GROUP BY 1
), agg AS (
  SELECT b_class, count(*) AS n_candidates,
    CAST(sum((lev <= 1)::INT) AS BIGINT) AS n_matched,
    CAST(sum((lev <= 1 AND k = bk)::INT) AS BIGINT) AS n_true
  FROM pairs GROUP BY 1
), m AS (
  SELECT ent.b_class, n_entities, n_candidates, n_matched, n_true,
    (n_true * 1000000) // greatest(n_matched, 1) AS precision_ppm,
    (n_true * 1000000) // greatest(n_entities, 1) AS recall_ppm
  FROM ent JOIN agg USING (b_class)
)
SELECT b_class, n_entities, n_candidates, n_matched, n_true,
  precision_ppm, recall_ppm,
  (2 * precision_ppm * recall_ppm)
    // greatest(precision_ppm + recall_ppm, 1) AS f1_ppm
FROM m ORDER BY b_class""",
        bench=True,
    ),
    _q(
        "prototype_pruning",
        lambda spark, sf: similarity.prototype_pruning(
            views(spark, sf)["embeddings"]),
        # D4/SSL-prototypes diversity pruning: rank by distance to the
        # kmeans_assign centroid (same fixed-point oracle CTEs wrapped
        # as a derived table), prune the closest ceil(25%) per cluster
        f"""WITH r AS (
  SELECT cluster, dist_sq_q,
    row_number() OVER (PARTITION BY cluster
                       ORDER BY dist_sq_q, vec_id) AS rn,
    count(*) OVER (PARTITION BY cluster) AS n
  FROM ({_KMEANS_ORACLE_SQL}) ka
), f AS (
  SELECT cluster, dist_sq_q, n,
    CASE WHEN rn <= (25 * n + 99) // 100 THEN 1 ELSE 0 END AS pruned
  FROM r
)
SELECT cluster, CAST(max(n) AS BIGINT) AS n,
  CAST(sum(pruned) AS BIGINT) AS n_pruned,
  CAST(sum(CASE WHEN pruned = 1 THEN dist_sq_q END)
       // greatest(sum(pruned), 1) AS BIGINT) AS pruned_mean_dist,
  CAST(sum(CASE WHEN pruned = 0 THEN dist_sq_q END)
       // greatest(count(*) - sum(pruned), 1) AS BIGINT) AS kept_mean_dist
FROM f GROUP BY cluster ORDER BY cluster""",
    ),
    _q(
        "mixture_waterfill",
        lambda spark, sf: pipeline.mixture_waterfill(
            views(spark, sf)["documents"]),
        # balanced multilingual token allocation under the 4-epoch cap
        # (Muennighoff et al. 2023) via closed-form integer waterfill:
        # saturated set is a prefix of the capacity sort, found in one
        # window pass with cross-multiplied (division-free) comparisons
        """WITH cells AS (
  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
  FROM documents GROUP BY lang
), c2 AS (
  SELECT lang, toks, toks * 4 AS cap FROM cells
), tot AS (
  SELECT CAST(sum(toks) AS BIGINT) AS tt, count(*) AS n FROM c2
), j AS (
  SELECT lang, toks, cap, n, 3 * tt AS b,
    row_number() OVER (ORDER BY cap, lang) AS r,
    CAST(sum(cap) OVER (ORDER BY cap, lang
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
  FROM c2, tot
), js AS (
  SELECT *, CASE WHEN cap * (n - r) <= b - c THEN 1 ELSE 0 END AS saturated
  FROM j
), sat AS (
  SELECT CAST(sum(saturated) AS BIGINT) AS rstar,
    CAST(sum(cap * saturated) AS BIGINT) AS csat FROM js
)
SELECT lang, toks, cap,
  CASE WHEN saturated = 1 THEN cap
    ELSE (b - csat) // greatest(n - rstar, 1) END AS allocated,
  (CASE WHEN saturated = 1 THEN cap
    ELSE (b - csat) // greatest(n - rstar, 1) END * 1000000)
    // greatest(toks, 1) AS epochs_ppm,
  CAST(saturated AS BIGINT) AS saturated
FROM js, sat ORDER BY lang""",
    ),
    _q(
        "shard_dedup_leakage",
        lambda spark, sf: pipeline.shard_dedup_leakage(
            views(spark, sf)["documents"]),
        # span-grain sharding audit: duplicated 8-word-span pairs left
        # cross-shard by naive md5(doc_id) sharding vs one-permutation
        # MinHash locality sharding (shard = min span hash mod S);
        # pair counts are pure C(n,2) algebra over (h, shard) counts
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
    CAST('0x' || substr(md5({_SPAN_CAT}), 1, 15) AS BIGINT) AS h
  FROM words, LATERAL (SELECT unnest(range(1, len(w) - 6)) AS i)
  WHERE len(w) >= 8
), keyed AS (
  SELECT h,
    CAST('0x' || substr(md5('{pipeline.SHARD_LEAK_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 8 AS shard_doc,
    (min(h) OVER (PARTITION BY doc_id)) % 8 AS shard_loc
  FROM sh
), res AS (
  SELECT 'doc_hash' AS strategy, h, shard_doc AS s FROM keyed
  UNION ALL
  SELECT 'span_locality', h, shard_loc FROM keyed
), per_shard AS (
  SELECT strategy, h, s, count(*) AS ns FROM res GROUP BY 1, 2, 3
), per_h AS (
  SELECT strategy, h, CAST(sum(ns) AS BIGINT) AS nh,
    CAST(sum(ns * (ns - 1) // 2) AS BIGINT) AS same_pairs
  FROM per_shard GROUP BY 1, 2
)
SELECT strategy, count(*) AS n_dup_spans,
  CAST(coalesce(sum(nh * (nh - 1) // 2), 0) AS BIGINT) AS dup_pairs,
  CAST(coalesce(sum(nh * (nh - 1) // 2 - same_pairs), 0) AS BIGINT)
    AS cross_shard_pairs,
  (CAST(coalesce(sum(nh * (nh - 1) // 2 - same_pairs), 0) AS BIGINT)
    * 1000000)
    // greatest(CAST(coalesce(sum(nh * (nh - 1) // 2), 0) AS BIGINT), 1)
    AS cross_ppm
FROM per_h WHERE nh > 1 GROUP BY strategy ORDER BY strategy""",
    ),
    _q(
        "linkage_degree_distribution",
        lambda spark, sf: linkage.linkage_degree_distribution(
            views(spark, sf)["customer"]),
        # the ER percolation early-warning: matches-per-record degree
        # histogram of the 1-edit match graph — counts, no closures
        # (transitive closure over this graph percolates by design;
        # this report is the go/no-go input computed BEFORE any CC)
        f"""WITH a AS (
  SELECT c_custkey AS k, c_name AS nm FROM customer
), b AS (
  SELECT k AS bk, CASE k % 3
    WHEN 0 THEN nm
    WHEN 1 THEN substr(nm, 1, {_LINK_POS} - 1) || substr(nm, {_LINK_POS} + 1)
    ELSE substr(nm, 1, {_LINK_POS} - 1) || 'x' || substr(nm, {_LINK_POS} + 1)
  END AS bnm FROM a
), av AS (
  SELECT DISTINCT k, CASE WHEN i = 0 THEN nm
    ELSE substr(nm, 1, i - 1) || substr(nm, i + 1) END AS v
  FROM a, LATERAL (SELECT unnest(range(0, len(nm) + 1)) AS i)
), bv AS (
  SELECT DISTINCT bk, CASE WHEN i = 0 THEN bnm
    ELSE substr(bnm, 1, i - 1) || substr(bnm, i + 1) END AS v
  FROM b, LATERAL (SELECT unnest(range(0, len(bnm) + 1)) AS i)
), cand AS (
  SELECT DISTINCT k, bk FROM av JOIN bv USING (v)
), matched AS (
  SELECT cand.k FROM cand JOIN a ON a.k = cand.k JOIN b ON b.bk = cand.bk
  WHERE levenshtein(a.nm, b.bnm) <= 1
), deg AS (
  SELECT a.k, count(matched.k) AS degree
  FROM a LEFT JOIN matched ON matched.k = a.k GROUP BY a.k
), hist AS (
  SELECT degree, count(*) AS n_records FROM deg GROUP BY 1
), tot AS (
  SELECT CAST(sum(degree * n_records) AS BIGINT) AS n_edges,
    CAST(sum(n_records) AS BIGINT) AS n_all,
    CAST(sum(CASE WHEN degree >= 2 THEN n_records ELSE 0 END) AS BIGINT)
      AS n_ambig
  FROM hist
)
SELECT degree, n_records, n_edges,
  (n_ambig * 1000000) // greatest(n_all, 1) AS ambiguous_ppm
FROM hist, tot ORDER BY degree""",
    ),
    _q(
        "hdr_ingest_drift",
        lambda spark, sf: sketch.hdr_ingest_drift(
            views(spark, sf)["documents"].where(f"NOT ({_INGEST_SPARK})"),
            views(spark, sf)["documents"].where(_INGEST_SPARK)),
        # resident-sketch ingest monitoring: the batch histogram merges
        # into the corpus histogram by counter addition, so the "after"
        # quantiles equal the whole-corpus estimates — the oracle
        # computes before (corpus filter) and after (no filter) blocks
        # independently and re-derives the same shift ppm.  The batch
        # key is an md5 split (doc_id % k would select whole sources:
        # doc_id is block-aligned with the source column)
        f"""WITH before AS {_hdr_est_sql(f"NOT ({_INGEST_DUCK})")},
after AS {_hdr_est_sql("TRUE")}
SELECT b.g AS source, b.n AS n_before, a.n AS n_after,
  b.p50_est AS p50_before, a.p50_est AS p50_after,
  (abs(a.p50_est - b.p50_est) * 1000000)
    // greatest(b.p50_est, 1) AS p50_shift_ppm,
  b.p90_est AS p90_before, a.p90_est AS p90_after,
  (abs(a.p90_est - b.p90_est) * 1000000)
    // greatest(b.p90_est, 1) AS p90_shift_ppm,
  b.p99_est AS p99_before, a.p99_est AS p99_after,
  (abs(a.p99_est - b.p99_est) * 1000000)
    // greatest(b.p99_est, 1) AS p99_shift_ppm
FROM before b JOIN after a ON b.g = a.g ORDER BY source""",
    ),
]
