"""Round-7 additions — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_text import _SW  # noqa: F401 — cross-domain helper
from .q_dedup import _CLUSTERS_CTE  # noqa: F401 — cross-domain helper
from .q_dedup import _minhash_sig_sql  # noqa: F401 — cross-domain helper
from .q_text import _NORM  # noqa: F401 — cross-domain helper
from .q_dedup import _MINHASH_BANDS_CTES  # noqa: F401 — cross-domain helper
from .q_similarity import _DOT  # noqa: F401 — cross-domain helper
from .q_r6 import _centrality_sql  # noqa: F401 — cross-domain helper



# Round-7 additions (registered with oracles in the same commit, per the
# r6 zero-debt gate discipline).
R7_QUERIES = [
    _q(
        "dup_graph_centrality_reps",
        lambda spark, sf: dedup.dup_graph_centrality_reps(
            views(spark, sf)["documents"]),
        # exact-contraction first, propagation over representatives,
        # scores fanned back to members (VERDICT r6 item 4) — same
        # integer-ppm loop as the member-level twin
        _centrality_sql(reps=True),
        bench=True,
    ),
    _q(
        "media_ppm_features",
        lambda spark, sf: multimodal.ppm_features(
            multimodal.ppm_media_table(
                views(spark, sf)["documents"])).orderBy("doc_id"),
        # REAL decode path (VERDICT r6 item 7): each doc becomes a
        # genuine spec-compliant P6 PPM payload (header + raster) and
        # is parsed back by the pure-numpy netpbm decoder; channel sums
        # are exact integers the oracle replays from the encoder's
        # pixel pattern flat[i] = (doc_id + i) % 256
        """WITH d AS (
  SELECT doc_id, greatest((n_chars + 47) // 48, 1) AS h FROM documents
), px AS (
  SELECT doc_id, h, unnest(range(16 * h)) AS p FROM d
), s AS (
  SELECT doc_id,
    CAST(sum((doc_id + 3 * p + 0) % 256) AS BIGINT) AS sum_r,
    CAST(sum((doc_id + 3 * p + 1) % 256) AS BIGINT) AS sum_g,
    CAST(sum((doc_id + 3 * p + 2) % 256) AS BIGINT) AS sum_b
  FROM px GROUP BY doc_id
)
SELECT d.doc_id, CAST(16 AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
  CAST(16 * h AS BIGINT) AS n_pixels, sum_r, sum_g, sum_b
FROM d JOIN s USING (doc_id) ORDER BY doc_id""",
        bench=True,
    ),
    _q(
        "ivf_probe_sweep",
        lambda spark, sf: similarity.ivf_probe_sweep(
            views(spark, sf)["embeddings"]),
        # recall@10 as a function of n_probe (1..8): a true neighbor is
        # retrieved at level p iff its centroid's probe rank <= p, so
        # the whole curve is one truth pass + one assignment pass +
        # a centroid-rank join — integer ppm throughout
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (40, 41, 42)
), scored AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6) AS cos_sim
  FROM embeddings, q WHERE vec_id <> query_id
), truth AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM scored
  ) WHERE rank <= 10
), ncent AS (
  -- half-even power-of-two rounding; see the knn_ivf oracle note
  SELECT greatest(4, least(65536, CAST(power(2,
    floor(x) + CASE WHEN x - floor(x) > 0.5 THEN 1
      WHEN x - floor(x) = 0.5 THEN CAST(floor(x) AS BIGINT) % 2
      ELSE 0 END) AS BIGINT))) AS nc
  FROM (SELECT log2(greatest(sqrt(count(*) * 1.0), 4)) AS x
        FROM embeddings)
), cents AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings, ncent
  WHERE vec_id < nc
), assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_DOT.format(a='e.embedding', b='c.c')} DESC,
                 c.centroid_id DESC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
), prank AS (
  SELECT q.query_id, c.centroid_id,
    row_number() OVER (PARTITION BY q.query_id
      ORDER BY {_DOT.format(a='q.qe', b='c.c')} DESC,
               c.centroid_id ASC) AS r
  FROM q, cents c
), tr AS (
  SELECT t.query_id, p.r
  FROM truth t JOIN assigned a ON t.vec_id = a.vec_id
  JOIN prank p ON p.query_id = t.query_id AND p.centroid_id = a.centroid_id
), ntr AS (
  SELECT query_id, count(*) AS n_truth FROM truth GROUP BY 1
), spine AS (
  SELECT query_id, unnest(range(1, {similarity.IVF_SWEEP_MAX_PROBE + 1}))
    AS n_probe
  FROM q
)
SELECT s.query_id, CAST(s.n_probe AS BIGINT) AS n_probe,
  CAST(count(tr.r) AS BIGINT) AS n_hit,
  any_value(ntr.n_truth) AS n_truth,
  (CAST(count(tr.r) AS BIGINT) * 1000000) // any_value(ntr.n_truth)
    AS recall_ppm
FROM spine s JOIN ntr USING (query_id)
LEFT JOIN tr ON tr.query_id = s.query_id AND tr.r <= s.n_probe
GROUP BY s.query_id, s.n_probe ORDER BY 1, 2""",
    ),
    _q(
        "embedding_sq_fidelity",
        lambda spark, sf: similarity.sq_quantize_fidelity(
            views(spark, sf)["embeddings"]),
        # int8-style scalar-quantization gate: exact top-10 over
        # floor(x*127)/127-snapped vectors vs the full-precision exact
        # top-10 (double-cast before the multiply on both engines)
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (50, 51, 52)
), scored AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6)
      AS cos_sim
  FROM embeddings, q WHERE vec_id <> query_id
), truth AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM scored
  ) WHERE rank <= 10
), tr AS (
  SELECT vec_id, list_transform(embedding,
    x -> floor(CAST(x AS DOUBLE) * 127.0) / 127.0) AS te
  FROM embeddings
), qt AS (
  SELECT vec_id AS query_id, te AS qe2 FROM tr
  WHERE vec_id IN (50, 51, 52)
), scored2 AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe2', b='te')}
      / (sqrt({_DOT.format(a='qe2', b='qe2')})
         * sqrt({_DOT.format(a='te', b='te')})), 6) AS cos_sim
  FROM tr, qt WHERE vec_id <> query_id
), approx AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cos_sim DESC, vec_id) AS rank FROM scored2
  ) WHERE rank <= 10
)
SELECT t.query_id,
  CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hit,
  count(*) AS n_truth,
  (CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000) // count(*) AS recall_ppm,
  CAST({similarity.SQ_LEVELS} AS BIGINT) AS sq_levels
FROM truth t LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "lsh_band_yield",
        lambda spark, sf: dedup.lsh_band_yield(
            views(spark, sf)["documents"]),
        # band-count tuning curve: first-discovery band per candidate
        # pair over the same capped banding as the pair pass, then an
        # N_BANDS-row cumulative report in integer ppm
        _MINHASH_BANDS_CTES.format(norm=_NORM, sig_body=_minhash_sig_sql())
        + """, bsz AS (
  SELECT band, bucket, count(*) AS sz FROM bands GROUP BY 1, 2
), ok AS (
  SELECT band, bucket FROM bsz WHERE sz BETWEEN 2 AND 200
), bp AS (
  SELECT x.band, x.doc_id AS a, y.doc_id AS b
  FROM bands x
  JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
    AND x.doc_id < y.doc_id
  JOIN ok ON ok.band = x.band AND ok.bucket = x.bucket
), fb AS (
  SELECT a, b, min(band) AS band FROM bp GROUP BY 1, 2
), per AS (
  SELECT band, count(*) AS n_new_pairs FROM fb GROUP BY 1
), spine AS (
  SELECT unnest(range(8)) AS band
), tot AS (SELECT count(*) AS total FROM fb)
SELECT CAST(s.band AS INT) AS band,
  CAST(coalesce(per.n_new_pairs, 0) AS BIGINT) AS n_new_pairs,
  CAST(sum(coalesce(per.n_new_pairs, 0)) OVER (ORDER BY s.band) AS BIGINT)
    AS cum_pairs,
  (CAST(sum(coalesce(per.n_new_pairs, 0)) OVER (ORDER BY s.band) AS BIGINT)
    * 1000000) // greatest(tot.total, 1) AS cum_share_ppm
FROM spine s LEFT JOIN per ON per.band = s.band, tot
ORDER BY band""",
    ),
    _q(
        "events_disorder",
        lambda spark, sf: eops.disorder_stats(views(spark, sf)["events"]),
        # out-of-order depth vs the running event-time max in arrival
        # (event_id) order — the watermark-sizing report; whole-second
        # integer lateness, exact order-statistic percentiles
        """WITH o AS (
  SELECT event_type, event_id, ts,
    max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
  FROM events
), d AS (
  SELECT event_type, event_id,
    greatest(0, date_diff('second', ts, mx)) AS dis
  FROM o WHERE mx IS NOT NULL
), late AS (SELECT * FROM d WHERE dis > 0),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
      ORDER BY dis, event_id) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM late
), agg AS (
  SELECT event_type, count(*) AS n_events,
    CAST(sum((dis > 0)::INT) AS BIGINT) AS n_late,
    CAST(max(dis) AS BIGINT) AS late_max_s
  FROM d GROUP BY 1
), qs AS (
  SELECT event_type,
    max(CASE WHEN rn = (n + 1) // 2 THEN dis END) AS late_p50_s,
    max(CASE WHEN rn = (9 * n + 9) // 10 THEN dis END) AS late_p90_s
  FROM r GROUP BY 1
)
SELECT a.event_type, n_events, n_late,
  (n_late * 1000000) // n_events AS late_ppm,
  CAST(coalesce(late_p50_s, 0) AS BIGINT) AS late_p50_s,
  CAST(coalesce(late_p90_s, 0) AS BIGINT) AS late_p90_s,
  late_max_s
FROM agg a LEFT JOIN qs ON a.event_type = qs.event_type
ORDER BY 1""",
    ),
    _q(
        "dedup_source_affinity",
        lambda spark, sf: dedup.dedup_source_affinity(
            views(spark, sf)["documents"]),
        # near-dup pairs rolled up to the unordered (source, source)
        # grain with integer-ppm shares — which crawls copy from which
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
), sp AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b
  FROM pairs p
  JOIN documents da ON p.doc_a = da.doc_id
  JOIN documents db ON p.doc_b = db.doc_id
), agg AS (
  SELECT source_a, source_b, count(*) AS n_pairs FROM sp GROUP BY 1, 2
), tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS t FROM agg)
SELECT source_a, source_b, CAST(n_pairs AS BIGINT) AS n_pairs,
  (CAST(n_pairs AS BIGINT) * 1000000) // greatest(t, 1) AS share_ppm,
  source_a <> source_b AS is_cross_source
FROM agg, tot ORDER BY source_a, source_b""",
    ),
    _q(
        "context_length_coverage",
        lambda spark, sf: pipeline.context_length_coverage(
            views(spark, sf)["documents"]),
        # truncation-loss sweep over candidate max_seq_len values: one
        # corpus scan to a token-length histogram, broadcast spine join
        f"""WITH hist AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
    count(*) AS n
  FROM documents GROUP BY 1
), spine AS (
  SELECT unnest([{', '.join(str(l) for l in pipeline.CTX_LENGTHS)}])
    AS ctx_len
), j AS (
  SELECT CAST(ctx_len AS BIGINT) AS ctx_len,
    CAST(sum(n) AS BIGINT) AS docs,
    CAST(sum(CASE WHEN n_tok <= ctx_len THEN n ELSE 0 END) AS BIGINT)
      AS n_docs_fit,
    CAST(sum(n_tok * n) AS BIGINT) AS tokens,
    CAST(sum(least(n_tok, ctx_len) * n) AS BIGINT) AS tokens_kept
  FROM hist, spine GROUP BY 1
)
SELECT ctx_len, n_docs_fit,
  (n_docs_fit * 1000000) // docs AS docs_fit_ppm,
  tokens_kept, tokens - tokens_kept AS tokens_lost,
  (tokens_kept * 1000000) // tokens AS tokens_kept_ppm
FROM j ORDER BY ctx_len""",
    ),
    _q(
        "events_watermark_drop",
        lambda spark, sf: eops.watermark_drop_matrix(
            views(spark, sf)["events"]),
        # per-(type, horizon) events a withWatermark(horizon) query
        # would drop — the decision table on top of events_disorder
        f"""WITH o AS (
  SELECT event_type, event_id, ts,
    max(ts) OVER (PARTITION BY event_type ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
  FROM events
), lat AS (
  SELECT event_type,
    greatest(0, date_diff('second', ts, mx)) AS dis, count(*) AS n
  FROM o WHERE mx IS NOT NULL GROUP BY 1, 2
), spine AS (
  SELECT unnest([{', '.join(str(h)
                            for h in eops.WATERMARK_CANDIDATES_S)}])
    AS horizon_s
)
SELECT event_type, CAST(horizon_s AS BIGINT) AS horizon_s,
  CAST(sum(n) AS BIGINT) AS n_events,
  CAST(sum(CASE WHEN dis > horizon_s THEN n ELSE 0 END) AS BIGINT)
    AS n_dropped,
  (CAST(sum(CASE WHEN dis > horizon_s THEN n ELSE 0 END) AS BIGINT)
    * 1000000) // CAST(sum(n) AS BIGINT) AS drop_ppm
FROM lat, spine GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "embedding_batch_drift",
        lambda spark, sf: similarity.embedding_batch_drift(
            views(spark, sf)["embeddings"]),
        # per-dim |mean_a - mean_b| between the even/odd vec_id batches
        # in exact integer micro units (common-denominator cross
        # products over kmeans-scheme quantized vectors)
        f"""WITH qv AS (
  SELECT vec_id % 2 = 0 AS is_a, list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * {similarity.KM_QUANT})
         AS BIGINT)) AS qv
  FROM embeddings
), q AS (
  SELECT is_a, dim, qv[CAST(dim AS INT) + 1] AS x
  FROM (SELECT is_a, qv, unnest(range(0, {similarity.DIM})) AS dim
        FROM qv)
), agg AS (
  SELECT dim,
    CAST(sum(CASE WHEN is_a THEN x ELSE 0 END) AS BIGINT) AS sum_a,
    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN is_a THEN 0 ELSE x END) AS BIGINT) AS sum_b,
    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM q GROUP BY 1
)
SELECT CAST(dim AS BIGINT) AS dim, n_a, n_b,
  abs(sum_a * n_b - sum_b * n_a) * 1000000
    // (n_a * n_b * {similarity.KM_QUANT}) AS drift_micro
FROM agg ORDER BY dim""",
    ),
    _q(
        "near_dup_leakage",
        lambda spark, sf: pipeline.near_dup_leakage(
            views(spark, sf)["documents"]),
        # near-dup pairs straddling train/val/test under the standard
        # md5 split rule — the leakage exact fingerprints miss
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common)
    >= {pipeline.NEAR_LEAK_THRESHOLD}
), sp AS (
  SELECT doc_id, CASE
    WHEN CAST('0x' || substr(md5('{pipeline.SPLIT_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10000 < 9800
      THEN 'train'
    WHEN CAST('0x' || substr(md5('{pipeline.SPLIT_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10000 < 9900
      THEN 'val'
    ELSE 'test' END AS split
  FROM documents
), o AS (
  SELECT least(pa.split, pb.split) AS split_lo,
    greatest(pa.split, pb.split) AS split_hi,
    CASE WHEN pa.split < pb.split THEN p.doc_a ELSE p.doc_b END AS doc_lo,
    CASE WHEN pa.split < pb.split THEN p.doc_b ELSE p.doc_a END AS doc_hi
  FROM pairs p
  JOIN sp pa ON p.doc_a = pa.doc_id
  JOIN sp pb ON p.doc_b = pb.doc_id
  WHERE pa.split <> pb.split
)
SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(count(DISTINCT doc_lo) AS BIGINT) AS n_docs_lo,
  CAST(count(DISTINCT doc_hi) AS BIGINT) AS n_docs_hi
FROM o GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "keeper_policy_audit",
        lambda spark, sf: pipeline.keeper_policy_audit(
            views(spark, sf)["documents"]),
        # keep-first vs keep-best agreement across multi-member
        # duplicate clusters (shared contracted-clusters CTE), with the
        # quality regret in exact integer micro units
        _CLUSTERS_CTE + f""", m AS (
  SELECT mem.doc_id, mem.cluster_id,
    CAST(round(round(least(len(string_split(d.text, ' ')) / 64.0, 1.0) * 0.5
      + least(len(list_filter(string_split(d.text, ' '), w -> w IN {_SW}))
              / len(string_split(d.text, ' ')) * 5.0, 1.0) * 0.5, 6)
      * 1000000) AS BIGINT) AS q
  FROM members mem JOIN documents d ON d.doc_id = mem.doc_id
), best AS (
  SELECT cluster_id, doc_id AS best_id, q AS best_q FROM (
    SELECT *, row_number() OVER (PARTITION BY cluster_id
      ORDER BY q DESC, doc_id) AS rn FROM m) WHERE rn = 1
), sz AS (
  SELECT cluster_id, count(*) AS sz, min(doc_id) AS minid
  FROM m GROUP BY 1
), minq AS (
  SELECT m.cluster_id, m.q AS min_q
  FROM m JOIN sz ON m.cluster_id = sz.cluster_id AND m.doc_id = sz.minid
)
SELECT CAST(count(*) AS BIGINT) AS n_clusters,
  CAST(sum(sz) AS BIGINT) AS n_docs,
  CAST(sum((best_id = minid)::INT) AS BIGINT) AS n_same_pick,
  (CAST(sum((best_id = minid)::INT) AS BIGINT) * 1000000)
    // greatest(count(*), 1) AS same_pick_ppm,
  CAST(sum(best_q - min_q) AS BIGINT) AS quality_regret_micro
FROM sz JOIN best USING (cluster_id) JOIN minq USING (cluster_id)""",
    ),
    _q(
        "join_key_skew",
        lambda spark, sf: sketch.join_key_skew(
            views(spark, sf)["lineitem"], "l_orderkey"),
        # per-key row-count distribution of the join key: exact order
        # statistics off the count-of-counts histogram + top-10 share
        """WITH per AS (
  SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1
), hist AS (
  SELECT c, count(*) AS n_keys FROM per GROUP BY 1
), ranked AS (
  SELECT c, n_keys,
    sum(n_keys) OVER (ORDER BY c) AS cum,
    sum(n_keys) OVER () AS total_keys,
    sum(c * n_keys) OVER () AS total_rows
  FROM hist
), p50 AS (
  SELECT min(c) AS p50_per_key FROM ranked
  WHERE cum >= (total_keys + 1) // 2
), p99 AS (
  SELECT min(c) AS p99_per_key FROM ranked
  WHERE cum >= (99 * total_keys + 99) // 100
), top10 AS (
  SELECT CAST(sum(c) AS BIGINT) AS top10_rows FROM (
    SELECT c FROM per ORDER BY c DESC, k LIMIT 10)
), totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
    CAST(sum(c) AS BIGINT) AS n_rows,
    CAST(max(c) AS BIGINT) AS max_per_key
  FROM per
)
SELECT n_keys, n_rows, max_per_key,
  CAST(p50_per_key AS BIGINT) AS p50_per_key,
  CAST(p99_per_key AS BIGINT) AS p99_per_key,
  top10_rows,
  (top10_rows * 1000000) // greatest(n_rows, 1) AS top10_share_ppm
FROM totals, p50, p99, top10""",
    ),
    _q(
        "quality_by_dup_degree",
        lambda spark, sf: pipeline.quality_by_dup_degree(
            views(spark, sf)["documents"]),
        # mean quality (integer micro) per near-dup-degree bucket —
        # does dedup double as a quality filter on this corpus?
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
), deg AS (
  SELECT doc_id, count(*) AS deg FROM (
    SELECT doc_a AS doc_id FROM pairs
    UNION ALL SELECT doc_b FROM pairs) GROUP BY 1
), q AS (
  SELECT d.doc_id, coalesce(g.deg, 0) AS deg,
    CAST(round(round(least(len(string_split(d.text, ' ')) / 64.0, 1.0) * 0.5
      + least(len(list_filter(string_split(d.text, ' '), w -> w IN {_SW}))
              / len(string_split(d.text, ' ')) * 5.0, 1.0) * 0.5, 6)
      * 1000000) AS BIGINT) AS q_micro
  FROM documents d LEFT JOIN deg g ON g.doc_id = d.doc_id
)
SELECT CAST(CASE WHEN deg = 0 THEN 0 WHEN deg = 1 THEN 1
  WHEN deg <= 3 THEN 2 WHEN deg <= 7 THEN 3 ELSE 4 END AS BIGINT)
    AS bucket_order,
  CASE WHEN deg = 0 THEN '0' WHEN deg = 1 THEN '1'
    WHEN deg <= 3 THEN '2-3' WHEN deg <= 7 THEN '4-7' ELSE '8+' END
    AS dup_degree_bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(q_micro) AS BIGINT) // count(*) AS mean_quality_micro
FROM q GROUP BY 1, 2 ORDER BY 1""",
    ),
]
