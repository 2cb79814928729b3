"""Round-6 additions — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_text import _SH5  # noqa: F401 — cross-domain helper
from .q_similarity import _DOT  # noqa: F401 — cross-domain helper
from .q_text import _NORM  # noqa: F401 — cross-domain helper



def _centrality_sql(iters: int = dedup.CENTRALITY_ITERS,
                    k: int = dedup.CENTRALITY_K,
                    reps: bool = False) -> str:
    """DuckDB twin of dup_graph_centrality (and, with reps=True, of
    dup_graph_centrality_reps): the capped-bucket Jaccard pair graph at
    threshold 0.1 — over raw docs, or over exact-duplicate
    representatives (md5-fingerprint contraction, rep = min doc_id) —
    then `iters` unrolled damped integer-ppm propagation steps (floor
    division throughout — bit-identical to the Spark loop); the reps
    variant fans final scores back to every member of each
    representative's fingerprint group."""
    damp = dedup.CENTRALITY_DAMP_PPM
    base = 1_000_000 - damp
    if reps:
        head = f"""WITH fpt AS (
  SELECT doc_id, md5({_NORM}) AS fp FROM documents
), grp AS (
  SELECT fp, min(doc_id) AS rep, count(*) AS n_members FROM fpt GROUP BY 1
), words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w
  FROM documents JOIN grp ON doc_id = grp.rep
  WHERE len(string_split({_NORM}, ' ')) >= 3
)"""
    else:
        head = f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
)"""
    sql = head + f""", sh AS (
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
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), deg AS (
  SELECT src, count(*) AS deg FROM edges GROUP BY 1
), s0 AS (
  SELECT src AS node, CAST(1000000 AS BIGINT) AS score FROM deg
)"""
    for t in range(1, iters + 1):
        sql += f""", s{t} AS (
  SELECT d.src AS node,
    CAST({base} + ({damp} * coalesce(i.infl, 0)) // 1000000 AS BIGINT)
      AS score
  FROM deg d LEFT JOIN (
    SELECT e.dst, CAST(sum(s.score // dg.deg) AS BIGINT) AS infl
    FROM edges e JOIN deg dg ON e.src = dg.src
    JOIN s{t - 1} s ON s.node = e.src
    GROUP BY 1) i ON i.dst = d.src
)"""
    if reps:
        sql += f"""
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY score DESC, m.doc_id) AS BIGINT)
      AS rank,
    m.doc_id, g.rep AS rep_id, deg, score,
    CAST(g.n_members AS BIGINT) AS n_members
  FROM s{iters} s JOIN deg ON s.node = deg.src
  JOIN grp g ON g.rep = s.node
  JOIN fpt m ON m.fp = g.fp
) WHERE rank <= {k} ORDER BY rank"""
    else:
        sql += f"""
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY score DESC, node) AS BIGINT)
      AS rank,
    node AS doc_id, deg, score
  FROM s{iters} JOIN deg ON node = src
) WHERE rank <= {k} ORDER BY rank"""
    return sql


# Round-6 additions.  All outputs are exact integers (counts, ppm floor
# divisions, order statistics) except where an existing verified float
# pattern is reused — the r5 hash-robustness rule applied from birth.
R6_QUERIES = [
    _q(
        "dup_graph_centrality",
        lambda spark, sf: dedup.dup_graph_centrality(
            views(spark, sf)["documents"]),
        # damped integer-ppm propagation over the near-dup pair graph,
        # 3 unrolled iterations, floor division both engines
        _centrality_sql(),
    ),
    _q(
        "events_funnel_latency",
        lambda spark, sf: eops.funnel_latency(views(spark, sf)["events"]),
        # time-to-convert per funnel transition: exact integer-second
        # deltas off the same min-timestamp cascade as event_funnel,
        # percentiles as exact order statistics (rank = ceil(n/2) /
        # ceil(0.9n), user_id tiebreak) — never interpolated quantiles
        """WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1
), d AS (
  SELECT 2 AS step_idx, 'view->click' AS transition, s2.user_id,
    date_diff('second', s1.t, s2.t) AS delta_s
  FROM s2 JOIN s1 USING (user_id)
  UNION ALL
  SELECT 3, 'click->purchase', s3.user_id,
    date_diff('second', s2.t, s3.t)
  FROM s3 JOIN s2 USING (user_id)
), r AS (
  SELECT *, row_number() OVER (PARTITION BY step_idx
      ORDER BY delta_s, user_id) AS rn,
    count(*) OVER (PARTITION BY step_idx) AS n
  FROM d
), stats AS (
  SELECT step_idx, transition, count(*) AS n_users,
    min(delta_s) AS min_s, max(delta_s) AS max_s
  FROM d GROUP BY 1, 2
), qs AS (
  SELECT step_idx,
    max(CASE WHEN rn = (n + 1) // 2 THEN delta_s END) AS median_s,
    max(CASE WHEN rn = (9 * n + 9) // 10 THEN delta_s END) AS p90_s
  FROM r GROUP BY 1
)
SELECT s.step_idx, transition, n_users, min_s, max_s, median_s, p90_s
FROM stats s JOIN qs ON s.step_idx = qs.step_idx ORDER BY 1""",
    ),
    _q(
        "events_power_users",
        lambda spark, sf: eops.power_users(views(spark, sf)["events"]),
        # heavy-hitter report: exact ordering (volume DESC, user_id),
        # corpus share in integer ppm
        """WITH per AS (
  SELECT user_id, count(*) AS n_events,
    count(DISTINCT CAST(ts AS DATE)) AS n_active_days,
    count(DISTINCT event_type) AS n_types
  FROM events GROUP BY 1
), t AS (SELECT count(*) AS total FROM events)
SELECT * FROM (
  SELECT CAST(row_number() OVER (ORDER BY n_events DESC, user_id)
      AS BIGINT) AS rank,
    user_id, n_events, n_active_days, n_types,
    (n_events * 1000000) // total AS share_ppm
  FROM per, t
) WHERE rank <= 20 ORDER BY rank""",
    ),
    _q(
        "source_length_drift",
        lambda spark, sf: text.source_length_drift(
            views(spark, sf)["documents"]),
        # total-variation drift of per-source log2-length histograms vs
        # the corpus: pure BIGINT count products, absent bins folded in
        # as rt*(g - sum_present(bt)) — no source x bin grid, no floats
        """WITH o AS (
  SELECT source, CAST(length(bin(n_chars + 1)) - 1 AS BIGINT) AS bin,
    count(*) AS o
  FROM documents GROUP BY 1, 2
), rt AS (SELECT source, CAST(sum(o) AS BIGINT) AS rt FROM o GROUP BY 1),
bt AS (SELECT bin, CAST(sum(o) AS BIGINT) AS bt FROM o GROUP BY 1),
g AS (SELECT CAST(sum(o) AS BIGINT) AS g FROM o),
per AS (
  SELECT source, any_value(rt) AS rt, any_value(g) AS g,
    CAST(sum(abs(o * g - rt * bt)) AS BIGINT) AS s1,
    CAST(sum(bt) AS BIGINT) AS s2,
    count(*) AS n_bins_active
  FROM o JOIN bt USING (bin) JOIN rt USING (source), g
  GROUP BY source
)
SELECT source, rt AS n_docs, n_bins_active,
  (s1 + rt * (g - s2)) * 1000000 // (2 * rt * g) AS tv_ppm
FROM per ORDER BY source""",
    ),
    _q(
        "reading_ease",
        lambda spark, sf: text.reading_ease(views(spark, sf)["documents"]),
        # Flesch-style complexity: regexp-match counts (identical
        # semantics both engines), ratios as BIGINT ppm floor divisions
        f"""WITH per AS (
  SELECT lang,
    len(list_filter(string_split({_NORM}, ' '), x -> x <> '')) AS w,
    len(regexp_extract_all(text, '[.!?]+')) AS s,
    len(regexp_extract_all({_NORM}, '[aeiou]+')) AS y
  FROM documents
)
SELECT lang, count(*) AS n_docs,
  CAST(sum(w) AS BIGINT) AS total_words,
  CAST(sum(s) AS BIGINT) AS total_sentences,
  CAST(sum(y) AS BIGINT) AS total_syllables,
  CASE WHEN CAST(sum(s) AS BIGINT) > 0
    THEN (CAST(sum(w) AS BIGINT) * 1000000) // CAST(sum(s) AS BIGINT)
  END AS words_per_sentence_ppm,
  CASE WHEN CAST(sum(w) AS BIGINT) > 0
    THEN (CAST(sum(y) AS BIGINT) * 1000000) // CAST(sum(w) AS BIGINT)
  END AS syllables_per_word_ppm
FROM per GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "ngram_novelty_curve",
        lambda spark, sf: dedup.ngram_novelty_curve(
            views(spark, sf)["documents"]),
        # shingle-level novelty per ingest decile: distinct n-grams vs
        # never-seen-before n-grams (first bucket = min over buckets),
        # 60-bit md5 shingle ids replayed exactly
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), hs AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
  FROM sh
), mx AS (SELECT max(doc_id) AS m FROM documents),
b AS (
  SELECT DISTINCT CAST(doc_id * 10 // (m + 1) AS INT) AS bucket, h
  FROM hs, mx
), per AS (SELECT bucket, count(*) AS n_distinct FROM b GROUP BY 1),
fs AS (SELECT h, min(bucket) AS bucket FROM b GROUP BY 1),
np AS (SELECT bucket, count(*) AS n_new FROM fs GROUP BY 1)
SELECT per.bucket, n_distinct, coalesce(n_new, 0) AS n_new,
  CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY per.bucket) AS BIGINT)
    AS cum_new,
  (coalesce(n_new, 0) * 1000000) // n_distinct AS novelty_ppm
FROM per LEFT JOIN np ON per.bucket = np.bucket ORDER BY 1""",
    ),
    _q(
        "embedding_dim_fidelity",
        lambda spark, sf: similarity.dim_truncation_fidelity(
            views(spark, sf)["embeddings"]),
        # matryoshka truncation eval: exact top-10 over the first 32
        # dims vs the full-dim exact top-10, recall in integer ppm
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (30, 31, 32)
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
  SELECT vec_id, embedding[1:32] AS te FROM embeddings
), qt AS (
  SELECT vec_id AS query_id, te AS qe2 FROM tr
  WHERE vec_id IN (30, 31, 32)
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
  CAST(32 AS BIGINT) AS keep_dims
FROM truth t LEFT JOIN approx a
  ON t.query_id = a.query_id AND t.vec_id = a.vec_id
GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "contamination_by_source",
        lambda spark, sf: pipeline.contamination_by_source(
            views(spark, sf)["documents"].where("doc_id % 25 <> 0"),
            views(spark, sf)["documents"].where("doc_id % 25 = 0")),
        # decontaminate's per-doc flags rolled up to the source grain
        # (same eval split as decontaminate_overlap); rates in ppm
        f"""WITH shl AS (
  SELECT doc_id, {_SH5} AS shs
  FROM (SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents)
  WHERE len(w) >= 5
), ev AS (
  SELECT DISTINCT unnest(shs) AS s FROM shl WHERE doc_id % 25 = 0
), tr AS (
  SELECT doc_id, len(shs) AS n_sh, unnest(shs) AS s FROM shl
  WHERE doc_id % 25 <> 0
), agg AS (
  SELECT tr.doc_id, any_value(tr.n_sh) AS n_sh, count(ev.s) AS n_hit
  FROM tr LEFT JOIN ev ON tr.s = ev.s GROUP BY 1
), flagged AS (
  SELECT d.source, a.n_hit,
    (a.n_hit / a.n_sh >= {pipeline.DECONTAM_MIN_OVERLAP})::BIGINT AS c
  FROM documents d JOIN agg a ON d.doc_id = a.doc_id
)
SELECT source, count(*) AS n_docs,
  CAST(sum(c) AS BIGINT) AS n_contaminated,
  CAST(sum(n_hit) AS BIGINT) AS overlap_shingles,
  (CAST(sum(c) AS BIGINT) * 1000000) // count(*) AS contamination_ppm
FROM flagged GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "curation_report",
        lambda spark, sf: text.curation_report(views(spark, sf)["documents"]),
        # per-source Gopher pass rate in integer ppm + threshold verdict
        f"""WITH m AS (
  SELECT source,
    len(string_split(text, ' ')) AS n_words,
    (length(text) - len(string_split(text, ' ')) + 1)
      / len(string_split(text, ' ')) AS mean_wl,
    (length(text)
      - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))
      / greatest(len(string_split(text, ' ')), 1) AS sym_ratio,
    len(list_intersect(list_distinct(string_split(text, ' ')),
        ['the', 'a', 'of', 'and', 'to', 'in'])) AS n_sw,
    len(list_filter(string_split(text, ' '),
        w -> regexp_matches(w, '[a-zA-Z]')))
      / greatest(len(string_split(text, ' ')), 1) AS alpha_ratio
  FROM documents
), p AS (
  SELECT source,
    ((n_words >= {text.GOPHER_MIN_WORDS}
      AND n_words <= {text.GOPHER_MAX_WORDS})
     AND (mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
       AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN})
     AND sym_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO}
     AND n_sw >= {text.GOPHER_MIN_DISTINCT_STOPWORDS}
     AND alpha_ratio >= {text.GOPHER_MIN_ALPHA_WORD_RATIO})::BIGINT AS p
  FROM m
), t AS (SELECT count(*) AS total FROM p),
per AS (
  SELECT source, count(*) AS n_docs, CAST(sum(p) AS BIGINT) AS n_pass
  FROM p GROUP BY 1
)
SELECT source, n_docs,
  (n_docs * 1000000) // total AS share_ppm, n_pass,
  (n_pass * 1000000) // n_docs AS pass_ppm,
  CASE WHEN (n_pass * 1000000) // n_docs >= {text.CURATION_KEEP_PPM}
    THEN 'keep'
    WHEN (n_pass * 1000000) // n_docs >= {text.CURATION_DOWNSAMPLE_PPM}
    THEN 'downsample' ELSE 'drop' END AS verdict
FROM per, t ORDER BY source""",
    ),
    _q(
        "length_percentiles_by_source",
        lambda spark, sf: text.length_percentiles_by_source(
            views(spark, sf)["documents"]),
        # exact order-statistic p50/p90/p99 of n_chars per source
        # (rank = ceil(q*n), doc_id tiebreak)
        """WITH r AS (
  SELECT source, n_chars,
    row_number() OVER (PARTITION BY source
      ORDER BY n_chars, doc_id) AS rn,
    count(*) OVER (PARTITION BY source) AS n
  FROM documents
), stats AS (
  SELECT source, count(*) AS n_docs, min(n_chars) AS min_chars,
    max(n_chars) AS max_chars
  FROM documents GROUP BY 1
), qs AS (
  SELECT source,
    max(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50_chars,
    max(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90_chars,
    max(CASE WHEN rn = (99 * n + 99) // 100 THEN n_chars END) AS p99_chars
  FROM r GROUP BY 1
)
SELECT s.source, n_docs, min_chars, p50_chars, p90_chars, p99_chars,
  max_chars
FROM stats s JOIN qs ON s.source = qs.source ORDER BY 1""",
    ),
    _q(
        "dedup_savings",
        lambda spark, sf: dedup.dedup_savings(views(spark, sf)["documents"]),
        # per-source exact-dedup savings: corpus-wide keeper rule (min
        # doc_id per fingerprint), character savings in integer ppm
        f"""WITH base AS (
  SELECT doc_id, source, n_chars, md5({_NORM}) AS fp FROM documents
), keep AS (
  SELECT fp, min(doc_id) AS keeper FROM base GROUP BY 1
), flagged AS (
  SELECT source, n_chars,
    (base.doc_id <> keeper)::BIGINT AS red
  FROM base JOIN keep USING (fp)
)
SELECT source, count(*) AS n_docs,
  CAST(sum(red) AS BIGINT) AS n_redundant,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  CAST(sum(red * n_chars) AS BIGINT) AS redundant_chars,
  (CAST(sum(red * n_chars) AS BIGINT) * 1000000)
    // CAST(sum(n_chars) AS BIGINT) AS savings_ppm
FROM flagged GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "shard_balance",
        lambda spark, sf: pipeline.shard_balance(
            views(spark, sf)["documents"]),
        # per-split shard token-load balance off the training_shards
        # assignment; imbalance in integer ppm
        f"""WITH k AS (
  SELECT doc_id,
    CAST('0x' || substr(md5('{pipeline.SPLIT_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10000 AS split_key,
    CAST('0x' || substr(md5('{pipeline.SHARD_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) AS skey,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), a AS (
  SELECT CASE WHEN split_key < {pipeline.SPLIT_CUTS[0][1]} THEN 'train'
         WHEN split_key < {pipeline.SPLIT_CUTS[1][1]} THEN 'val'
         ELSE 'test' END AS split,
    skey % {pipeline.N_SHARDS} AS shard, n_tok
  FROM k
), per AS (
  SELECT split, shard, CAST(sum(n_tok) AS BIGINT) AS tok
  FROM a GROUP BY 1, 2
)
SELECT split, count(*) AS n_shards,
  min(tok) AS min_tokens, max(tok) AS max_tokens,
  CAST(sum(tok) AS BIGINT) AS total_tokens,
  ((max(tok) - min(tok)) * 1000000) // max(tok) AS imbalance_ppm
FROM per GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "events_interarrival",
        lambda spark, sf: eops.interarrival_stats(views(spark, sf)["events"]),
        # per-type whole-second gap distribution between a user's
        # consecutive same-type events; exact order-statistic
        # percentiles with (user_id, event_id) tiebreak
        """WITH g AS (
  SELECT event_type, user_id, event_id,
    date_diff('second',
      lag(ts) OVER (PARTITION BY user_id, event_type
                    ORDER BY ts, event_id), ts) AS delta_s
  FROM events
), gaps AS (SELECT * FROM g WHERE delta_s IS NOT NULL),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
      ORDER BY delta_s, user_id, event_id) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM gaps
), stats AS (
  SELECT event_type, count(*) AS n_gaps,
    min(delta_s) AS min_s, max(delta_s) AS max_s
  FROM gaps GROUP BY 1
), qs AS (
  SELECT event_type,
    max(CASE WHEN rn = (n + 1) // 2 THEN delta_s END) AS median_s,
    max(CASE WHEN rn = (9 * n + 9) // 10 THEN delta_s END) AS p90_s
  FROM r GROUP BY 1
)
SELECT s.event_type, n_gaps, min_s, max_s, median_s, p90_s
FROM stats s JOIN qs ON s.event_type = qs.event_type ORDER BY 1""",
    ),
]
