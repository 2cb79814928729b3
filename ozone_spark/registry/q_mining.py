"""Mining (PII/TF-IDF/BM25/BPE/perplexity) — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_similarity import _DOT  # noqa: F401 — cross-domain helper
from .q_dedup import _simhash_combine_sql  # noqa: F401 — cross-domain helper
from .q_dedup import _simhash_sums_sql  # noqa: F401 — cross-domain helper
from .q_text import _NORM  # noqa: F401 — cross-domain helper


# ---------------------------------------------------------------------------
# corpus mining / event analytics batch 2 (PII, TF-IDF, as-of, rolling,
# rollup, JSON, k-means — training-pipeline north star)
# ---------------------------------------------------------------------------

_PII_TAIL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
    " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)
_PII_RED = (
    "regexp_replace(regexp_replace(regexp_replace(t, '"
    + mining.EMAIL_RE + "', '<EMAIL>', 'g'), '"
    + mining.IPV4_RE + "', '<IP>', 'g'), '"
    + mining.PHONE_RE + "', '<PHONE>', 'g')"
)

_TFIDF_K1P1 = repr(mining.BM25_K1 + 1)
_TFIDF_1MB = repr(1 - mining.BM25_B)


# shared PQ oracle prelude: quantize -> codebook (first PQ_KSUB vectors'
# subvectors) -> per (vector, subspace, codebook entry) integer squared L2
# -> argmin code per (vector, subspace).  Mirrors similarity.pq_codes'
# fixed-point math term for term.
_PQ_CTES = f"""WITH q AS (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * {similarity.KM_QUANT}) AS BIGINT)) AS qv
  FROM embeddings
), train AS (
  SELECT vec_id AS cid, qv FROM q WHERE vec_id < {similarity.PQ_KSUB}
), subs AS (
  SELECT CAST(unnest(range(0, {similarity.PQ_M})) AS BIGINT) AS sub
), d AS (
  SELECT q.vec_id, s.sub, t.cid,
    CAST(list_sum(list_transform(range(1, {similarity.PQ_SUB + 1}),
      i -> (q.qv[s.sub * {similarity.PQ_SUB} + i]
            - t.qv[s.sub * {similarity.PQ_SUB} + i])
         * (q.qv[s.sub * {similarity.PQ_SUB} + i]
            - t.qv[s.sub * {similarity.PQ_SUB} + i]))) AS BIGINT) AS dist
  FROM q CROSS JOIN subs s CROSS JOIN train t
), best AS (
  SELECT vec_id, sub, cid, dist,
    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
  FROM d
)"""


def _kmeans_oracle(k: int = similarity.KM_K, iters: int = similarity.KM_ITERS,
                   dims: int = 64, quant: int = similarity.KM_QUANT) -> str:
    """Unrolled Lloyd's iterations as chained CTEs — the same fixed-point
    math as similarity.kmeans_assign, term-by-term in the same left-assoc
    fold order so every double is bit-identical."""
    def dist(cols):
        return " + ".join(
            f"(q.qv[{i + 1}] - c.{cols(i)}) * (q.qv[{i + 1}] - c.{cols(i)})"
            for i in range(dims))

    d_init = dist(lambda i: f"qv[{i + 1}]")
    d_mean = dist(lambda i: f"m{i + 1}")
    means = ", ".join(
        f"sum(qv[{i + 1}]) / count(*) AS m{i + 1}" for i in range(dims))
    parts = [
        f"""WITH q AS (
  SELECT vec_id, list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * {quant}) AS BIGINT)) AS qv
  FROM embeddings
), c0 AS (SELECT vec_id AS cid, qv FROM q WHERE vec_id < {k})"""]
    prev = "c0"
    d_expr = d_init
    for it in range(iters):
        parts.append(f""", a{it} AS (
  SELECT vec_id, qv, cluster FROM (
    SELECT q.vec_id, q.qv, c.cid AS cluster,
      row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY {d_expr}, c.cid) AS rn
    FROM q CROSS JOIN {prev} c) WHERE rn = 1
), c{it + 1} AS (
  SELECT cluster AS cid, {means} FROM a{it} GROUP BY cluster)""")
        prev = f"c{it + 1}"
        d_expr = d_mean
    parts.append(f"""
SELECT vec_id, cluster, CAST(floor(d) AS BIGINT) AS dist_sq_q FROM (
  SELECT q.vec_id, c.cid AS cluster, {d_expr} AS d,
    row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {d_expr}, c.cid) AS rn
  FROM q CROSS JOIN {prev} c) WHERE rn = 1""")
    return "".join(parts)


def _bpe_prefix(n_merges: int = mining.BPE_MERGES) -> str:
    """Unrolled BPE merge rounds as chained CTEs — the same boundary-
    doubled literal-replace merge as mining._bpe_loop, round for round
    (same pattern as _kmeans_oracle's unrolled Lloyd's iterations).
    Ends with v{n} holding every word's post-merge symbolization."""
    sp = "string_split(pair, '|')"
    parts = [f"""WITH v0 AS (
  SELECT word, count(*) AS freq,
    '||' || array_to_string(string_split(word, ''), '||') || '||' AS sym
  FROM (SELECT unnest(list_filter(string_split({_NORM}, ' '),
                                  x -> x <> '')) AS word
        FROM documents)
  GROUP BY word
)"""]
    for r in range(n_merges):
        parts.append(f""", p{r} AS (
  SELECT s[CAST(i AS INT)] || '|' || s[CAST(i AS INT) + 1] AS pair, freq
  FROM (
    SELECT freq, s, unnest(range(1, len(s))) AS i
    FROM (SELECT freq,
            list_filter(string_split(sym, '||'), x -> x <> '') AS s
          FROM v{r}))
), b{r} AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p{r}
  GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 1
), v{r + 1} AS (
  SELECT word, freq, replace(sym,
    '|' || {sp}[1] || '||' || {sp}[2] || '|',
    '|' || {sp}[1] || {sp}[2] || '|') AS sym
  FROM v{r}, b{r})""")
    return "".join(parts)


def _bpe_oracle(n_merges: int = mining.BPE_MERGES) -> str:
    sp = "string_split(pair, '|')"
    selects = [
        f"""SELECT CAST({r + 1} AS INT) AS merge_round, pair,
    {sp}[1] || {sp}[2] AS new_symbol, cnt AS total_count FROM b{r}"""
        for r in range(n_merges)]
    return (_bpe_prefix(n_merges) + "\nSELECT * FROM (\n"
            + "\nUNION ALL ".join(selects) + "\n) ORDER BY merge_round")


def _bpe_encode_oracle(n_merges: int = mining.BPE_MERGES) -> str:
    return _bpe_prefix(n_merges) + f""", enc AS (
  SELECT word,
    len(list_filter(string_split(sym, '||'), x -> x <> '')) AS n_sym
  FROM v{n_merges}
), dw AS (
  SELECT doc_id, lang,
    unnest(list_filter(string_split({_NORM}, ' '), x -> x <> '')) AS word
  FROM documents
)
SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS total_words,
  CAST(sum(length(word)) AS BIGINT) AS total_chars,
  CAST(sum(n_sym) AS BIGINT) AS total_tokens,
  round(sum(n_sym) * 1.0 / count(*), 6) AS fertility,
  round(sum(length(word)) * 1.0 / sum(n_sym), 6) AS chars_per_token
FROM dw JOIN enc USING (word)
GROUP BY 1 ORDER BY 1"""


MINING_QUERIES = [
    _q(
        "bpe_train",
        lambda spark, sf: mining.bpe_train(views(spark, sf)["documents"]),
        _bpe_oracle(),
    ),
    _q(
        "simhash_recall",
        lambda spark, sf: dedup.simhash_recall(views(spark, sf)["documents"]),
        # block-permutation LSH candidates vs the exact Hamming truth
        # set over a fixed-COUNT deterministic md5-ranked doc sample
        # (all-pairs truth is bounded by the sample BY DESIGN, and the
        # bound is corpus-size-independent)
        f"""WITH tok AS (
  SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS w
        FROM documents)
  WHERE w <> ''
), agg AS (
  SELECT doc_id, {_simhash_sums_sql()}
  FROM tok GROUP BY 1
), sig AS (
  SELECT doc_id, {_simhash_combine_sql()} AS simhash FROM agg
), samp AS (
  SELECT doc_id, simhash FROM sig
  ORDER BY CAST(('0x' || substr(md5('{dedup.SIMRECALL_SALT}:'
    || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT), doc_id
  LIMIT {dedup.SIMRECALL_SAMPLE_N}
), truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM samp a JOIN samp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
), blocks AS (
  SELECT doc_id, simhash, blk,
    (simhash >> (blk * 15)) & 32767 AS val
  FROM (SELECT doc_id, simhash, unnest(range(4)) AS blk FROM sig)
), ok AS (
  SELECT blk, val FROM blocks GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND 200
), bf AS (
  SELECT blocks.* FROM blocks JOIN ok USING (blk, val)
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bf a JOIN bf b
    ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
)
SELECT count(*) AS n_truth,
  CAST(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_found,
  (CAST(sum(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    * 1000000) // count(*) AS recall_ppm
FROM truth t LEFT JOIN cands c
  ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b""",
    ),
    _q(
        "bpe_encode_stats",
        lambda spark, sf: mining.bpe_encode_stats(
            views(spark, sf)["documents"]),
        _bpe_encode_oracle(),
    ),
    _q(
        "vocab_coverage",
        lambda spark, sf: mining.vocab_coverage(views(spark, sf)["documents"]),
        f"""WITH norm AS (
  SELECT lang, unnest(list_filter(string_split(
    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' '),
    w -> w <> '')) AS word
  FROM documents
), counts AS (SELECT word, count(*) AS cnt FROM norm GROUP BY 1),
vocab AS (SELECT word FROM counts ORDER BY cnt DESC, word LIMIT 500),
tagged AS (SELECT lang, word IN (SELECT word FROM vocab) AS iv FROM norm)
SELECT lang, CAST(count(*) AS BIGINT) AS total_tokens,
  CAST(sum(CASE WHEN iv THEN 1 ELSE 0 END) AS BIGINT) AS covered_tokens,
  round(sum(CASE WHEN iv THEN 1 ELSE 0 END) / count(*), 6) AS coverage,
  round(1 - sum(CASE WHEN iv THEN 1 ELSE 0 END) / count(*), 6) AS oov_rate
FROM tagged GROUP BY 1 ORDER BY lang""",
    ),
    _q(
        "pii_redaction",
        lambda spark, sf: mining.pii_redaction(views(spark, sf)["documents"]),
        f"""WITH aug AS (
  SELECT doc_id, {_PII_TAIL} AS t FROM documents
), red AS (
  SELECT doc_id, t, {_PII_RED} AS r FROM aug
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{mining.EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '{mining.IPV4_RE}')) AS BIGINT) AS n_ips,
  CAST(len(regexp_extract_all(t, '{mining.PHONE_RE}')) AS BIGINT) AS n_phones,
  md5(r) AS redacted_fp,
  CAST(length(r) AS BIGINT) AS redacted_len
FROM red""",
    ),
    _q(
        "tf_idf_top_terms",
        lambda spark, sf: mining.tf_idf_top_terms(views(spark, sf)["documents"]),
        f"""WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> ''))
    AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), scal AS (
  SELECT count(*) AS n_docs,
    avg(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS avgdl
  FROM documents
), dl AS (
  SELECT *, sum(tf) OVER (PARTITION BY doc_id) AS dl FROM tf
), scored AS (
  SELECT d.doc_id, d.term, d.tf, f.df,
    d.tf * ln(s.n_docs / f.df) AS tfidf,
    ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
      * (d.tf * {_TFIDF_K1P1})
      / (d.tf + {mining.BM25_K1} * ({_TFIDF_1MB}
         + {mining.BM25_B} * d.dl / s.avgdl)) AS bm25
  FROM dl d JOIN dfreq f USING (term) CROSS JOIN scal s
)
SELECT doc_id, term, tf, df, CAST(rank AS BIGINT) AS rank,
  round(tfidf, 6) AS tfidf, round(bm25, 6) AS bm25
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        ORDER BY tfidf DESC, term) AS rank FROM scored)
WHERE rank <= {mining.TOP_TERMS}""",
    ),
    _q(
        "lm_cross_entropy",
        lambda spark, sf: mining.bigram_lm_scores(views(spark, sf)["documents"]),
        """WITH words AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
), big AS (
  SELECT doc_id, w[i] AS prev, w[i + 1] AS cur
  FROM (SELECT doc_id, w,
          unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
        FROM words)
), dbc AS (
  SELECT doc_id, prev, cur, count(*) AS n FROM big GROUP BY 1, 2, 3
), c2 AS (
  SELECT prev, cur, sum(n) AS c2 FROM dbc GROUP BY 1, 2
), c1 AS (
  SELECT prev, sum(c2) AS c1 FROM c2 GROUP BY 1
), v AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(w) AS tok FROM words)
)
SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
  round(-sum(n * log2((c2 + 1.0) / (c1 + v))) / sum(n), 6)
    AS cross_entropy_bits,
  round(power(2.0, -sum(n * log2((c2 + 1.0) / (c1 + v))) / sum(n)), 4)
    AS perplexity
FROM dbc JOIN c2 USING (prev, cur) JOIN c1 USING (prev) CROSS JOIN v
GROUP BY doc_id""",
    ),
    _q(
        "shingle_cardinality_kmv",
        lambda spark, sf: sketch.kmv_shingle_estimate(views(spark, sf)["documents"]),
        f"""WITH words AS (
  SELECT source, list_filter(string_split(text, ' '), w -> w <> '') AS w
  FROM documents
), toks AS (
  SELECT DISTINCT source, w FROM (
    SELECT source, w[i] || ' ' || w[i + 1] AS w
    FROM (SELECT source, w,
            unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
          FROM words))
), h AS (
  SELECT source, w,
    CAST(('0x' || substr(md5(w), 1, 13)) AS BIGINT) AS h
  FROM toks
), r AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, w) AS rn
  FROM h
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS exact_distinct,
    max(CASE WHEN rn = {sketch.KMV_K} THEN h END) AS hk
  FROM r GROUP BY 1
), est AS (
  SELECT source, exact_distinct,
    CASE WHEN exact_distinct < {sketch.KMV_K}
         THEN CAST(exact_distinct AS DOUBLE)
         ELSE {(sketch.KMV_K - 1) * float(1 << 52)} / hk END AS e
  FROM agg
)
SELECT source, exact_distinct, round(e, 4) AS kmv_estimate,
  round(abs(e - exact_distinct) / exact_distinct, 6) AS rel_error
FROM est""",
    ),
    _q(
        "weighted_sample",
        lambda spark, sf: sketch.weighted_sample(views(spark, sf)["documents"]),
        f"""WITH keyed AS (
  SELECT doc_id, n_chars AS weight,
    -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                  || '{sketch.WS_SALT}'), 1, 13))
         AS BIGINT) + 1) / 4.503599627370496e15) / n_chars AS key
  FROM documents
), top AS (
  SELECT * FROM keyed ORDER BY key, doc_id LIMIT {sketch.SAMPLE_K}
)
SELECT doc_id, weight, round(key, 9) AS sample_key,
  CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT) AS rank
FROM top""",
    ),
    _q(
        "bloom_membership",
        lambda spark, sf: sketch.bloom_membership_report(
            views(spark, sf)["documents"]),
        f"""WITH fps AS (
  SELECT doc_id,
    md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp
  FROM documents
), train AS (
  SELECT fp FROM fps WHERE doc_id % 5 <> 0
), probe AS (
  SELECT DISTINCT fp FROM fps
), tpos AS (
  SELECT CAST(('0x' || substr(md5(fp || '{sketch.BLOOM_SALT}-'
                                  || CAST(j AS VARCHAR)), 1, 13))
              AS BIGINT) % {sketch.BLOOM_M} AS pos
  FROM train, range({sketch.BLOOM_K}) t(j)
), words AS (
  SELECT pos // {sketch.WORD_BITS} AS word_idx,
    bit_or(1::BIGINT << CAST(pos % {sketch.WORD_BITS} AS INT)) AS word_bits
  FROM tpos GROUP BY 1
), ppos AS (
  SELECT fp AS item,
    CAST(('0x' || substr(md5(fp || '{sketch.BLOOM_SALT}-'
                             || CAST(j AS VARCHAR)), 1, 13))
         AS BIGINT) % {sketch.BLOOM_M} AS pos
  FROM probe, range({sketch.BLOOM_K}) t(j)
), chk AS (
  SELECT item,
    CASE WHEN coalesce(word_bits, 0)
              & (1::BIGINT << CAST(pos % {sketch.WORD_BITS} AS INT)) <> 0
         THEN 1 ELSE 0 END AS ok
  FROM ppos LEFT JOIN words ON pos // {sketch.WORD_BITS} = word_idx
), hit AS (
  SELECT item, min(ok) = 1 AS maybe FROM chk GROUP BY 1
), actual AS (
  SELECT DISTINCT fp AS item, true AS present FROM train
)
SELECT maybe, coalesce(present, false) AS present,
  CAST(count(*) AS BIGINT) AS n
FROM hit LEFT JOIN actual USING (item)
GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "cms_heavy_hitters",
        lambda spark, sf: sketch.cms_token_counts(views(spark, sf)["documents"]),
        f"""WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
  FROM documents
), rows_ AS (
  SELECT w, j AS r,
    CAST(('0x' || substr(md5(w || '{sketch.CMS_SALT}-'
                            || CAST(j AS VARCHAR)), 1, 13))
         AS BIGINT) % {sketch.CMS_W} AS slot
  FROM toks, range({sketch.CMS_D}) t(j)
), grid AS (
  SELECT r, slot, count(*) AS c FROM rows_ GROUP BY 1, 2
), exact AS (
  SELECT w, count(*) AS exact_count FROM toks GROUP BY 1
), probes AS (
  SELECT e.w, e.exact_count, j AS r,
    CAST(('0x' || substr(md5(e.w || '{sketch.CMS_SALT}-'
                            || CAST(j AS VARCHAR)), 1, 13))
         AS BIGINT) % {sketch.CMS_W} AS slot
  FROM exact e, range({sketch.CMS_D}) t(j)
)
SELECT w AS token, CAST(exact_count AS BIGINT) AS exact_count,
  CAST(min(c) AS BIGINT) AS cms_estimate,
  CAST(min(c) - exact_count AS BIGINT) AS overcount
FROM probes JOIN grid USING (r, slot)
GROUP BY w, exact_count ORDER BY 2 DESC, 1 LIMIT 50""",
    ),
    _q(
        "asof_last_click",
        lambda spark, sf: eops.asof_last_click(views(spark, sf)["events"]),
        """WITH u AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS m
  FROM events WHERE event_type IN ('click', 'purchase')
), f AS (
  SELECT *,
    last_value(CASE WHEN m = 0 THEN ts_ms END IGNORE NULLS) OVER w
      AS click_ms,
    last_value(CASE WHEN m = 0 THEN event_id END IGNORE NULLS) OVER w
      AS click_event_id
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, m, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_event_id, user_id, ts_ms AS purchase_ms,
  click_ms, click_event_id, ts_ms - click_ms AS gap_ms
FROM f WHERE m = 1""",
    ),
    _q(
        "rolling_user_1h",
        lambda spark, sf: eops.rolling_user_1h(views(spark, sf)["events"]),
        """WITH e AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id, event_type, ts_ms,
  count(*) OVER w AS n_1h,
  CAST(sum(cents) OVER w AS BIGINT) AS cents_1h
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)""",
    ),
    _q(
        "events_rollup_daily",
        lambda spark, sf: eops.events_rollup_daily(views(spark, sf)["events"]),
        """WITH e AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT coalesce(event_type, 'ALL') AS event_type,
  coalesce(day, 'ALL') AS day,
  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS total_cents
FROM e GROUP BY ROLLUP(event_type, day)""",
    ),
    _q(
        "props_k_histogram",
        lambda spark, sf: eops.props_k_histogram(views(spark, sf)["events"]),
        """SELECT event_type,
  CAST(floor(CAST(props->>'$.k' AS BIGINT) / 10) AS BIGINT) AS k_bucket,
  count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "kmeans_assign",
        lambda spark, sf: similarity.kmeans_assign(
            views(spark, sf)["embeddings"]),
        _kmeans_oracle(),
    ),
    _q(
        "pq_codes",
        lambda spark, sf: similarity.pq_codes(views(spark, sf)["embeddings"]),
        _PQ_CTES + """
SELECT vec_id, sub, cid AS code, dist AS dist_sq
FROM best WHERE rn = 1 ORDER BY vec_id, sub""",
    ),
    _q(
        "knn_pq",
        lambda spark, sf: similarity.knn_pq(
            views(spark, sf)["embeddings"], [20, 21, 22], k=10),
        # the query->codebook distance rows in `d` ARE the ADC lookup
        # table; a candidate's distance is the sum of its m looked-up
        # entries (all integer math — exact in both engines)
        _PQ_CTES + """
, codes AS (
  SELECT vec_id, sub, cid AS code FROM best WHERE rn = 1
), qd AS (
  SELECT vec_id AS query_id, sub, cid, dist FROM d
  WHERE vec_id IN (20, 21, 22)
), adc AS (
  SELECT qd.query_id, c.vec_id, CAST(sum(qd.dist) AS BIGINT) AS adc_dist
  FROM codes c JOIN qd ON qd.sub = c.sub AND qd.cid = c.code
  GROUP BY 1, 2
)
SELECT query_id, rank, vec_id, adc_dist FROM (
  SELECT query_id, vec_id, adc_dist,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY adc_dist, vec_id) AS rank
  FROM adc WHERE vec_id <> query_id
) WHERE rank <= 10 ORDER BY query_id, rank""",
    ),
    _q(
        "knn_ivf_pq",
        lambda spark, sf: similarity.knn_ivf_pq(
            views(spark, sf)["embeddings"], [20, 21, 22], k=10),
        bench=True,
        # IVF probe (knn_ivf oracle) restricted candidates, ADC-scored
        # over PQ codes (knn_pq oracle) — integer math, exact replay
        oracle=_PQ_CTES + f"""
, codes AS (
  SELECT vec_id, sub, cid AS code FROM best WHERE rn = 1
), cents AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings
  WHERE vec_id < 16
), assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_DOT.format(a='e.embedding', b='c.c')} DESC,
                 c.centroid_id DESC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
), qs AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (20, 21, 22)
), probe AS (
  SELECT query_id, centroid_id FROM (
    SELECT q2.query_id, c.centroid_id,
      row_number() OVER (PARTITION BY q2.query_id
        ORDER BY {_DOT.format(a='q2.qe', b='c.c')} DESC,
                 c.centroid_id ASC) AS rn
    FROM qs q2, cents c
  ) WHERE rn <= 2
), cand AS (
  SELECT p.query_id, a.vec_id
  FROM assigned a JOIN probe p USING (centroid_id)
  WHERE a.vec_id <> p.query_id
), qd AS (
  SELECT vec_id AS query_id, sub, cid, dist FROM d
  WHERE vec_id IN (20, 21, 22)
), adc AS (
  SELECT cd.query_id, cd.vec_id, CAST(sum(qd.dist) AS BIGINT) AS adc_dist
  FROM cand cd
  JOIN codes c ON c.vec_id = cd.vec_id
  JOIN qd ON qd.query_id = cd.query_id AND qd.sub = c.sub
         AND qd.cid = c.code
  GROUP BY 1, 2
)
SELECT query_id, rank, vec_id, adc_dist FROM (
  SELECT query_id, vec_id, adc_dist,
    row_number() OVER (PARTITION BY query_id
                       ORDER BY adc_dist, vec_id) AS rank
  FROM adc
) WHERE rank <= 10 ORDER BY query_id, rank""",
    ),
]
