"""Training-data pipeline — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_text import _SW  # noqa: F401 — cross-domain helper
from .q_text import _NORM  # noqa: F401 — cross-domain helper
from .q_text import _SH5  # noqa: F401 — cross-domain helper

# the portable Bernoulli sample key (functions/pipeline.py sample_key)
_SKEY = ("CAST('0x' || substr(md5('mix-v1:' || CAST(doc_id AS VARCHAR)), "
         "1, 7) AS BIGINT) % 10000")
_RATE = ("CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.4 "
         "ELSE 1.0 END AS DOUBLE)")
# n-word span concat for the duplicated_spans oracle: w[i] || ' ' || ...
_SPAN_CAT = " || ' ' || ".join(
    f"w[i + {k}]" if k else "w[i]" for k in range(8))

PIPELINE_QUERIES = [
    _q(
        "decontaminate_overlap",
        lambda spark, sf: pipeline.decontaminate(
            views(spark, sf)["documents"].where("doc_id % 25 <> 0"),
            views(spark, sf)["documents"].where("doc_id % 25 = 0")),
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
)
SELECT doc_id, CAST(n_sh AS BIGINT) AS n_shingles,
  CAST(n_hit AS BIGINT) AS n_overlapping,
  round(n_hit / n_sh, 6) AS overlap_fraction,
  n_hit / n_sh >= {pipeline.DECONTAM_MIN_OVERLAP} AS contaminated
FROM agg ORDER BY doc_id""",
    ),
    _q(
        "repetition_metrics",
        lambda spark, sf: pipeline.repetition_metrics(
            views(spark, sf)["documents"]),
        f"""WITH m AS (
  SELECT doc_id, source, len(ws) AS n_words,
    len(ws) - len(list_distinct(ws)) AS n_dup,
    list_max(list_transform(list_distinct(ws),
      v -> len(list_filter(ws, x -> x = v)))) AS top_w,
    list_max(list_transform(list_distinct(bg),
      v -> len(list_filter(bg, x -> x = v)))) AS top_bg
  FROM (
    SELECT doc_id, source, ws,
      list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]) AS bg
    FROM (SELECT doc_id, source, string_split({_NORM}, ' ') AS ws
          FROM documents)
    WHERE len(ws) >= 2)
)
SELECT doc_id, source, CAST(n_words AS BIGINT) AS n_words,
  round(n_dup / n_words, 6) AS dup_word_fraction,
  round(top_w / n_words, 6) AS top_word_fraction,
  round(top_bg / greatest(n_words - 1, 1), 6) AS top_bigram_fraction,
  n_dup / n_words <= {pipeline.REP_MAX_DUP_WORD_FRACTION} AS ok_dup_words,
  top_w / n_words <= {pipeline.REP_MAX_TOP_WORD_FRACTION} AS ok_top_word,
  top_bg / greatest(n_words - 1, 1)
    <= {pipeline.REP_MAX_TOP_BIGRAM_FRACTION} AS ok_top_bigram,
  n_dup / n_words <= {pipeline.REP_MAX_DUP_WORD_FRACTION}
    AND top_w / n_words <= {pipeline.REP_MAX_TOP_WORD_FRACTION}
    AND top_bg / greatest(n_words - 1, 1)
      <= {pipeline.REP_MAX_TOP_BIGRAM_FRACTION} AS passes_repetition
FROM m ORDER BY doc_id""",
    ),
    _q(
        "stratified_sample",
        lambda spark, sf: pipeline.stratified_sample(
            views(spark, sf)["documents"]),
        f"""SELECT doc_id, lang, source, sample_key FROM (
  SELECT doc_id, lang, source, {_SKEY} AS sample_key,
    CAST({_RATE} * 10000 AS INT) AS cut
  FROM documents
) WHERE sample_key < cut ORDER BY doc_id""",
    ),
    _q(
        "stratified_sample_summary",
        lambda spark, sf: pipeline.stratified_sample_summary(
            views(spark, sf)["documents"]),
        f"""WITH k AS (
  SELECT lang AS stratum, {_RATE} AS target_rate,
    CASE WHEN {_SKEY} < CAST({_RATE} * 10000 AS INT)
      THEN 1 ELSE 0 END AS kept,
    len(string_split(text, ' ')) AS n_tok
  FROM documents
)
SELECT stratum, any_value(target_rate) AS target_rate,
  count(*) AS n_docs, CAST(sum(kept) AS BIGINT) AS n_kept,
  CAST(sum(kept * n_tok) AS BIGINT) AS kept_tokens,
  round(sum(kept) / count(*), 6) AS realized_rate
FROM k GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "pack_sequences",
        lambda spark, sf: pipeline.pack_sequences(
            views(spark, sf)["documents"]),
        f"""WITH b AS (
  SELECT source AS shard, doc_id, n_tok,
    (sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       ROWS UNBOUNDED PRECEDING) - n_tok) // {pipeline.PACK_BUDGET} AS bin
  FROM (SELECT source, doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents)
)
SELECT shard, CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
  round(sum(n_tok) / {pipeline.PACK_BUDGET}, 6) AS fill_ratio
FROM b GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "dedup_keep_best",
        lambda spark, sf: pipeline.resolve_keep_best(
            views(spark, sf)["documents"], threshold=0.1),
        # dedup_clusters' recursive transitive closure + quality-argmax
        # keeper selection (highest quality_score, ties to lowest doc_id);
        # singletons are their own cluster
        f"""WITH RECURSIVE words AS (
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
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach AS (
  SELECT DISTINCT a AS doc_id, a AS root FROM edges
  UNION
  SELECT e.b AS doc_id, r.root FROM reach r JOIN edges e ON e.a = r.doc_id
), cc AS (
  SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY doc_id
), lab AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
    round(least(len(string_split(d.text, ' ')) / 64.0, 1.0) * 0.5
      + least(len(list_filter(string_split(d.text, ' '), w -> w IN {_SW}))
              / len(string_split(d.text, ' ')) * 5.0, 1.0) * 0.5, 6)
      AS quality_score
  FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
)
SELECT doc_id, cluster_id, quality_score,
  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
  row_number() OVER (PARTITION BY cluster_id
                     ORDER BY quality_score DESC, doc_id) = 1 AS is_keeper
FROM lab ORDER BY doc_id""",
    ),
    _q(
        "domain_mixture",
        lambda spark, sf: pipeline.domain_mixture(
            views(spark, sf)["documents"]),
        """WITH agg AS (
  SELECT source AS domain, count(*) AS n_docs,
    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
)
SELECT domain, n_docs, n_tokens,
  round(n_tokens / sum(n_tokens) OVER (), 6) AS token_share,
  round(1.0 / count(*) OVER (), 6) AS target_share,
  round(least(1.0, (1.0 / count(*) OVER ())
        / (n_tokens / sum(n_tokens) OVER ())), 6) AS mix_weight,
  CAST(floor(least(1.0, (1.0 / count(*) OVER ())
        / (n_tokens / sum(n_tokens) OVER ())) * n_tokens) AS BIGINT)
    AS effective_tokens
FROM agg ORDER BY domain""",
    ),
    _q(
        "duplicated_spans",
        lambda spark, sf: pipeline.duplicated_spans(
            views(spark, sf)["documents"]),
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= {pipeline.DUP_SPAN_NGRAM}
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - {pipeline.DUP_SPAN_NGRAM - 1}, 0) + 1),
    i -> {_SPAN_CAT})))
    AS shingle
  FROM words
), h AS (
  SELECT doc_id,
    CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS h FROM sh
), dfc AS (
  SELECT h, count(*) AS span_df FROM h GROUP BY 1
), per AS (
  SELECT doc_id, count(*) AS n_spans,
    CAST(sum(CASE WHEN span_df >= {pipeline.DUP_SPAN_MIN_DOCS}
             THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
  FROM h JOIN dfc USING (h) GROUP BY 1
)
SELECT doc_id, n_spans, n_dup_spans,
  round(n_dup_spans / n_spans, 6) AS dup_fraction,
  n_dup_spans / n_spans >= 0.5 AS mostly_duplicated
FROM per ORDER BY doc_id""",
    ),
    _q(
        "training_shards",
        lambda spark, sf: pipeline.training_shards(
            views(spark, sf)["documents"]),
        f"""WITH k AS (
  SELECT doc_id,
    CAST('0x' || substr(md5('{pipeline.SPLIT_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) % 10000 AS split_key,
    CAST('0x' || substr(md5('{pipeline.SHARD_SALT}:'
      || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT) AS skey,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), a AS (
  SELECT doc_id,
    CASE WHEN split_key < {pipeline.SPLIT_CUTS[0][1]} THEN 'train'
         WHEN split_key < {pipeline.SPLIT_CUTS[1][1]} THEN 'val'
         ELSE 'test' END AS split,
    skey % {pipeline.N_SHARDS} AS shard, n_tok, skey
  FROM k
)
SELECT doc_id, split, shard, n_tok,
  CAST(row_number() OVER (PARTITION BY split, shard
                          ORDER BY skey, doc_id) AS INT) AS position
FROM a ORDER BY doc_id""",
    ),
    _q(
        "cross_corpus_dedup",
        lambda spark, sf: pipeline.cross_corpus_dedup(
            views(spark, sf)["documents"], threshold=0.1),
        bench=True,
        oracle=f"""WITH doc0 AS (
  SELECT doc_id, source, text,
    regexp_matches(source, '^src[0-9]$') AS is_ex
  FROM documents
), fps AS (
  SELECT doc_id, is_ex, md5({_NORM}) AS fp FROM doc0
), exact AS (
  SELECT doc_id FROM fps n
  WHERE NOT n.is_ex AND n.fp IN (SELECT fp FROM fps WHERE is_ex)
), words AS (
  SELECT doc_id, is_ex, string_split({_NORM}, ' ') AS w FROM doc0
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, is_ex, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), cold AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), common AS (
  SELECT a.doc_id AS new_id, b.doc_id AS ex_id, count(*) AS n_common
  FROM (SELECT s.* FROM sh s JOIN cold USING (shingle) WHERE NOT s.is_ex) a
  JOIN (SELECT * FROM sh WHERE is_ex) b ON a.shingle = b.shingle
  GROUP BY 1, 2
), best AS (
  SELECT doc_id, round(max(j), 6) AS best_jaccard FROM (
    SELECT new_id AS doc_id,
      n_common / (sn.n_sh + se.n_sh - n_common) AS j
    FROM common
    JOIN sizes sn ON sn.doc_id = new_id
    JOIN sizes se ON se.doc_id = ex_id
  ) WHERE j >= 0.1 GROUP BY 1
)
SELECT d.doc_id, d.source,
  coalesce(e.hit, FALSE) AS exact_dup, b.best_jaccard,
  CASE WHEN coalesce(e.hit, FALSE) THEN 'exact_dup'
       WHEN b.best_jaccard IS NOT NULL THEN 'near_dup'
       ELSE 'unique' END AS verdict
FROM doc0 d
LEFT JOIN (SELECT doc_id, TRUE AS hit FROM exact) e USING (doc_id)
LEFT JOIN best b USING (doc_id)
WHERE NOT d.is_ex
ORDER BY d.doc_id""",
    ),
]
