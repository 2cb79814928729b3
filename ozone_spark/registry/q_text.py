"""Text analysis — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace


# ---------------------------------------------------------------------------
# text analysis / dedup / similarity / multimodal (north star)
# ---------------------------------------------------------------------------

_NORM = "regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')"
_SW = "('the', 'a', 'of', 'and', 'to', 'in')"

TEXT_QUERIES = [
    _q(
        "text_stats",
        lambda spark, sf: text.text_stats(views(spark, sf)["documents"]),
        """SELECT lang, source, count(*) AS n_docs,
  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
  CAST(sum(length(text)) AS BIGINT) AS total_chars,
  round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "text_quality",
        lambda spark, sf: text.quality_features(views(spark, sf)["documents"]),
        f"""SELECT doc_id, lang, source,
  CAST(length(text) AS BIGINT) AS n_chars_measured,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  round((length(text) - len(string_split(text, ' ')) + 1)
        / len(string_split(text, ' ')), 6) AS mean_word_len,
  round(len(list_filter(string_split(text, ' '), w -> w IN {_SW}))
        / len(string_split(text, ' ')), 6) AS stopword_ratio,
  round(least(len(string_split(text, ' ')) / 64.0, 1.0) * 0.5
        + least(len(list_filter(string_split(text, ' '), w -> w IN {_SW}))
                / len(string_split(text, ' ')) * 5.0, 1.0) * 0.5, 6)
    AS quality_score
FROM documents""",
    ),
    _q(
        "language_id",
        lambda spark, sf: text.language_id(views(spark, sf)["documents"]),
        """WITH s AS (
  SELECT lang,
    len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a', 'and'))) AS hits_en,
    len(list_filter(string_split(text, ' '), w -> w IN ('der', 'und', 'die'))) AS hits_de,
    len(list_filter(string_split(text, ' '), w -> w IN ('el', 'la', 'los'))) AS hits_es,
    len(list_filter(string_split(text, ' '), w -> w IN ('le', 'et', 'les'))) AS hits_fr
  FROM documents
)
SELECT lang, predicted, count(*) AS n FROM (
  SELECT lang, CASE
    WHEN greatest(hits_en, hits_de, hits_es, hits_fr) = 0 THEN 'und'
    WHEN hits_en = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'en'
    WHEN hits_de = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'de'
    WHEN hits_es = greatest(hits_en, hits_de, hits_es, hits_fr) THEN 'es'
    ELSE 'fr' END AS predicted
  FROM s
) GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "token_counts",
        lambda spark, sf: text.token_counts(views(spark, sf)["documents"]),
        f"""SELECT doc_id, lang,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '{text.BPE_ISH_PATTERN}')) AS BIGINT)
    AS bpe_ish_tokens,
  round(len(regexp_extract_all(text, '{text.BPE_ISH_PATTERN}'))
        / greatest(len(string_split(text, ' ')), 1), 6) AS fertility
FROM documents""",
    ),
    _q(
        "curation_pipeline",
        lambda spark, sf: text.curation_pipeline(views(spark, sf)["documents"]),
        f"""WITH gated AS (
  SELECT doc_id, lang, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    len(string_split(text, ' ')) >= 16
      AND len(list_filter(string_split(text, ' '), w -> w IN {_SW}))
          / len(string_split(text, ' ')) >= 0.02 AS pq,
    md5({_NORM}) AS fp
  FROM documents
), k AS (
  SELECT *, min(CASE WHEN pq THEN doc_id END) OVER (PARTITION BY fp) AS keeper
  FROM gated
)
SELECT lang, source, count(*) AS n_docs,
  CAST(sum(CASE WHEN pq AND doc_id = keeper THEN 1 ELSE 0 END) AS BIGINT)
    AS n_kept,
  CAST(sum(CASE WHEN pq AND doc_id = keeper THEN n_tokens ELSE 0 END) AS BIGINT)
    AS kept_tokens
FROM k GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    _q(
        "fingerprint_summary",
        lambda spark, sf: text.fingerprint_summary(views(spark, sf)["documents"]),
        f"""SELECT source, count(*) AS n_docs,
  CAST(count(DISTINCT md5({_NORM})) AS BIGINT) AS n_unique
FROM documents GROUP BY 1 ORDER BY 1""",
    ),
    _q(
        "document_chunks",
        lambda spark, sf: text.document_chunks(views(spark, sf)["documents"]),
        """WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
    len(string_split(text, ' ')) AS n_tok
  FROM documents
), s AS (
  SELECT doc_id, words, n_tok,
    unnest(generate_series(0, greatest(n_tok - 9, 0), 24)) AS start
  FROM w WHERE n_tok > 0
)
SELECT doc_id,
  CAST(start // 24 AS BIGINT) AS chunk_id,
  CAST(least(n_tok - start, 32) AS BIGINT) AS n_tokens,
  md5(array_to_string(list_slice(words, start + 1, start + 32), ' '))
    AS chunk_md5
FROM s""",
    ),
    _q(
        "gopher_quality",
        lambda spark, sf: text.gopher_quality_filters(
            views(spark, sf)["documents"]),
        f"""WITH m AS (
  SELECT doc_id, source,
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
)
SELECT doc_id, source,
  CAST(n_words AS BIGINT) AS n_words,
  round(mean_wl, 6) AS mean_word_len,
  round(sym_ratio, 6) AS symbol_ratio,
  CAST(n_sw AS BIGINT) AS n_distinct_stopwords,
  round(alpha_ratio, 6) AS alpha_word_ratio,
  n_words >= {text.GOPHER_MIN_WORDS}
    AND n_words <= {text.GOPHER_MAX_WORDS} AS ok_word_count,
  mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
    AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN} AS ok_mean_word_len,
  sym_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO} AS ok_symbol_ratio,
  n_sw >= {text.GOPHER_MIN_DISTINCT_STOPWORDS} AS ok_stopwords,
  alpha_ratio >= {text.GOPHER_MIN_ALPHA_WORD_RATIO} AS ok_alpha_words,
  (n_words >= {text.GOPHER_MIN_WORDS}
    AND n_words <= {text.GOPHER_MAX_WORDS})
    AND (mean_wl >= {text.GOPHER_MIN_MEAN_WORD_LEN}
      AND mean_wl <= {text.GOPHER_MAX_MEAN_WORD_LEN})
    AND sym_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO}
    AND n_sw >= {text.GOPHER_MIN_DISTINCT_STOPWORDS}
    AND alpha_ratio >= {text.GOPHER_MIN_ALPHA_WORD_RATIO} AS passes_gopher
FROM m""",
    ),
]

# 5-word shingle list over the normalized text, as a DuckDB expression
_SH5 = ("list_distinct(list_transform(range(1, greatest(len(w) - 4, 0) + 1), "
        "i -> array_to_string(list_slice(w, i, i + 4), ' ')))")
