"""Deduplication — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_text import _NORM  # noqa: F401 — cross-domain helper


def _minhash_sig_sql() -> str:
    """The 32 Carter-Wegman minima as a DuckDB list literal body."""
    return ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % 2147483647))"
        for a, b in dedup.perm_consts())


# shared minhash prelude: normalized 3-word shingles -> 28-bit md5 base
# hashes -> 32 Carter-Wegman minima -> 8 md5 band-buckets.  Used by the
# dedup_minhash_lsh and lsh_bucket_stats oracles.
_MINHASH_BANDS_CTES = f"""WITH words AS (
  SELECT doc_id, string_split({{norm}}, ' ') AS w FROM documents
  WHERE len(string_split({{norm}}, ' ')) >= 3
), hs AS (
  SELECT doc_id, list_transform(
    list_distinct(list_transform(
      range(1, greatest(len(w) - 2, 0) + 1),
      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])),
    s -> CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT)) AS hs
  FROM words
), sig AS (
  SELECT doc_id, [{{sig_body}}] AS sig FROM hs
), bands AS (
  SELECT doc_id, sig, band,
    md5(concat_ws(',', sig[band * 4 + 1], sig[band * 4 + 2],
                  sig[band * 4 + 3], sig[band * 4 + 4])) AS bucket
  FROM (SELECT doc_id, sig, unnest(range(8)) AS band FROM sig)
)"""


def _simhash_sums_sql() -> str:
    return ", ".join(
        f"sum(CASE WHEN ((h >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(dedup.SIM_BITS))


def _simhash_combine_sql() -> str:
    return " + ".join(
        f"(CASE WHEN b{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE CAST(0 AS BIGINT) END)"
        for i in range(dedup.SIM_BITS))


# Shared recursive-CTE pipeline replaying duplicate_clusters in DuckDB
# (exact-fingerprint contraction -> capped-bucket Jaccard pairs between
# distinct contents -> transitive closure -> expanded membership);
# reused by dedup_clusters (full membership) and dedup_cluster_stats
# (size distribution over the same membership).
_CLUSTERS_CTE = f"""WITH RECURSIVE fps AS (
  SELECT doc_id, md5({_NORM}) AS fp FROM documents
), grp AS (
  SELECT fp, min(doc_id) AS rep, count(*) AS sz FROM fps GROUP BY fp
), words AS (
  SELECT g.rep, string_split({_NORM}, ' ') AS w
  FROM documents d JOIN grp g ON g.rep = d.doc_id
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT rep, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT rep, count(*) AS n_sh FROM sh GROUP BY 1
), ok AS (
  SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 200
), shf AS (
  SELECT sh.* FROM sh JOIN ok USING (shingle)
), common AS (
  SELECT a.rep AS doc_a, b.rep AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.rep < b.rep
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.rep = doc_a
  JOIN sizes sb ON sb.rep = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach AS (
  SELECT DISTINCT a AS doc_id, a AS root FROM edges
  UNION
  SELECT e.b AS doc_id, r.root FROM reach r JOIN edges e ON e.a = r.doc_id
), repc AS (
  SELECT doc_id AS rep, min(root) AS cluster_id FROM reach GROUP BY 1
), members AS (
  SELECT f.doc_id,
    coalesce(r.cluster_id, g.rep) AS cluster_id,
    coalesce(r.cluster_id, g.rep) = f.doc_id AS is_keeper
  FROM fps f JOIN grp g USING (fp) LEFT JOIN repc r ON r.rep = g.rep
  WHERE g.sz >= 2 OR r.cluster_id IS NOT NULL
)"""


DEDUP_QUERIES = [
    _q(
        "dedup_exact",
        lambda spark, sf: dedup.exact_duplicates(views(spark, sf)["documents"]),
        f"""SELECT md5({_NORM}) AS fingerprint, count(*) AS n_dups,
  min(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""",
    ),
    _q(
        "dedup_ngram_jaccard",
        lambda spark, sf: dedup.ngram_jaccard_pairs(
            views(spark, sf)["documents"], threshold=0.1),
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
)
SELECT doc_a, doc_b, n_common,
  round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
ORDER BY 1, 2""",
        bench=True,
    ),
    _q(
        "dedup_threshold_sweep",
        lambda spark, sf: dedup.dedup_threshold_sweep(
            views(spark, sf)["documents"], floor=0.05),
        oracle=f"""WITH words AS (
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
  SELECT round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.05
), hist AS (
  SELECT floor(jaccard * 10) / 10 AS jaccard_floor,
    count(*) AS n_pairs
  FROM pairs GROUP BY 1
)
SELECT jaccard_floor, n_pairs,
  CAST(sum(n_pairs) OVER (ORDER BY jaccard_floor DESC) AS BIGINT)
    AS n_pairs_at_or_above
FROM hist ORDER BY jaccard_floor""",
    ),
    _q(
        "paragraph_dedup",
        lambda spark, sf: dedup.paragraph_dedup(
            views(spark, sf)["documents"], para_words=20),
        # first occurrence per paragraph fingerprint = rank-1 over
        # (doc_id, para_idx); survival stats per document
        oracle=f"""WITH w AS (
  SELECT doc_id, string_split_regex(trim({_NORM}), ' +') AS ws
  FROM documents WHERE trim({_NORM}) <> ''
), ix AS (
  SELECT doc_id, ws,
    unnest(range(0, CAST(ceil(len(ws) / 20.0) AS BIGINT))) AS i
  FROM w
), e AS (
  SELECT doc_id, CAST(i AS INT) AS para_idx,
    md5(array_to_string(ws[(i * 20 + 1):(i * 20 + 20)], ' ')) AS fp
  FROM ix
), r AS (
  SELECT doc_id, para_idx,
    (row_number() OVER (PARTITION BY fp ORDER BY doc_id, para_idx) = 1)
    ::INT AS kept
  FROM e
)
SELECT doc_id, count(*) AS n_paras,
  CAST(sum(kept) AS BIGINT) AS n_kept,
  CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped,
  round(sum(kept) / count(*), 6) AS frac_kept
FROM r GROUP BY doc_id ORDER BY doc_id""",
    ),
    _q(
        "dedup_clusters",
        lambda spark, sf: dedup.duplicate_clusters(
            views(spark, sf)["documents"], threshold=0.1),
        bench=True,
        # exact-fingerprint contraction (r5) -> rep-level pairs ->
        # connected components via recursive transitive closure;
        # cluster_id = min doc_id of the expanded component (group reps
        # are group minima, so the component min survives contraction);
        # exact-dup families (sz >= 2) are clusters by definition
        oracle=f"""{_CLUSTERS_CTE}
SELECT doc_id, cluster_id, is_keeper FROM members ORDER BY doc_id""",
    ),
    _q(
        "dedup_minhash_lsh",
        lambda spark, sf: dedup.minhash_lsh_pairs(
            views(spark, sf)["documents"], threshold=0.1),
        # replays the exact md5->28-bit->Carter-Wegman pipeline with the
        # same literal (a, b) constants the Spark plan inlines
        _MINHASH_BANDS_CTES.format(norm=_NORM, sig_body=_minhash_sig_sql())
        + """, ok AS (
  SELECT band, bucket FROM bands GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND 200
), bf AS (
  SELECT bands.* FROM bands JOIN ok USING (band, bucket)
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.sig AS sa, b.sig AS sb
  FROM bf a JOIN bf b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
  round(len(list_filter(list_zip(sa, sb), x -> x[1] = x[2])) / 32.0, 6)
    AS est_jaccard
FROM cands
WHERE len(list_filter(list_zip(sa, sb), x -> x[1] = x[2])) / 32.0 >= 0.1
ORDER BY 1, 2""",
        bench=True,
    ),
    _q(
        "dedup_simhash",
        lambda spark, sf: dedup.simhash_pairs(views(spark, sf)["documents"]),
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
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.simhash AS ha, b.simhash AS hb
  FROM bf a JOIN bf b
    ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cands WHERE bit_count(xor(ha, hb)) <= 8 ORDER BY 1, 2""",
    ),
    _q(
        "dedup_winnowing",
        lambda spark, sf: dedup.winnowing_pairs(views(spark, sf)["documents"]),
        f"""WITH words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
), grams AS (
  SELECT doc_id, pos, w[pos] || ' ' || w[pos + 1] || ' ' || w[pos + 2] AS gram
  FROM (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 2, 0) + 1)) AS pos
        FROM words)
), fps AS (
  SELECT DISTINCT doc_id,
    min(CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT))
      OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
  FROM grams
), ok AS (
  SELECT fp FROM fps GROUP BY 1 HAVING count(*) >= 2 AND count(*) <= 200
), f2 AS (
  SELECT fps.* FROM fps JOIN ok USING (fp)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  count(*) AS shared_fingerprints
FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2""",
    ),
]
