"""Similarity search / ANN — QuerySpecs + DuckDB oracle SQL twins (split out of the
single-module registry in round 8; see ozone_spark/registry/__init__.py).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace


_DOT = ("list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))")


# The gate fixture's embeddings corpus holds 500 vectors at BOTH gate
# scales (sf0.001 and sf0.01 ship the same embeddings table), so the
# corpus-sized index constants the auto-sizing laws produce are known
# at oracle-construction time.  The asserts keep the static oracle SQL
# honest: if the laws or the fixture drift, import fails loudly instead
# of the gate silently comparing mismatched index geometries.
_GATE_EMB_N = 500
assert similarity.suggest_n_centroids(_GATE_EMB_N) == similarity.N_CENTROIDS
assert (similarity.suggest_band_bits(_GATE_EMB_N)
        == similarity.NEAR_DUP_BAND_BITS)

# The sf0.1 embeddings corpus ships 2000 vectors; _lsh_sig_adaptive_sql
# enumerates exactly the two shipped sizes, so the big branch's plane
# width is tied to THIS constant (ADVICE r5: a drifted sf0.1 fixture
# must fail loudly, not silently compare mismatched geometries —
# tools/gate_check.py cross-checks the actual fixture count at startup).
_SF01_EMB_N = 2000
assert similarity.suggest_n_planes(_SF01_EMB_N) == 9, \
    "sig_big plane width drifted from the suggest_n_planes law"


def _lsh_sig_sql(vec: str, n_planes: int | None = None) -> str:
    """DuckDB expression for the hyperplane signature, inlining the same
    literal ±1 coefficient arrays the Spark plan embeds."""
    terms = []
    for p, row in enumerate(similarity.plane_coeffs(
            n_planes if n_planes is not None else similarity.N_PLANES)):
        lits = "[" + ", ".join(str(c) for c in row) + "]"
        terms.append(
            f"(CASE WHEN {_DOT.format(a=vec, b=lits)} >= 0"
            f" THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


def _lsh_sig_adaptive_sql(vec: str) -> str:
    """Signature expression following the suggest_n_planes law across
    BOTH shipped embedding corpora (500 vectors at the gate scales ->
    7 planes; 2000 at sf0.1 -> 9): static SQL cannot vary its
    expression SHAPE with the data, so the two law outcomes are
    enumerated in a CASE on the corpus count — the same two sizes the
    import-time asserts pin."""
    sig_small = _lsh_sig_sql(vec, similarity.suggest_n_planes(_GATE_EMB_N))
    sig_big = _lsh_sig_sql(vec, similarity.suggest_n_planes(_SF01_EMB_N))
    return (f"CASE WHEN (SELECT count(*) FROM embeddings) <= {_GATE_EMB_N}"
            f" THEN ({sig_small}) ELSE ({sig_big}) END")


def _band_sig_sql(vec: str, planes: list[list[float]]) -> str:
    """DuckDB expression for one band signature over an explicit plane
    slice (mirrors similarity._sig_from_planes bit weights)."""
    terms = []
    for p, row in enumerate(planes):
        lits = "[" + ", ".join(str(c) for c in row) + "]"
        terms.append(
            f"(CASE WHEN {_DOT.format(a=vec, b=lits)} >= 0"
            f" THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


def _band_array_sql(vec: str) -> str:
    """DuckDB list of the NEAR_DUP_BANDS band signatures (same literal
    hyperplanes as similarity.band_signatures)."""
    nb, bb = similarity.NEAR_DUP_BANDS, similarity.NEAR_DUP_BAND_BITS
    planes = similarity.plane_coeffs(n_planes=nb * bb)
    bands = [_band_sig_sql(vec, planes[b * bb:(b + 1) * bb])
             for b in range(nb)]
    return "[" + ", ".join(bands) + "]"


SIMILARITY_QUERIES = [
    _q(
        "knn_bruteforce",
        lambda spark, sf: similarity.knn_bruteforce(
            views(spark, sf)["embeddings"], [0, 1, 2], k=10),
        f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (0, 1, 2)
), scored AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6) AS cos_sim
  FROM embeddings, q WHERE vec_id <> query_id
)
SELECT query_id, rank, vec_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cos_sim DESC, vec_id) AS rank FROM scored
) WHERE rank <= 10 ORDER BY query_id, rank""",
        bench=True,
    ),
    _q(
        "knn_lsh",
        # n_planes defaults to None -> suggest_n_planes(corpus count):
        # the gate exercises the auto-sizing path end-to-end
        lambda spark, sf: similarity.knn_lsh(
            views(spark, sf)["embeddings"], [0, 1, 2], k=10),
        # same literal hyperplanes as the Spark plan (plane_coeffs at
        # the law-suggested width for the gate corpus), so the
        # signature/bucket math is replayed exactly in DuckDB
        f"""WITH sig AS (
  SELECT vec_id, embedding,
    ({_lsh_sig_adaptive_sql('embedding')})
    AS sig
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS qe, sig AS qsig FROM sig
  WHERE vec_id IN (0, 1, 2)
), cand AS (
  SELECT query_id, vec_id,
    round({_DOT.format(a='qe', b='embedding')}
      / (sqrt({_DOT.format(a='qe', b='qe')})
         * sqrt({_DOT.format(a='embedding', b='embedding')})), 6) AS cos_sim
  FROM sig, q
  WHERE bit_count(xor(sig, qsig)) <= 2 AND vec_id <> query_id
)
SELECT query_id, rank, vec_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cos_sim DESC, vec_id) AS rank FROM cand
) WHERE rank <= 10 ORDER BY query_id, rank""",
    ),
    _q(
        "knn_ivf",
        # n_centroids defaults to None -> suggest_n_centroids(corpus
        # count), pinned to N_CENTROIDS=16 for the gate corpus by the
        # import-time assert — the gate exercises the auto-sizing path
        lambda spark, sf: similarity.knn_ivf(
            views(spark, sf)["embeddings"], [20, 21, 22], k=10),
        # assignment tie-break mirrors array_max over struct(dot, id):
        # higher dot wins, ties -> higher centroid_id (DESC)
        f"""WITH ncent AS (
  -- suggest_n_centroids in SQL: ~sqrt(n) rounded HALF-EVEN to a
  -- power of two, clamped to [4, 65536].  Explicit banker's rounding
  -- (not DuckDB round(), which is half-away) so n = 2^odd corpora
  -- (512, 2048, ...) agree with python round() (ADVICE r7)
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
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id
        ORDER BY {_DOT.format(a='e.embedding', b='c.c')} DESC,
                 c.centroid_id DESC) AS rn
    FROM embeddings e, cents c
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  WHERE vec_id IN (20, 21, 22)
), probe AS (
  SELECT query_id, qe, centroid_id FROM (
    SELECT q.query_id, q.qe, c.centroid_id,
      row_number() OVER (PARTITION BY q.query_id
        ORDER BY {_DOT.format(a='q.qe', b='c.c')} DESC,
                 c.centroid_id ASC) AS rn
    FROM q, cents c
  ) WHERE rn <= 2
), cand AS (
  SELECT p.query_id, a.vec_id,
    round({_DOT.format(a='p.qe', b='a.embedding')}
      / (sqrt({_DOT.format(a='p.qe', b='p.qe')})
         * sqrt({_DOT.format(a='a.embedding', b='a.embedding')})), 6) AS cos_sim
  FROM assigned a JOIN probe p ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, rank, vec_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY cos_sim DESC, vec_id) AS rank FROM cand
) WHERE rank <= 10 ORDER BY query_id, rank""",
    ),
    _q(
        "embedding_near_dup",
        lambda spark, sf: similarity.embedding_near_dup_pairs(
            views(spark, sf)["embeddings"], threshold=0.4),
        # banded-LSH candidates: the OR over band-signature equalities is
        # the oracle twin of the Spark (band, sig) equi-join; a join row
        # appears once per pair regardless of how many bands match, so no
        # DISTINCT is needed
        f"""WITH sigs AS (
  SELECT vec_id, embedding, {_band_array_sql('embedding')} AS bands
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  round({_DOT.format(a='a.embedding', b='b.embedding')}
    / (sqrt({_DOT.format(a='a.embedding', b='a.embedding')})
       * sqrt({_DOT.format(a='b.embedding', b='b.embedding')})), 6) AS cos_sim
FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
 AND ({' OR '.join(f'a.bands[{i + 1}] = b.bands[{i + 1}]'
                   for i in range(similarity.NEAR_DUP_BANDS))})
WHERE round({_DOT.format(a='a.embedding', b='b.embedding')}
    / (sqrt({_DOT.format(a='a.embedding', b='a.embedding')})
       * sqrt({_DOT.format(a='b.embedding', b='b.embedding')})), 6) >= 0.4
ORDER BY 1, 2""",
    ),
    _q(
        "semantic_dedup",
        # band_bits defaults to None -> suggest_band_bits(corpus count),
        # which the import-time assert pins to NEAR_DUP_BAND_BITS for
        # the gate corpus — the gate exercises the auto-sizing path
        lambda spark, sf: similarity.semantic_dedup(
            views(spark, sf)["embeddings"], threshold=0.4),
        # cluster assignment == knn_ivf's argmax (ties -> higher
        # centroid id, matching array_max over (dot, centroid_id));
        # candidates need cluster AND >=1 shared band; dup = any
        # lower-id similar neighbor in-cluster
        f"""WITH sigs AS (
  SELECT vec_id, embedding, {_band_array_sql('embedding')} AS bands
  FROM embeddings
), cents AS (
  SELECT vec_id AS centroid_id, embedding AS c FROM embeddings
  WHERE vec_id < 16
), assigned AS (
  SELECT vec_id, embedding, bands, centroid_id AS cluster FROM (
    SELECT s.vec_id, s.embedding, s.bands, c.centroid_id,
      row_number() OVER (PARTITION BY s.vec_id
        ORDER BY {_DOT.format(a='s.embedding', b='c.c')} DESC,
                 c.centroid_id DESC) AS rn
    FROM sigs s, cents c
  ) WHERE rn = 1
), dups AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b ON a.cluster = b.cluster
   AND a.vec_id < b.vec_id
   AND ({' OR '.join(f'a.bands[{i + 1}] = b.bands[{i + 1}]'
                     for i in range(similarity.NEAR_DUP_BANDS))})
  WHERE round({_DOT.format(a='a.embedding', b='b.embedding')}
      / (sqrt({_DOT.format(a='a.embedding', b='a.embedding')})
         * sqrt({_DOT.format(a='b.embedding', b='b.embedding')})), 6)
      >= 0.4
)
SELECT vec_id, cluster,
  vec_id NOT IN (SELECT vec_id FROM dups) AS is_kept
FROM assigned ORDER BY vec_id""",
        bench=True,
    ),
    _q(
        "embedding_norms",
        lambda spark, sf: similarity.embedding_norms(
            views(spark, sf)["embeddings"]),
        f"""SELECT label, count(*) AS n, round(avg(norm), 6) AS avg_norm
FROM (SELECT label,
        round(sqrt({_DOT.format(a='embedding', b='embedding')}), 6) AS norm
      FROM embeddings)
GROUP BY 1 ORDER BY 1""",
    ),
]
