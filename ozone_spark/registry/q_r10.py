"""Round-10 additions — QuerySpecs + DuckDB oracle SQL twins.

The saturated-bucket RECOVERY wiring (VERDICT r9 item 3): round 9
built the measurement (`bucket_cap_report`) and the remedy operator
(`saturated_pair_sample`); this round wires the remedy into the
production near-dup path (`ngram_jaccard_pairs(recover_saturated=k)`)
and prices it (`saturation_recall`).  Gate knobs (cap 5, sample 3)
exercise every stage on the fixtures, where the bucket tail tops out
at 7 (sf0.01) / 25 (sf0.1) docs; at gate scale the capped arm misses
nothing (recall 1000000 ppm on both arms — the fixtures have no
production-cap saturation), so the INTERESTING numbers live in the
perturbed scale artifacts (RECALL_r10.json: 10x corpus, saturating
cap, capped vs capped+recovered vs uncapped truth).
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_text import _NORM  # noqa: F401 — cross-domain helper

# Shared CTE spine: shingles / per-doc sizes / bucket sizes — the same
# derivation as dedup_ngram_jaccard's oracle (raw shingle strings; the
# Spark side buckets on xxhash64/md5-60-bit keys, the documented
# collision-equivalence class).
_SH_SPINE = f"""words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), bs AS (
  SELECT shingle, count(*) AS s FROM sh GROUP BY 1
)"""

# capped pairs at cap 5 + thinned saturated-bucket recovery at
# sample 3 (the dedup_saturated_sample thinning: keep iff 28-bit
# md5(shingle:doc) * bucket_size < sample * 2^28; ok-bucket bound
# 2..4*sample), candidates re-scored with their TRUE n_common from the
# uncapped shingle table, recovered rows replacing capped twins
_RECOVERY_TAIL = """, shf AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN bs USING (shingle)
  WHERE s BETWEEN 2 AND 5
), cappedc AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), capped AS (
  SELECT doc_a, doc_b, n_common,
    round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
  FROM cappedc
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
), kept AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN bs USING (shingle)
  WHERE s > 5
    AND CAST('0x' || substr(md5(sh.shingle || ':'
        || CAST(sh.doc_id AS VARCHAR)), 1, 7) AS BIGINT) * s
        < 3 * (CAST(1 AS BIGINT) << 28)
), okb AS (
  SELECT shingle FROM kept GROUP BY 1 HAVING count(*) BETWEEN 2 AND 12
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN okb ON okb.shingle = a.shingle
), exact AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
), recovered AS (
  SELECT doc_a, doc_b, n_common,
    round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
  FROM exact
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
)"""


R10_QUERIES = [
    _q(
        "dedup_recovered_pairs",
        # gate knobs: cap 5 saturates on the fixtures (bucket tail 7
        # at sf0.01 / 25 at sf0.1); production runs 200/50
        lambda spark, sf: dedup.ngram_jaccard_pairs(
            views(spark, sf)["documents"], threshold=0.1, max_bucket=5,
            recover_saturated=3),
        f"""WITH {_SH_SPINE}{_RECOVERY_TAIL}
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common, jaccard
FROM recovered
UNION ALL
SELECT c.doc_a, c.doc_b, CAST(c.n_common AS BIGINT) AS n_common, c.jaccard
FROM capped c
WHERE NOT EXISTS (SELECT 1 FROM recovered r
                  WHERE r.doc_a = c.doc_a AND r.doc_b = c.doc_b)
ORDER BY 1, 2""",
    ),
    _q(
        "saturation_recall",
        lambda spark, sf: dedup.saturation_recall(
            views(spark, sf)["documents"]),
        # same spine + recovery over the fixed-COUNT md5-ranked slice
        # (the whole corpus at gate scales), plus the UNCAPPED truth
        f"""WITH sampdocs AS (
  SELECT doc_id, text FROM documents
  ORDER BY CAST(('0x' || substr(md5('satrec:'
    || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT), doc_id
  LIMIT {dedup.MINRECALL_SAMPLE_N}
), words AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM sampdocs
  WHERE len(string_split({_NORM}, ' ')) >= 3
), sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(w) - 2, 0) + 1),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
  FROM words
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1
), bs AS (
  SELECT shingle, count(*) AS s FROM sh GROUP BY 1
), truthc AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT doc_a, doc_b FROM truthc
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
), shf AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN bs USING (shingle)
  WHERE s BETWEEN 2 AND 5
), cappedc AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), capped AS (
  SELECT doc_a, doc_b FROM cappedc
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
), kept AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN bs USING (shingle)
  WHERE s > 5
    AND CAST('0x' || substr(md5(sh.shingle || ':'
        || CAST(sh.doc_id AS VARCHAR)), 1, 7) AS BIGINT) * s
        < 3 * (CAST(1 AS BIGINT) << 28)
), okb AS (
  SELECT shingle FROM kept GROUP BY 1 HAVING count(*) BETWEEN 2 AND 12
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN okb ON okb.shingle = a.shingle
), exact AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
), recov AS (
  SELECT doc_a, doc_b FROM exact
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
), rec AS (
  SELECT doc_a, doc_b FROM recov
  UNION
  SELECT doc_a, doc_b FROM capped
), counts AS (
  SELECT
    (SELECT count(*) FROM truth) AS n_truth,
    (SELECT count(*) FROM capped) AS n_capped,
    (SELECT count(*) FROM capped c JOIN truth t
       ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS n_capped_hit,
    (SELECT count(*) FROM rec) AS n_recovered,
    (SELECT count(*) FROM rec c JOIN truth t
       ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS n_recovered_hit
)
SELECT CAST(n_truth AS BIGINT) AS n_truth,
  CAST(n_capped AS BIGINT) AS n_capped,
  CAST(n_capped_hit AS BIGINT) AS n_capped_hit,
  CAST(n_recovered AS BIGINT) AS n_recovered,
  CAST(n_recovered_hit AS BIGINT) AS n_recovered_hit,
  (n_capped_hit * 1000000) // greatest(n_truth, 1) AS capped_recall_ppm,
  (n_recovered_hit * 1000000) // greatest(n_truth, 1)
    AS recovered_recall_ppm
FROM counts""",
    ),
    _q(
        "media_jpeg_features",
        lambda spark, sf: multimodal.jpeg_features(
            multimodal.jpeg_media_table(
                views(spark, sf)["documents"])).orderBy("doc_id"),
        # fourth REAL decode path (VERDICT r9 item 6) — baseline
        # sequential JPEG: every doc becomes a spec-valid marker stream
        # (all-ones DQT, SOF0 4:4:4, canonical DHT, Huffman scan with
        # byte stuffing) parsed back by the pure-numpy+stdlib decoder
        # through real entropy decode + dequant + float IDCT.  The
        # raster is block-CONSTANT — value (doc_id + 3*block + ch) %
        # 256 per 8x8 block — the one family a lossy DCT codec
        # round-trips EXACTLY (DC-only blocks), so channel sums replay
        # in closed form: width 24 (3 block cols), height =
        # ceil(n_chars/72) rounded up to a multiple of 8, min 16
        """WITH d AS (
  SELECT doc_id,
    greatest(((((n_chars + 71) // 72) + 7) // 8) * 8, 16) AS h
  FROM documents
), b AS (
  SELECT doc_id, h, unnest(range(3 * (h // 8))) AS bi FROM d
), s AS (
  SELECT doc_id,
    CAST(64 * sum((doc_id + 3 * bi + 0) % 256) AS BIGINT) AS sum_r,
    CAST(64 * sum((doc_id + 3 * bi + 1) % 256) AS BIGINT) AS sum_g,
    CAST(64 * sum((doc_id + 3 * bi + 2) % 256) AS BIGINT) AS sum_b
  FROM b GROUP BY doc_id
)
SELECT d.doc_id, CAST(24 AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
  CAST(24 * h AS BIGINT) AS n_pixels, sum_r, sum_g, sum_b
FROM d JOIN s USING (doc_id) ORDER BY doc_id""",
    ),
    _q(
        "recovery_sample_sweep",
        # gate knobs: cap 5 (fixture bucket tail 7 at sf0.01 / 25 at
        # sf0.1, so saturation is nonzero at both SFs); the default
        # 6-value sample spine exercises thinning from sub-survivor
        # (sample 1) to effectively-uncapped (sample 12 > tail)
        lambda spark, sf: dedup.recovery_sample_sweep(
            views(spark, sf)["documents"], max_bucket=5),
        # replay: bs (bucket sizes) is already in the spine; sat is its
        # > cap slice; the thinning keep-rule, ok-bucket range and
        # distinct-pair join replay the Spark plan bit-identically on
        # raw shingle strings (the documented hash60 equivalence)
        f"""WITH {_SH_SPINE}, spine(sample) AS (
  VALUES (1), (2), (3), (5), (8), (12)
), sat AS (
  SELECT shingle, s FROM bs WHERE s > 5
), satn AS (
  SELECT count(*) AS n_sat FROM sat
), kept AS (
  SELECT sp.sample, sh.doc_id, sh.shingle
  FROM sh JOIN sat USING (shingle) CROSS JOIN spine sp
  WHERE CAST('0x' || substr(md5(sh.shingle || ':'
        || CAST(sh.doc_id AS VARCHAR)), 1, 7) AS BIGINT) * s
        < sp.sample * (CAST(1 AS BIGINT) << 28)
), okb AS (
  SELECT sample, shingle FROM kept GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND 4 * sample
), pairs AS (
  SELECT DISTINCT a.sample, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a
  JOIN kept b ON a.sample = b.sample AND a.shingle = b.shingle
    AND a.doc_id < b.doc_id
  JOIN okb ON okb.sample = a.sample AND okb.shingle = a.shingle
), aggr AS (
  SELECT sample, count(*) AS n_kept_rows FROM kept GROUP BY 1
), aggo AS (
  SELECT sample, count(*) AS n_ok_buckets FROM okb GROUP BY 1
), aggp AS (
  SELECT sample, count(*) AS n_candidate_pairs FROM pairs GROUP BY 1
), aggd AS (
  SELECT sample, count(DISTINCT d) AS n_candidate_docs FROM (
    SELECT sample, doc_a AS d FROM pairs
    UNION ALL SELECT sample, doc_b FROM pairs) GROUP BY 1
)
SELECT sp.sample,
  CAST(satn.n_sat AS BIGINT) AS n_saturated_buckets,
  CAST(coalesce(aggr.n_kept_rows, 0) AS BIGINT) AS n_kept_rows,
  CAST(coalesce(aggo.n_ok_buckets, 0) AS BIGINT) AS n_ok_buckets,
  CAST(coalesce(aggp.n_candidate_pairs, 0) AS BIGINT)
    AS n_candidate_pairs,
  CAST(coalesce(aggd.n_candidate_docs, 0) AS BIGINT)
    AS n_candidate_docs
FROM spine sp CROSS JOIN satn
LEFT JOIN aggr USING (sample)
LEFT JOIN aggo USING (sample)
LEFT JOIN aggp USING (sample)
LEFT JOIN aggd USING (sample)
ORDER BY sample""",
    ),
    _q(
        "recovery_yield_by_size",
        # gate knobs match dedup_saturated_sample (cap 5, sample 3) so
        # the two gated views of the same thinning are cross-checkable
        lambda spark, sf: dedup.recovery_yield_by_size(
            views(spark, sf)["documents"], max_bucket=5, sample=3),
        # power-of-two bin = smallest i with 2^i >= s (the A1/A2 bin
        # math, exact across engines at boundaries per bins.py)
        f"""WITH {_SH_SPINE}, sat AS (
  SELECT shingle, s FROM bs WHERE s > 5
), binned AS (
  SELECT shingle, s,
    CAST(CASE WHEN s <= 1 THEN 0
      ELSE least(CAST(ceil(log2(CAST(s AS DOUBLE) / 1.0)) AS BIGINT), 40)
      END AS INT) AS size_bin
  FROM sat
), mass AS (
  SELECT size_bin, count(*) AS n_buckets,
    sum((s * (s - 1)) // 2) AS pair_mass_dropped
  FROM binned GROUP BY 1
), kept AS (
  SELECT b.size_bin, sh.doc_id, sh.shingle
  FROM sh JOIN binned b USING (shingle)
  WHERE CAST('0x' || substr(md5(sh.shingle || ':'
        || CAST(sh.doc_id AS VARCHAR)), 1, 7) AS BIGINT) * s
        < 3 * (CAST(1 AS BIGINT) << 28)
), okb AS (
  SELECT size_bin, shingle FROM kept GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND 12
), pairs AS (
  SELECT DISTINCT a.size_bin, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a
  JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN okb ON okb.shingle = a.shingle
), aggr AS (
  SELECT size_bin, count(*) AS n_kept_rows FROM kept GROUP BY 1
), aggo AS (
  SELECT size_bin, count(*) AS n_ok_buckets FROM okb GROUP BY 1
), aggp AS (
  SELECT size_bin, count(*) AS n_candidate_pairs FROM pairs GROUP BY 1
)
SELECT mass.size_bin,
  CAST(pow(2, mass.size_bin) AS BIGINT) AS bin_max_size,
  CAST(mass.n_buckets AS BIGINT) AS n_buckets,
  CAST(mass.pair_mass_dropped AS BIGINT) AS pair_mass_dropped,
  CAST(coalesce(aggr.n_kept_rows, 0) AS BIGINT) AS n_kept_rows,
  CAST(coalesce(aggo.n_ok_buckets, 0) AS BIGINT) AS n_ok_buckets,
  CAST(coalesce(aggp.n_candidate_pairs, 0) AS BIGINT)
    AS n_candidate_pairs
FROM mass
LEFT JOIN aggr USING (size_bin)
LEFT JOIN aggo USING (size_bin)
LEFT JOIN aggp USING (size_bin)
ORDER BY size_bin""",
    ),
]
