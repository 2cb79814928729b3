"""Round-11 additions — QuerySpecs + DuckDB oracle SQL twins.

Closing the recovery-knob loop (VERDICT r10 items 2 and 4): round 10
priced the `recover_saturated` knob (`recovery_sample_sweep`); this
round makes the price load-bearing — `recovery_autosize_curve` is the
declarative argmax an operator (and the scale probes, via
`autosize_recover_saturated`) reads to choose the knob under a
candidate-pair budget, and `ingest_dedup_recovered` threads the same
saturated-bucket recovery through the incremental-ingest probe path,
whose capped resident index otherwise suppresses exactly the
duplicates ingest exists to catch on a copy-heavy corpus.

Gate knobs mirror q_r10's recovery family (cap 5 against the fixture
bucket tail of 7 at sf0.01 / 25 at sf0.1) so saturation is nonzero at
both gate SFs.
"""

from __future__ import annotations

from ._base import *  # noqa: F401,F403 — shared registry namespace
from .q_r10 import _SH_SPINE  # noqa: F401 — shared shingle spine
from .q_text import _NORM  # noqa: F401 — cross-domain helper

# Budget spine for the autosize curve: spans the measured bills at
# every gate SF (sf0.01 bills 16..433; sf0.1 bills 10.9k..977k at cap
# 5), so different budgets choose different samples at both scales —
# including 0 (recovery off) and the everything-fits top end.
_AUTOSIZE_BUDGETS = (0, 50, 120, 400, 50_000, 700_000, 2_000_000)

# Shared per-sample candidate-bill CTE block (cap 5, the default
# 6-value sample spine): the sweep's thinning / ok-bucket / distinct-
# pair derivation reduced to (sample, n_candidate_pairs) — consumed by
# the autosize curve and by the self-tuned pair query's chosen-sample
# scalar.  Expects the q_r10 _SH_SPINE CTEs (sh, bs) upstream.
_BILL_CTES = """spine(sample) AS (
  VALUES (1), (2), (3), (5), (8), (12)
), sat AS (
  SELECT shingle, s FROM bs WHERE s > 5
), skept AS (
  SELECT sp.sample, sh.doc_id, sh.shingle
  FROM sh JOIN sat USING (shingle) CROSS JOIN spine sp
  WHERE CAST('0x' || substr(md5(sh.shingle || ':'
        || CAST(sh.doc_id AS VARCHAR)), 1, 7) AS BIGINT) * s
        < sp.sample * (CAST(1 AS BIGINT) << 28)
), sokb AS (
  SELECT sample, shingle FROM skept GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND 4 * sample
), spairs AS (
  SELECT DISTINCT a.sample, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM skept a
  JOIN skept b ON a.sample = b.sample AND a.shingle = b.shingle
    AND a.doc_id < b.doc_id
  JOIN sokb ON sokb.sample = a.sample AND sokb.shingle = a.shingle
), bill AS (
  SELECT sp.sample, coalesce(p.n, 0) AS n_candidate_pairs
  FROM spine sp LEFT JOIN (
    SELECT sample, count(*) AS n FROM spairs GROUP BY 1) p
  USING (sample)
)"""

R11_QUERIES: list[QuerySpec] = [
    _q(
        "recovery_autosize_curve",
        lambda spark, sf: dedup.recovery_autosize_curve(
            views(spark, sf)["documents"],
            budgets=_AUTOSIZE_BUDGETS, max_bucket=5),
        # replay: the q_r10 sweep CTEs reduced to the per-sample
        # candidate bill, a budget spine, and the largest-fitting-
        # sample argmax (samples with a zero bill fit every budget,
        # matching the Spark side's coalesced sweep)
        f"""WITH {_SH_SPINE}, {_BILL_CTES}, budgets(budget_pairs) AS (
  VALUES (0), (50), (120), (400), (50000), (700000), (2000000)
), fits AS (
  SELECT b.budget_pairs, max(a.sample) AS chosen_sample
  FROM budgets b JOIN bill a ON a.n_candidate_pairs <= b.budget_pairs
  GROUP BY 1
)
SELECT CAST(b.budget_pairs AS BIGINT) AS budget_pairs,
  CAST(coalesce(f.chosen_sample, 0) AS INT) AS chosen_sample,
  CAST(coalesce(a2.n_candidate_pairs, 0) AS BIGINT) AS bill_pairs
FROM budgets b
LEFT JOIN fits f USING (budget_pairs)
LEFT JOIN bill a2 ON a2.sample = f.chosen_sample
ORDER BY budget_pairs""",
    ),
    _q(
        "ngram_jaccard_autotuned",
        # the closed loop end-to-end (VERDICT r10 items 2+3 composed):
        # near-dup pairs whose recovery sample is CHOSEN by the priced
        # autosizer under a 400-candidate-pair budget — at sf0.01 that
        # picks sample 5 (bill 284), at sf0.1 every sample is over
        # budget so recovery turns OFF (chosen 0) and the result is
        # the capped pair list; the oracle replays the argmax itself,
        # so the gate verifies the tuning DECISION at both scales, not
        # just one outcome
        lambda spark, sf: dedup.ngram_jaccard_pairs(
            views(spark, sf)["documents"], threshold=0.1, max_bucket=5,
            recover_saturated=dedup.autosize_recover_saturated(
                views(spark, sf)["documents"], 400, max_bucket=5)),
        f"""WITH {_SH_SPINE}, {_BILL_CTES}, chosen AS (
  SELECT coalesce(max(sample) FILTER (
    WHERE n_candidate_pairs <= 400), 0) AS cs
  FROM bill
), shf AS (
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
  CROSS JOIN chosen
  WHERE s > 5
    AND CAST('0x' || substr(md5(sh.shingle || ':'
        || CAST(sh.doc_id AS VARCHAR)), 1, 7) AS BIGINT) * s
        < chosen.cs * (CAST(1 AS BIGINT) << 28)
), okb AS (
  SELECT shingle FROM kept CROSS JOIN chosen
  GROUP BY shingle, chosen.cs
  HAVING count(*) BETWEEN 2 AND 4 * chosen.cs
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN okb ON okb.shingle = a.shingle
), rexact AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
), recovered AS (
  SELECT doc_a, doc_b, n_common,
    round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
  FROM rexact
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.1
)
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
        "dedup_graph_summary",
        lambda spark, sf: dedup.dedup_graph_summary(
            views(spark, sf)["documents"]),
        # member pair graph (threshold 0.1, cap 200 — the gated
        # dedup_ngram_jaccard semantics), recursive transitive closure
        # for components, and the tier CASE on the same symmetrized-
        # edge thresholds connected_components dispatches on
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
), com AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b FROM com
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
), lab AS (
  SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY 1
), np AS (SELECT count(*) AS n_pairs FROM pairs),
nn AS (
  SELECT count(*) AS n_nodes,
    count(DISTINCT cluster_id) AS n_components
  FROM lab
), lc AS (
  SELECT coalesce(max(sz), 0) AS largest_component
  FROM (SELECT count(*) AS sz FROM lab GROUP BY cluster_id)
)
SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
  CAST(n_nodes AS BIGINT) AS n_nodes,
  CAST(n_components AS BIGINT) AS n_components,
  CAST(largest_component AS BIGINT) AS largest_component,
  CASE WHEN n_pairs * 2 <= {dedup.CC_DIRECT_FOLD_EDGES} THEN 'direct'
       WHEN n_pairs * 2 <= {dedup.LOCAL_CC_MAX_EDGES} THEN 'partials'
       ELSE 'loop' END AS cc_tier
FROM np CROSS JOIN nn CROSS JOIN lc""",
    ),
    _q(
        "ingest_dedup_recovered",
        # the recovering ingest variant (VERDICT r10 item 4): cap 5
        # saturates on the fixtures, sample 3 recovers — candidates
        # also drawn from the thinned saturated corpus index, recovered
        # (batch, corpus) pairs re-scored with their TRUE n_common from
        # the uncapped corpus table, replacing capped twins
        lambda spark, sf: dedup.incremental_ingest_dedup(
            views(spark, sf)["documents"].where("doc_id % 10 <> 0"),
            views(spark, sf)["documents"].where("doc_id % 10 = 0"),
            max_bucket=5, recover_saturated=3),
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
  SELECT sh FROM csh GROUP BY 1 HAVING count(*) <= 5
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
), satb AS (
  SELECT sh, count(*) AS s FROM csh GROUP BY 1 HAVING count(*) > 5
), cthin AS (
  SELECT csh.c_doc, csh.sh FROM csh JOIN satb USING (sh)
  WHERE CAST('0x' || substr(md5(csh.sh || ':'
        || CAST(csh.c_doc AS VARCHAR)), 1, 7) AS BIGINT) * s
        < 3 * (CAST(1 AS BIGINT) << 28)
), cand AS (
  SELECT DISTINCT b_doc, c_doc FROM bsh JOIN cthin USING (sh)
), reccom AS (
  SELECT cand.b_doc, cand.c_doc, count(*) AS n_common
  FROM cand
  JOIN bsh USING (b_doc)
  JOIN csh ON csh.c_doc = cand.c_doc AND csh.sh = bsh.sh
  GROUP BY 1, 2
), com2 AS (
  SELECT * FROM reccom
  UNION ALL
  SELECT com.* FROM com
  ANTI JOIN reccom USING (b_doc, c_doc)
), scored AS (
  SELECT b_doc, c_doc,
    (n_common * 1000000) // (n_b + n_c - n_common) AS jac_ppm
  FROM com2 JOIN bsz USING (b_doc) JOIN csz USING (c_doc)
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
]
