"""Whole-registry physical-plan audit: explain every registered query at
sf0.001 and report anti-patterns — CartesianProduct anywhere,
BroadcastNestedLoopJoin outside the known one-row broadcast-scalar
whitelist, and single-partition windows outside the documented-bounded
whitelist.  The per-operator plan tests in tests/test_plans.py assert
the load-bearing shapes; this sweep catches regressions in the long
tail the targeted tests don't cover.

Usage: python tools/plan_audit.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402

# Queries where a BroadcastNestedLoopJoin is a BOUNDED broadcast join
# verified by reading its source: a one-row broadcast aggregate
# (corpus x scalar state), a broadcast literal range (replica/EC
# fan-out in the derived views, 2-5 rows), or an intentionally-exact
# broadcast baseline (knn_bruteforce's query set).  Every entry was
# audited against its crossJoin site; a NEW unlisted BNLJ is a
# regression and gets flagged.
BNLJ_OK = {
    "decontaminate_overlap", "domain_mixture", "tf_idf_top_terms",
    "lm_cross_entropy", "perplexity_buckets", "vocab_coverage",
    "kmeans_assign", "knn_ivf", "knn_pq", "knn_ivf_pq", "pq_codes",
    "pq_reconstruction_report", "ivf_list_balance",
    # one-row broadcast merge-literal crossJoins per BPE round
    "bpe_train", "bpe_encode_stats",
    # r6: one-row broadcast aggregates (corpus total / grand count /
    # max doc_id) and the brute-force broadcast query set respectively
    "events_power_users", "source_length_drift", "ngram_novelty_curve",
    "embedding_dim_fidelity", "curation_report",
    "semantic_dedup", "shingle_cardinality_kmv", "weighted_sample",
    "bloom_membership", "cms_heavy_hitters", "safemode_status",
    "global_stats", "cluster_state", "key_insight_summary",
    "storage_distribution", "gdpr_crypto_shred", "dedup_threshold_sweep",
    "datanode_utilization", "balancer_move_candidates",
    "cross_corpus_dedup", "ec_reconstruction_plan", "curation_pipeline",
    # derived-view fan-outs (literal range crossJoins in tables.py) and
    # one-row aggregates in the operators themselves
    "acl_effective_rights", "acl_read_allowed", "sst_diff_pruning",
    "list_pipelines", "decommission_plan", "node_status",
    "container_health", "replica_checksum_scrub", "list_containers_closed",
    "pending_deletion_by_datanode", "fso_resolve_subtree",
    "topology_sorted_replicas", "replica_bcsid_lag",
    # exact broadcast baseline by design (the production path is
    # knn_lsh / knn_ivf / knn_pq)
    "knn_bruteforce",
    # one-row broadcast scalar crossJoins: Q15's max-over-view, Q11's
    # global-total HAVING, Q22's average-balance threshold, the Zipf
    # fit row attached to the top-n token table
    "top_supplier", "important_suppliers", "sales_opportunity",
    "zipf_curve", "events_type_cooccurrence",
    # composes knn_bruteforce (sanctioned exact baseline) + knn_lsh /
    # knn_ivf respectively
    "ann_recall", "ivf_recall",
    # r7: broadcast query-set x centroid-row rank join (|q| x n_cent
    # rows) + the sanctioned brute-force baseline; and two brute-force
    # passes (full-precision + quantized) respectively
    "ivf_probe_sweep", "embedding_sq_fidelity",
    # r7: broadcast literal candidate-length / horizon spines joined
    # against bounded histograms (one corpus scan per sweep)
    "context_length_coverage", "events_watermark_drop",
    # r7: one-row broadcast scalar crossJoins (percentile/top-10 rows)
    "join_key_skew",
    # bounded-sample all-pairs truth set by design (eval-on-a-sample)
    "simhash_recall",
    # one-row broadcast max-id scalar for the bucket split
    "corpus_growth_curve",
    # |sources|-row sketch table joined to itself by broadcast
    # inequality — pair math over k-int arrays, corpus-independent
    "kmv_source_overlap",
    # r8: rides kmeans_assign (one-row broadcast centroid table)
    "prototype_pruning",
    # r8: two one-row broadcast scalar crossJoins (corpus totals and
    # the waterfill cutoff aggregates) against the |langs|-row table
    "mixture_waterfill",
    # r8 (allowlisted r9, VERDICT r8 item 6): the one-row broadcast
    # totals aggregate crossJoined onto the bounded degree histogram
    # (linkage.py:145) — same sanctioned one-row-scalar class
    "linkage_degree_distribution",
    # r9: two one-row broadcast scalar crossJoins (dropped-doc reach
    # and corpus doc count) onto the one-row bucket aggregate
    "bucket_cap_report",
    # r9: one-row broadcast totals crossJoined onto the |langs|-row
    # cell table (mixture_waterfill's sibling)
    "temperature_mixture",
    # r9: broadcast 6-row caps spine crossJoined with the bounded
    # bucket-size histogram (distinct sizes, a few hundred rows max)
    "bucket_cap_sweep",
    # r10: broadcast 6-row sample spine crossJoined with the bounded
    # max-thinned survivor table (~max(samples) expected rows per
    # saturated bucket), plus the one-row saturated-bucket-count
    # scalar attach — bucket_cap_sweep's sample-axis twin
    "recovery_sample_sweep",
    # r11: broadcast 7-row budget spine inequality-joined against the
    # 6-row per-sample bill table (42 candidate rows total) — the
    # autosize argmax; both sides bounded by construction
    "recovery_autosize_curve",
    # r11: three one-row scalar aggregates (pair count / node+component
    # counts / largest component) crossJoined into the single report
    # row — the sanctioned one-row-scalar class
    "dedup_graph_summary",
}


def _split_args(s: str) -> list[str]:
    out, depth, cur = [], 0, ""
    for ch in s:
        if ch == "(":
            depth += 1
        if ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append(cur)
            cur = ""
        else:
            cur += ch
    out.append(cur)
    return [a.strip() for a in out]


def _has_unpartitioned_window(executed_plan: str) -> bool:
    """True when any windowspecdefinition in the executed plan carries
    an EMPTY partition list (its first top-level argument is already an
    ordering expression or the frame).  As of round 9 the repo-wide
    invariant is ZERO such specs: every bounded single-partition window
    (post-limit top-k, calendar/bucket spines, page windows) carries a
    bounded_window_key partition — Catalyst folds literal keys away —
    so a WindowExec single-partition warning in any log is always a
    genuine unbounded-window regression."""
    import re
    for m in re.finditer(r"windowspecdefinition\(", executed_plan):
        i, depth, j = m.end(), 1, m.end()
        while depth and j < len(executed_plan):
            if executed_plan[j] == "(":
                depth += 1
            elif executed_plan[j] == ")":
                depth -= 1
            j += 1
        args = _split_args(executed_plan[i:j - 1])
        if args and (" ASC" in args[0] or " DESC" in args[0]
                     or args[0].startswith("specifiedwindowframe")):
            return True
    return False


# Drain-style queries: their registry fn fully EXECUTES a streaming
# drain (staging parquet + checkpoint + awaitTermination) at
# construction time just to hand back a read-back DataFrame, so the
# plan the audit would see is a bare parquet scan of the drained
# output — zero signal — at the cost of running the whole stream
# (ADVICE r9 low #2).  Their streaming plans are covered by dedicated
# pytests (micro-batch-boundary invariance, state-bound checks).
DRAIN_STYLE = {"streaming_ingest_dedup"}


def audit(spark, sf: str, verbose: bool = True,
          skip_drains: bool = True) -> list[str]:
    """Explain every registered query at `sf` and return the list of
    flag/error strings (empty = clean).  Callable from pytest
    (tests/test_plans.py asserts zero flags so a shipped flag fails the
    suite instead of riding in an artifact — VERDICT r8 item 6)."""
    flags: list[str] = []
    for name, fn in e.queries().items():
        if skip_drains and name in DRAIN_STYLE:
            continue
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            executed = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            flags.append(f"ERR {name}: {type(exc).__name__}: {exc}")
            if verbose:
                print(flags[-1])
            continue
        body = plan.split("== Physical Plan ==")[-1]
        issues = []
        if "CartesianProduct" in body:
            issues.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in body and name not in BNLJ_OK:
            issues.append("BroadcastNestedLoopJoin(unlisted)")
        if _has_unpartitioned_window(executed):
            issues.append("unpartitioned-window")
        if issues:
            flags.append(f"FLAG {name}: {', '.join(issues)}")
            if verbose:
                print(flags[-1])
    if verbose:
        print(f"done: {len(flags)} flagged of {len(e.queries())}")
    return flags


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    return 1 if audit(spark, sf) else 0


if __name__ == "__main__":
    sys.exit(main())
