#!/usr/bin/env python
"""Largest-scale stress pass (round-4 VERDICT item 4).

No sf1.0 fixture exists (the driver ships sf0.001/0.01/0.1), so this
builds one: every sf0.1 base table replicated REPLICAS x into a
temporary parquet directory with primary keys shifted per replica —
documents/embeddings keep their payloads byte-identical across
replicas, which makes every document a member of a 10-way exact/near
duplicate family.  That is the worst realistic skew for the dedup
surface: every LSH/shingle/chunk bucket is 10x hotter, the
connected-components edge list is 10x denser, and every span in the
corpus is a removable duplicate (span-removal's explode volume becomes
the ENTIRE corpus, its documented worst case).

The heavy queries then run UNCHANGED from the registry against the
replicated directory, so this exercises the real gate code paths —
including the corpus-sized suggest_* index constants — at ~sf1.0
volume.  Output: one JSON line per run plus SCALE_r{N}.json with
wall-clock and row counts; any query erroring or degenerating
super-linearly fails the script.

Usage: python tools/scale_stress.py [--out SCALE_r05.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ozone_spark.registry import queries  # noqa: E402
from ozone_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
# Perturbed-replica mode (VERDICT r8 item 3): byte-identical replicas
# zero out the capped near-dup pair stage at the top scale decades —
# base shingles carry multiplicity ~2-6, so at 100x every bucket
# exceeds the 200 cap and "zero failures" measured an EMPTY pair
# stage.  With PERTURB on, each document gets (a) a doc-salted token
# every 10 words, REPLICA-INVARIANT, so replicas of one base doc share
# salted shingles in buckets of exactly N docs (under the cap at
# N <= 200) and the pair generator emits real cross-replica near-dup
# pairs (surviving-shingle Jaccard ~ 0.15 > the 0.1 threshold); and
# (b) a replica-specific token every 50 words, so no two replicas are
# EXACT duplicates and contraction cannot shortcut the quadratic
# stage.  Unperturbed common shingles still saturate their buckets —
# which is exactly what bucket_cap_report is gated to surface.
PERTURB = os.environ.get("SPARK_GRAFT_SCALE_PERTURB", "0") == "1"

# per-table primary-key shift columns; dims (region/nation/customer/
# supplier/part) stay 1x — at 100 TB the dimension side is what you
# broadcast, scaling it with the fact volume would be the wrong model
SHIFT = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
}
COPY = ["region", "nation", "customer", "supplier", "part"]

# the top heavy queries from the bench board + the VERDICT's named
# scaling-law checkpoints (CC round count, LSH bucket caps under skew,
# span-removal explode volume)
STRESS_QUERIES = [
    "dedup_clusters",            # CC: round count grows O(log d)
    "dedup_minhash_lsh",         # LSH banding under 10-way-dup skew
    "dedup_ngram_jaccard",       # shingle bucket caps under skew
    "remove_duplicate_spans",    # explode volume == whole corpus here
    "payload_chunk_near_dup",    # chunk-bucket caps under skew
    "semantic_dedup",            # cluster+band bounding at 10x
    "cross_corpus_dedup",
    "knn_ivf_pq",
    "acl_effective_rights",      # 10x keys through the ACL resolution
    "namespace_dist",            # 10x keys through the per-dir histogram
    "events_sessionize",         # 10x denser per-user event streams
    "snapshot_diff",
    "decontaminate_bloom",       # Bloom probe joins at 10x corpus
    "source_overlap_matrix",     # shingle self-join: every shingle in
                                 # every source here (worst fan-out)
    "dedup_winnowing",           # zero-shuffle per-row fingerprints,
                                 # bucket caps under 10-way-dup skew
    "minhash_recall",            # BOTH pair generators + pair-key join
                                 # under 10-way-dup skew (worst case for
                                 # the truth-side bucket explode)
    "waiting_orders_suppliers",  # 10x lineitem through the one-exchange
                                 # agg+window blame plan
    "volume_shipping",           # nation-pair fact join at 10x lineitem
    "cohort_retention",          # 10x denser per-user activity
    "zipf_curve",                # 10x token stream into the top-k rank
    "boilerplate_paragraphs",    # here EVERY paragraph has df=10 >= 3:
                                 # the all-boilerplate worst case for the
                                 # fp frequency join + per-doc rebuild
    "lsh_bucket_stats",          # the skew report itself on 10x-hot
                                 # buckets (sizes the pair bill above)
    "embedding_outliers",        # centroid partial-agg at 10x vectors
    "events_daily_anomalies",    # 10x daily counts into the MAD stats
    "streaming_session_stats",   # applyInPandasWithState drain: 10x
                                 # denser per-user state at 1M events
    "streaming_dedup",           # dropDuplicates state at 10x key volume
    "bpe_train",                 # tokenizer training: the corpus->vocab
                                 # fold at 10x (vocab itself is scale-
                                 # free here — replicas are copies)
    "table_profile",             # per-column profile: distinct exchange
                                 # + KMV rank at 10x lineitem
    "simhash_recall",            # r6 count-bounded truth set: time must
                                 # stay flat as the corpus grows
    "ngram_novelty_curve",       # r6: shingle dedup exchange + per-h
                                 # min-bucket agg at 10x shingle volume
    "dedup_savings",             # r6: fp keeper join at 10-way-dup skew
                                 # (every doc redundant but one)
    "events_interarrival",       # r6: 10x denser per-(user,type) gap
                                 # streams through the lag window
    "dup_graph_centrality",      # r6: 3 propagation joins over the
                                 # 10x-denser capped pair graph
    "dup_graph_centrality_reps",  # r7: the contraction route — every
                                 # 10-clique collapses to one node
                                 # BEFORE the pair pass; must beat the
                                 # member-level worst case above
    "lsh_band_yield",            # r7: per-band first-discovery agg over
                                 # 10x-hot capped buckets
    "dedup_source_affinity",     # r7: pair join + source rollup at 10x
                                 # pair volume
    "near_dup_leakage",          # r7: cross-split pair audit where EVERY
                                 # doc has 9 near-copies across splits
    "context_length_coverage",   # r7: token-length histogram fold at 10x
    "media_ppm_features",        # r7: real P6 decode over 10x payloads
                                 # (map-only Arrow batches)
    "embedding_batch_drift",     # r7: posexplode + 64-key agg at 10x
                                 # vectors
    "ivf_probe_sweep",           # r7: sqrt-law centroid count grows with
                                 # the 10x corpus; rank join stays
                                 # |q| x n_cent
    "keeper_policy_audit",       # r7: cluster-keyed audit over the 10x
                                 # copy-heavy cluster set
    "quality_by_dup_degree",     # r7: degree fold over the 10x pair list
    "join_key_skew",             # r7: count-of-counts percentile math at
                                 # 10x lineitem keys
    "events_disorder_partitioned",  # r8: production-grain disorder — 10x
                                 # denser per-ingest-partition sequences
                                 # through the running-max sort
    "media_bmp_features",        # r8: real BMP decode (stride/padding/
                                 # BGR) over 10x payloads, map-only
    "incremental_ingest_dedup",  # r8: batch-vs-corpus probe where every
                                 # batch doc has ~9 corpus copies and
                                 # every corpus bucket is 10x hotter
    "hdr_quantiles",             # r8: sketch side must stay histogram-
                                 # sized while the exact-truth sort side
                                 # absorbs 10x values per source
    "session_concurrency",       # r8: 10x denser timeline — the prefix-
                                 # sum formulation's cost is the sort,
                                 # while the pair-join alternative would
                                 # grow quadratically per hour bucket
    "prototype_pruning",         # r8: broadcast-centroid assignment +
                                 # per-cluster rank at 10x vectors
    "shard_dedup_leakage",       # r8: 10x span volume; every duplicated
                                 # span is 10x hotter but stays a counter
    "mixture_waterfill",         # r8: corpus-sized groupBy(lang) into
                                 # the vocabulary-sized waterfill
    "hdr_ingest_drift",          # r8: resident-sketch merge at 10x —
                                 # both histograms stay bucket-sized
                                 # while the scan side absorbs 10x
    # record_linkage is NOT stressed here by design: it runs on the
    # customer dimension, which this model keeps 1x (broadcast side)
]


def _perturb_text(rep):
    """Insert a doc-salted token every 10 words (replica-invariant:
    shared across a base doc's replicas only) and a replica token every
    50 words (breaks exactness).  Runs BEFORE key shifting, so doc_id
    is still the base id; pure per-row array work, no shuffle."""
    tok = F.transform(
        F.split(F.col("text"), " "),
        lambda w, j: F.concat(
            w,
            F.when((j % 10) == 9,
                   F.concat(F.lit(" d"), F.col("doc_id").cast("string"),
                            F.lit("x"))).otherwise(F.lit("")),
            F.when((j % 50) == 49,
                   F.concat(F.lit(" r"), F.col("_r").cast("string"),
                            F.lit("x"))).otherwise(F.lit(""))))
    # the replica token also terminates every doc: docs shorter than 50
    # words would otherwise stay byte-identical across replicas
    return rep.withColumn(
        "text", F.concat(F.array_join(tok, " "), F.lit(" r"),
                         F.col("_r").cast("string"), F.lit("xe")))


def build_scaled_dir(spark, out_dir: str) -> None:
    for t in COPY:
        shutil.copyfile(f"{BASE}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, keys in SHIFT.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        # one shift constant covers every key column (they share the
        # magnitude of the table's max id at each sf)
        hi = df.agg(*[F.max(k) for k in keys]).collect()[0]
        shift = max(int(v) for v in hi) + 1
        rep = df.crossJoin(
            spark.range(REPLICAS).withColumnRenamed("id", "_r"))
        if PERTURB and t == "documents":
            rep = _perturb_text(rep)
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.col("_r") * F.lit(shift))
        (rep.drop("_r")
            .repartition(32)
            .write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet"))


def main() -> int:
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    only = None
    if "--only" in sys.argv:  # targeted re-measure of named queries
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
    spark = get_spark("ozone-spark-scale-stress",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or
                      (os.cpu_count() or 8))
    work = tempfile.mkdtemp(prefix="ozs_sfx_")
    t0 = time.perf_counter()
    build_scaled_dir(spark, work)
    build_sec = round(time.perf_counter() - t0, 1)

    from ozone_spark.session import jvm_calibrate
    calib_start = jvm_calibrate(spark)
    print(f"# calibration probe (start): {calib_start}s", file=sys.stderr)
    qs = queries()
    results: dict[str, dict] = {}
    failed = []
    for name in (only if only is not None else STRESS_QUERIES):
        t0 = time.perf_counter()
        try:
            n = qs[name](spark, work).count()
            results[name] = {"sec": round(time.perf_counter() - t0, 1),
                             "rows": n}
            print(f"# {name}: {results[name]['sec']}s ({n} rows)",
                  file=sys.stderr)
        except Exception as ex:  # noqa: BLE001 — record, keep going
            results[name] = {"sec": round(time.perf_counter() - t0, 1),
                             "rows": None, "err": str(ex)[:300]}
            failed.append(name)
            print(f"# FAIL {name}: {str(ex)[:200]}", file=sys.stderr)

    calib_end = jvm_calibrate(spark)
    print(f"# calibration probe (end): {calib_end}s", file=sys.stderr)
    doc = {
        "base_sf_dir": BASE, "replicas": REPLICAS, "perturb": PERTURB,
        "effective_sf": REPLICAS * 0.1, "build_sec": build_sec,
        "queries": results, "failed": failed,
        "calib": [calib_start, calib_end],
    }
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=2)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
