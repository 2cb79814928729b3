#!/usr/bin/env python
"""10x-corpus dedup/ANN scale check (reproducible).

Builds a 50k-document corpus (each sf0.1 document spawns 9 deterministic
near-duplicate variants), then measures:
  - exact n-gram Jaccard pair discovery (the quadratic-ish baseline),
  - MinHash+LSH pair discovery and its recall vs exact,
  - IVF ANN top-k latency on a 10x embedding corpus.

This is the evidence behind the README's claim that the sub-quadratic
scale paths (LSH banding, IVF probing) hold up when the corpus grows
10x: the candidate-join costs grow with matching pairs, not all pairs.

Usage: python tools/scale_check.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ozone_spark.functions import similarity
from ozone_spark.functions.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from ozone_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
VARIANTS = 10


def build_corpus(spark):
    """Each doc spawns VARIANTS-1 near-dup variants: variant i keeps the
    text but appends i deterministic filler tokens — high-Jaccard pairs
    inside each group, disjoint across groups.

    Filler tokens embed the DOC id (not just the variant number):
    variant-i filler identical across all docs would put a degenerate
    shingle in a 5000-doc bucket — hundreds of millions of sub-threshold
    candidate pairs that no exact baseline can enumerate (and that no
    real corpus contains: boilerplate that common is exactly what the
    production cap drops).  Per-doc filler keeps the planted pairs and
    keeps the UNCAPPED exact baseline enumerable, so recall is measured
    against a truly exact ground truth."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    v = spark.range(VARIANTS).withColumnRenamed("id", "variant")
    filler = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.col("variant")),
        lambda i: F.concat(F.lit("x"), F.col("doc_id"), F.lit("v"),
                           F.col("variant"), F.lit("f"), i)))
    return (
        docs.crossJoin(v)
        .select(
            (F.col("doc_id") * VARIANTS + F.col("variant")).alias("doc_id"),
            F.when(F.col("variant") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", "text", filler)).alias("text"))
    )


def build_embeddings(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    v = spark.range(VARIANTS).withColumnRenamed("id", "variant")
    jitter = F.transform(
        "embedding", lambda x: x + F.col("variant").cast("float") * F.lit(1e-4))
    return (
        emb.crossJoin(v)
        .select((F.col("vec_id") * VARIANTS + F.col("variant")).alias("vec_id"),
                jitter.alias("embedding"), "label")
    )


def main() -> int:
    spark = get_spark("ozone-spark-scale-check",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or
                      (os.cpu_count() or 8))
    from ozone_spark.session import jvm_calibrate
    calib_start = jvm_calibrate(spark)
    corpus = build_corpus(spark).persist()
    n_docs = corpus.count()

    t0 = time.perf_counter()
    # the recall ground truth must be TRULY exact: lift the hot-shingle
    # bucket cap (the planted variants put 10 near-identical docs in
    # every shingle bucket, so the default cap would silently drop
    # shared shingles and truncate the baseline)
    exact = ngram_jaccard_pairs(corpus, threshold=0.1,
                                max_bucket=1 << 30).select("doc_a", "doc_b")
    exact_pairs = exact.persist()
    n_exact = exact_pairs.count()
    t_exact = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    lsh = minhash_lsh_pairs(corpus, threshold=0.1).select("doc_a", "doc_b")
    lsh_pairs = lsh.persist()
    n_lsh = lsh_pairs.count()
    t_lsh = round(time.perf_counter() - t0, 1)
    n_hit = exact_pairs.join(lsh_pairs, ["doc_a", "doc_b"], "left_semi").count()

    emb = build_embeddings(spark).persist()
    n_vecs = emb.count()
    qids = [20, 21, 22]
    t0 = time.perf_counter()
    similarity.knn_ivf(emb, qids, k=10).count()
    t_ivf = round(time.perf_counter() - t0, 1)

    # PQ/ADC on the same 10x corpus: scan cost is m int codes per vector
    # instead of the full float vector; recall measured against the
    # exact brute-force top-10
    bf = {(r.query_id, r.vec_id)
          for r in similarity.knn_bruteforce(emb, qids, k=10).collect()}
    t0 = time.perf_counter()
    pq_rows = similarity.knn_pq(emb, qids, k=10).collect()
    t_pq = round(time.perf_counter() - t0, 1)
    pq_hits = {(r.query_id, r.vec_id) for r in pq_rows}

    # SemDeDup on the 10x embedding corpus: the planted jitter variants
    # are semantic twins, so ~ (VARIANTS-1)/VARIANTS of the corpus must
    # be dropped; wall-clock shows the cluster+band candidate bounding
    # holds at 10x
    t0 = time.perf_counter()
    sem = similarity.semantic_dedup(emb, threshold=0.999)
    n_kept = sem.where("is_kept").count()
    t_sem = round(time.perf_counter() - t0, 1)

    print(json.dumps({
        "n_docs": n_docs, "n_vectors": n_vecs,
        "exact_pairs": n_exact, "exact_sec": t_exact,
        "lsh_pairs": n_lsh, "lsh_sec": t_lsh,
        "lsh_recall_vs_exact": round(n_hit / max(n_exact, 1), 4),
        "ivf_knn_sec": t_ivf,
        "pq_knn_sec": t_pq,
        "pq_recall_vs_exact": round(len(bf & pq_hits) / max(len(bf), 1), 4),
        "semantic_dedup_sec": t_sem,
        "semantic_kept_fraction": round(n_kept / max(n_vecs, 1), 4),
        "calib": [calib_start, jvm_calibrate(spark)],
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
