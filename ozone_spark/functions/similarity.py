"""Similarity search over embedding columns (BASELINE.json north star).

Baseline: brute-force cosine top-k — a broadcast of the (tiny) query set
against the full embedding table, dot products computed JVM-side with
zip_with/aggregate (no Python in the hot path), top-k via
TakeOrderedAndProject per query.

Scale path: LSH-bucketed ANN — random-hyperplane signatures bucket the
table; a query only scans its bucket (plus neighbors via multi-probe).
Hyperplanes are derived deterministically from xxhash64 so both the
index build and the probe are pure DataFrame programs, reproducible
cluster-wide with no driver-side state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import broadcast

# 8 hyperplanes -> 256 buckets: sized so a +-2-bit multi-probe still scans
# a few % of the corpus; scale N_PLANES up with corpus size (bits ~
# log2(n_vectors / target_bucket_size)).
N_PLANES = 8
DIM = 64


def _spread(df: DataFrame) -> DataFrame:
    """Fan a single-file input out across cores before per-row vector math."""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target) if df.rdd.getNumPartitions() < target else df


def _dot(a: Column, b: Column) -> Column:
    """Sequential-order double-precision dot product (bit-exact across
    engines that sum in list order)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def knn_bruteforce(embeddings: DataFrame, query_ids: list[int],
                   k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).
    Query side is collected to a broadcast — the scan side streams."""
    queries = (
        embeddings.where(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"))
    )
    scored = (
        _spread(embeddings).crossJoin(broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("q"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos_sim")
        .orderBy("query_id", "rank")
    )


def _lsh_signature(vec: Column) -> Column:
    """Random-hyperplane signature: plane p, dim d coefficient =
    ±1 by parity of xxhash64(p*DIM+d) — deterministic, no stored model."""
    bits = []
    for p in range(N_PLANES):
        coeff = F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: F.when(
                F.xxhash64(F.lit(p) * DIM + d).bitwiseAND(F.lit(1)) == 1,
                F.lit(1.0)).otherwise(F.lit(-1.0)),
        )
        proj = F.aggregate(
            F.zip_with(vec, coeff, lambda x, c: x.cast("double") * c),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p))
                    .otherwise(F.lit(0).cast("long")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseXOR(b)
    return sig


def knn_lsh(embeddings: DataFrame, query_ids: list[int], k: int = 10,
            probe_hamming: int = 2) -> DataFrame:
    """ANN top-k: bucket by hyperplane signature, probe buckets within
    `probe_hamming` bits of the query's signature, exact-rank the
    candidates.  Trades recall for a ~(buckets probed / 2^N_PLANES) scan."""
    indexed = _spread(embeddings).withColumn("sig", _lsh_signature(F.col("embedding")))
    queries = (
        indexed.where(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"),
                F.col("sig").alias("qsig"))
    )
    cand = (
        indexed.join(broadcast(queries),
                     F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig")))
                     <= probe_hamming)
        .where(F.col("vec_id") != F.col("query_id"))
    )
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.select("query_id", "vec_id",
                    F.round(cosine(F.col("q"), F.col("embedding")), 6).alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos_sim")
        .orderBy("query_id", "rank")
    )


N_CENTROIDS = 16
N_PROBE = 2


def ivf_assignments(embeddings: DataFrame,
                    n_centroids: int = N_CENTROIDS) -> DataFrame:
    """IVF coarse quantizer: centroids are the first `n_centroids`
    vectors (deterministic, no trained model to ship); every vector is
    assigned to its max-dot-product centroid.  At scale the assignment
    is one broadcast join + max_by — a single pass over the corpus."""
    centroids = (
        embeddings.where(F.col("vec_id") < n_centroids)
        .select(F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("c"))
    )
    scored = embeddings.crossJoin(broadcast(centroids)).select(
        "vec_id", "embedding", "centroid_id",
        _dot(F.col("embedding"), F.col("c")).alias("dot"))
    return (
        scored.groupBy("vec_id")
        .agg(F.max_by("centroid_id", F.col("dot")).alias("centroid_id"),
             F.first("embedding").alias("embedding"))
    )


def knn_ivf(embeddings: DataFrame, query_ids: list[int], k: int = 10,
            n_probe: int = N_PROBE) -> DataFrame:
    """IVF-probed ANN: rank centroids per query, scan only the `n_probe`
    best inverted lists, exact-rank the candidates.  Scan fraction ~
    n_probe / n_centroids of the corpus."""
    assigned = ivf_assignments(embeddings)
    centroids = (
        embeddings.where(F.col("vec_id") < N_CENTROIDS)
        .select(F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("c"))
    )
    queries = (
        embeddings.where(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"))
    )
    from pyspark.sql import Window
    wq = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("centroid_id"))
    probe = (
        queries.crossJoin(broadcast(centroids))
        .select("query_id", "q", "centroid_id",
                _dot(F.col("q"), F.col("c")).alias("dot"))
        .withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= n_probe)
        .select("query_id", "q", "centroid_id")
    )
    cand = (
        assigned.join(broadcast(probe), "centroid_id")
        .where(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.select("query_id", "vec_id",
                    F.round(cosine(F.col("q"), F.col("embedding")), 6).alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cos_sim")
        .orderBy("query_id", "rank")
    )


def embedding_near_dup_pairs(embeddings: DataFrame,
                             threshold: float = 0.4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >=
    threshold).  Baseline formulation is the blocked all-pairs join; the
    scale path reuses the LSH/IVF bucketing above so only same-bucket
    pairs are scored."""
    a = embeddings.select(F.col("vec_id").alias("vec_a"),
                          F.col("embedding").alias("ea"))
    b = embeddings.select(F.col("vec_id").alias("vec_b"),
                          F.col("embedding").alias("eb"))
    return (
        _spread(a).join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b",
                F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


def embedding_norms(embeddings: DataFrame) -> DataFrame:
    """Corpus embedding stats (norm distribution per label) — sanity
    surface for the ANN index."""
    norm = F.round(F.sqrt(_dot(F.col("embedding"), F.col("embedding"))), 6)
    return (
        embeddings.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(F.count("*").alias("n"),
             F.round(F.avg("norm"), 6).alias("avg_norm"))
        .orderBy("label")
    )
