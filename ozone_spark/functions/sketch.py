"""Portable cardinality sketches: KMV (k-minimum-values) distinct
estimation that replays bit-identically in any engine with md5.

Why not HyperLogLog (`approx_count_distinct`): every engine ships a
different HLL implementation (hash, register layout, bias correction),
so estimates never match across engines and can't be oracle-checked.
KMV's estimate is a pure function of the k smallest hash values —
deterministic given the hash — and md5 is universal.  The 52-bit hash
is chosen so every value is exactly representable as a double; the
(k-1)/h_k division is then one correctly-rounded IEEE op in any engine.

Estimator (Bar-Yossef et al. 2002; Beyer et al. 2007 unbiased form):
with h_k the k-th smallest of n distinct uniform hashes in [0, 1),
E[(k-1)/h_k] = n; relative std error ~ 1/sqrt(k-2).

Scale shape (100 TB): the distinct-token set shuffles once (the
dedup groupBy), then the per-group rank touches only hash/token pairs
— never document text.  The window sort is O(d log d) over DISTINCT
tokens per group; a production build would push k-minima into a partial
aggregate (typed Aggregator keeping a k-size heap per partition, merged
associatively) — the estimator math here is unchanged by that swap.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .dedup import bounded_window_key as _bwk

KMV_K = 256
TWO_52 = float(1 << 52)


def hash52(col: Column) -> Column:
    """52-bit md5-prefix hash — exactly representable as a double, so
    downstream float math is engine-portable (DuckDB twin:
    CAST('0x' || substr(md5(s), 1, 13) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("long")


def kmv_shingle_estimate(docs: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-source distinct-shingle (word-bigram) cardinality: exact
    count next to the KMV estimate from the k smallest shingle hashes,
    plus the relative error.  Groups with fewer than k distinct shingles
    fall back to the exact count (the sketch holds the whole set).

    This is the planning input for the dedup family (functions/dedup.py):
    distinct-shingle counts size the MinHash signature stage and the LSH
    band buckets without ever materializing the shingle set."""
    w = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(w)
    grams = F.when(
        n >= 2,
        F.zip_with(F.slice(w, F.lit(1), n - 1), F.slice(w, F.lit(2), n - 1),
                   lambda a, b: F.concat_ws(" ", a, b)),
    ).otherwise(F.array().cast("array<string>"))
    toks = (
        docs.select("source", F.explode(grams).alias("w"))
        .distinct()
        .withColumn("h", hash52(F.col("w")))
    )
    rn = Window.partitionBy("source").orderBy("h", "w")
    ranked = toks.withColumn("rn", F.row_number().over(rn))
    est = F.when(
        F.col("exact_distinct") < k, F.col("exact_distinct").cast("double")
    ).otherwise((k - 1) * TWO_52 / F.col("hk"))
    return (
        ranked.groupBy("source")
        .agg(F.count("*").alias("exact_distinct"),
             F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"))
        .select(
            "source", "exact_distinct",
            F.round(est, 4).alias("kmv_estimate"),
            F.round(F.abs(est - F.col("exact_distinct"))
                    / F.col("exact_distinct"), 6).alias("rel_error"))
    )


SAMPLE_K = 25
WS_SALT = "wsample-v1"


def weighted_sample(docs: DataFrame, k: int = SAMPLE_K,
                    salt: str = WS_SALT) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each doc draws u from its md5 hash
    (52-bit => u is an exact double in (0, 1]), gets key = -ln(u)/w
    with w = n_chars, and the k smallest keys win — inclusion
    probability proportional to weight, replayable bit-identically by
    any engine with md5/ln.

    Scale shape: map-only key computation, then global top-k =
    TakeOrderedAndProject (per-partition heads merged on one reducer —
    no global sort, no window over the full corpus).  The rank window
    runs over the k survivors only."""
    u = (hash52(F.concat(F.col("doc_id").cast("string"), F.lit(salt))) + 1) \
        / F.lit(TWO_52)
    key = -F.log(u) / F.col("n_chars")
    top = (
        docs.select("doc_id", F.col("n_chars").alias("weight"),
                    key.alias("key"))
        .orderBy("key", "doc_id")
        .limit(k)
    )
    rn = Window.partitionBy(_bwk("key")).orderBy("key", "doc_id")  # k rows
    return top.withColumn("rank", F.row_number().over(rn).cast("long")) \
        .select("doc_id", "weight", F.round("key", 9).alias("sample_key"),
                "rank")


# --------------------------------------------------------- Bloom filter

BLOOM_M = 1 << 14   # bits — sized so sf0.01's ~4k train items run the
                    # filter at ~1 fill ratio and the probe actually
                    # exercises the false-positive path, not just hits
BLOOM_K = 4         # hash functions
WORD_BITS = 60      # bits packed per word — 60 (not 64) keeps every
                    # 1 << bit off the sign bit, which some engines
                    # (DuckDB) reject as shift overflow
BLOOM_SALT = "bloom-v1"


def suggest_bloom_m(n_items: int, fp_rate: float = 0.01) -> int:
    """Executable Bloom sizing law: m = -n·ln(p)/ln(2)², rounded up to
    a power of two and floored at 2^10.  The fixture's ~1.7k train
    items at 1% fp reproduce the shipped BLOOM_M default of 2^14; 1e9
    items size to 2^34 bits (~2 GB as a distributed bitset table)."""
    import math
    bits = -n_items * math.log(fp_rate) / (math.log(2) ** 2)
    return 1 << max(10, math.ceil(math.log2(max(bits, 2))))


def _bloom_positions(item: Column, k: int = BLOOM_K,
                     m: int = BLOOM_M) -> list[Column]:
    """k independent bit positions from salted md5 prefixes — the
    portable substitute for the usual two-hash Kirsch-Mitzenmacher
    scheme (engines disagree on 128-bit arithmetic; k salted md5s
    replay anywhere)."""
    return [hash52(F.concat(item, F.lit(f"{BLOOM_SALT}-{j}"))) % m
            for j in range(k)]


def bloom_build(items: DataFrame, col: str = "fp",
                m: int = BLOOM_M) -> DataFrame:
    """Distributed Bloom bitset as a (word_idx, word_bits) table:
    explode each item into its k bit positions, OR bits per 60-bit
    word.  One shuffle (the groupBy), m/64 result rows regardless of
    input size — broadcastable for probes when m is modest, joinable
    on word_idx when m must grow with the corpus."""
    pos = F.explode(F.array(*_bloom_positions(F.col(col), m=m))).alias("pos")
    return (
        items.select(pos)
        .select((F.col("pos") / WORD_BITS).cast("long").alias("word_idx"),
                F.expr(f"shiftleft(1L, CAST(pos % {WORD_BITS} AS INT))")
                .alias("bit"))
        .groupBy("word_idx").agg(F.bit_or("bit").alias("word_bits"))
    )


def bloom_probe_stats(train: DataFrame, probe: DataFrame,
                      col: str = "fp") -> DataFrame:
    """Membership verdicts for `probe` against a Bloom filter built
    over `train`, cross-checked against exact membership: emits counts
    per (verdict, actually_present) cell — the false-positive rate is
    the (maybe, false) cell.  'no' with actually_present=true is
    impossible by construction (the sketch never false-negatives);
    the invariant test asserts that cell stays empty.

    Probe shape: explode each probe item into k (word_idx, bit) checks,
    left-join the filter words (missing word => bit clear), AND the k
    verdicts back together with a min — join is equi on word_idx."""
    filt = bloom_build(train, col)
    checks = probe.select(
        F.col(col).alias("item"),
        F.posexplode(F.array(*_bloom_positions(F.col(col))))
        .alias("j", "pos"))
    checks = checks.select(
        "item", "j",
        (F.col("pos") / WORD_BITS).cast("long").alias("word_idx"),
        F.expr(f"shiftleft(1L, CAST(pos % {WORD_BITS} AS INT))")
        .alias("bit"))
    hit = (
        checks.join(filt, "word_idx", "left")
        .withColumn("ok", (F.coalesce(F.col("word_bits"), F.lit(0))
                           .bitwiseAND(F.col("bit")) != 0).cast("int"))
        .groupBy("item").agg((F.min("ok") == 1).alias("maybe"))
    )
    actual = train.select(F.col(col).alias("item")).distinct() \
        .withColumn("present", F.lit(True))
    return (
        hit.join(actual, "item", "left")
        .select("maybe", F.coalesce("present", F.lit(False)).alias("present"))
        .groupBy("maybe", "present").agg(F.count("*").alias("n"))
        .orderBy("maybe", "present")
    )


# ----------------------------------------------------- count-min sketch

CMS_D = 4     # rows (hash functions)
CMS_W = 32    # counters per row — narrower than the fixture vocabulary so
              # slot collisions are real and the min-over-rows recovery
              # (and residual overcount) is actually exercised
CMS_SALT = "cms-v1"


def cms_token_counts(docs: DataFrame, d: int = CMS_D,
                     w: int = CMS_W) -> DataFrame:
    """Count-min heavy-hitter estimation over the token stream: build
    the d x w counter grid (one shuffle: groupBy (row, slot) over the
    exploded stream), then estimate each distinct token's frequency as
    the min over its d counters and compare to the exact count.
    Integer-only math => bit-exact in any engine; est >= exact always
    (counters only over-count) — asserted by the invariant test.

    At 100 TB the grid stays d*w rows no matter the corpus; the
    estimate join is equi on (row, slot) against that tiny grid
    (broadcast).  Only distinct tokens are ever joined — the stream
    itself is touched once."""
    toks = docs.select(
        F.explode(F.filter(F.split(F.col("text"), " "),
                           lambda x: x != "")).alias("w"))
    rows = toks.select(
        "w", F.posexplode(F.array(*[
            hash52(F.concat(F.col("w"), F.lit(f"{CMS_SALT}-{r}"))) % w
            for r in range(d)])).alias("r", "slot"))
    grid = rows.groupBy("r", "slot").agg(F.count("*").alias("c"))
    exact = toks.groupBy("w").agg(F.count("*").alias("exact_count"))
    probes = exact.select(
        "w", "exact_count",
        F.posexplode(F.array(*[
            hash52(F.concat(F.col("w"), F.lit(f"{CMS_SALT}-{r}"))) % w
            for r in range(d)])).alias("r", "slot"))
    est = (
        probes.join(F.broadcast(grid), ["r", "slot"])
        .groupBy("w", "exact_count").agg(F.min("c").alias("cms_estimate"))
    )
    return (
        est.select(
            F.col("w").alias("token"), "exact_count", "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count"))
            .alias("overcount"))
        .orderBy(F.desc("exact_count"), "token")
        .limit(50)
    )


def bloom_membership_report(docs: DataFrame) -> DataFrame:
    """Corpus-membership report: Bloom filter built over 80% of doc
    fingerprints (doc_id % 5 != 0 — the 'already ingested' set), every
    distinct fingerprint probed against it.  The (maybe=true,
    present=false) cell is the observed false-positive count — the
    price of the O(m/64)-row filter vs the exact anti-join it
    approximates (cross_corpus_dedup's first stage)."""
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    fps = docs.select("doc_id", F.md5(norm).alias("fp"))
    train = fps.where(F.col("doc_id") % 5 != 0).select("fp")
    probe = fps.select("fp").distinct()
    return bloom_probe_stats(train, probe)


def table_profile(df: DataFrame, cols: list[str],
                  k: int = KMV_K) -> DataFrame:
    """Per-column table profile in ONE pass: row/null counts,
    lexicographic min/max, exact distinct count, and the KMV distinct
    estimate — the auto-profiling sweep a warehouse runs on ingest to
    drive join-strategy and partition-count decisions (a column whose
    distinct estimate fits a broadcast threshold changes the plan).

    Values are unpivoted to (col_name, value-string) rows so every
    statistic shares one scan; nulls are counted but excluded from
    distinct/min/max (matching SQL aggregate semantics).  The KMV
    estimate replays bit-identically in other engines (52-bit md5 →
    exact doubles, see module docstring); at production scale the exact
    distinct is the column you DROP — the sketch is the point — but
    here it doubles as the estimator's accuracy witness.

    Scale shape: one scan emitting |cols| x n skinny rows, a distinct
    exchange on (col_name, value), and a per-column rank window over
    DISTINCT values only; the same partial-aggregate k-minima swap as
    kmv_shingle_estimate applies when distinct counts are huge."""
    vals = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col(c).cast("string").alias("v"))
        for c in cols])).alias("s")).select("s.col_name", "s.v")
    stats = vals.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_nulls"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"))
    d = vals.where(F.col("v").isNotNull()).distinct() \
        .withColumn("h", hash52(F.col("v")))
    rn = Window.partitionBy("col_name").orderBy("h", "v")
    agg = (
        d.withColumn("rn", F.row_number().over(rn))
        .groupBy("col_name")
        .agg(F.count("*").alias("n_distinct"),
             F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"))
    )
    est = F.when(
        F.col("n_distinct") < k, F.col("n_distinct").cast("double")
    ).otherwise((k - 1) * TWO_52 / F.col("hk"))
    return (
        stats.join(agg, "col_name")
        .select("col_name", "n_rows", "n_nulls", "n_distinct",
                F.round(est, 4).alias("kmv_estimate"),
                "min_val", "max_val")
        .orderBy("col_name")
    )


def kmv_source_overlap(docs: DataFrame, k: int = KMV_K) -> DataFrame:
    """Mergeable-sketch set algebra across sources: per source pair,
    the KMV-estimated union, intersection (inclusion-exclusion) and
    Jaccard of the distinct word-bigram sets — the overlap matrix
    WITHOUT re-scanning text per pair.  This is why sketches beat exact
    folds at 100 TB: the per-source k-minima are built once in one
    pass, every pair statistic is then array math over 2k ints, and
    sketches from different days/clusters merge associatively (the
    union k-minima of A∪B are the k smallest of the two k-min lists).
    The exact twin (source_overlap_matrix) shuffles the full distinct
    (source, shingle) fold; accuracy vs it is pinned by a pytest.

    Scale shape: one distinct over (source, 52-bit hash) pairs, one
    bounded rank window per source, then all pair math runs on
    |sources| k-int arrays joined by a broadcast inequality —
    independent of corpus size."""
    w = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(w)
    grams = F.when(
        n >= 2,
        F.zip_with(F.slice(w, F.lit(1), n - 1), F.slice(w, F.lit(2), n - 1),
                   lambda a, b: F.concat_ws(" ", a, b)),
    ).otherwise(F.array().cast("array<string>"))
    toks = (
        docs.select("source", F.explode(grams).alias("g"))
        .select("source", hash52(F.col("g")).alias("h"))
        .distinct()
    )
    stats = toks.groupBy("source").agg(F.count("*").alias("nd"))
    rn = Window.partitionBy("source").orderBy("h")
    sk = (
        toks.withColumn("rn", F.row_number().over(rn))
        .where(F.col("rn") <= k)
        .groupBy("source").agg(F.array_sort(F.collect_list("h")).alias("hs"))
        .join(stats, "source")
    )
    a = sk.select(F.col("source").alias("src_a"), F.col("hs").alias("ha"),
                  F.col("nd").alias("nd_a"))
    b = sk.select(F.col("source").alias("src_b"), F.col("hs").alias("hb"),
                  F.col("nd").alias("nd_b"))
    # merged k-minima projected to a real column: it is referenced by
    # three downstream expressions and HOF-heavy exprs re-evaluate per
    # reference (see the winnowing/paragraph lambda note)
    p = (
        a.join(F.broadcast(b), F.col("src_a") < F.col("src_b"))
        .withColumn("mg", F.slice(
            F.array_sort(F.array_distinct(F.concat("ha", "hb"))), 1, k))
    )

    def _est(nd, hs):
        return F.when(nd < k, nd.cast("double")) \
            .otherwise((k - 1) * TWO_52 / F.element_at(hs, k))

    ea = _est(F.col("nd_a"), F.col("ha"))
    eb = _est(F.col("nd_b"), F.col("hb"))
    eu = F.when(F.size("mg") < k, F.size("mg").cast("double")) \
        .otherwise((k - 1) * TWO_52 / F.element_at(F.col("mg"), k))
    inter = F.greatest(F.lit(0.0), ea + eb - eu)
    return (
        p.select("src_a", "src_b",
                 F.round(ea, 4).alias("est_a"),
                 F.round(eb, 4).alias("est_b"),
                 F.round(eu, 4).alias("union_est"),
                 F.round(inter, 4).alias("inter_est"),
                 F.round(inter / eu, 6).alias("jaccard_est"))
        .orderBy("src_a", "src_b")
    )


def join_key_skew(df: DataFrame, key: str) -> DataFrame:
    """Pre-join skew profiler: the per-key row-count distribution of a
    prospective join/aggregation key — total keys/rows, max and exact
    p50/p99 rows-per-key, and the share of rows held by the 10 hottest
    keys in integer ppm.  This is the number that decides salting /
    AQE-skew-join settings BEFORE a 100 TB shuffle, the SQL-join
    counterpart of lsh_bucket_stats' bucket report.

    Scale shape: one partial-aggregated groupBy(key); percentiles come
    from the COUNT-OF-COUNTS histogram (rows-per-key is a tiny domain),
    so the rank arithmetic runs over bounded rows — never a corpus- or
    key-sized sort; the top-10 is TakeOrderedAndProject.  Output is one
    all-integer row."""
    per = df.groupBy(F.col(key).alias("k")).agg(F.count("*").alias("c"))
    hist = per.groupBy("c").agg(F.count("*").alias("n_keys"))
    cw = Window.partitionBy(_bwk("c")).orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    tw = Window.partitionBy(_bwk("c")).orderBy("c").rowsBetween(Window.unboundedPreceding,
                                         Window.unboundedFollowing)
    ranked = hist.select(
        "c", "n_keys",
        F.sum("n_keys").over(cw).alias("cum"),
        F.sum("n_keys").over(tw).alias("total_keys"),
        F.sum(F.col("c") * F.col("n_keys")).over(tw).alias("total_rows"))
    # exact order statistic: smallest c whose cumulative key count
    # reaches ceil(q * n) — the repo's standard percentile rule
    p50 = ranked.where(
        F.col("cum") >= F.expr("(total_keys + 1) div 2")) \
        .agg(F.min("c").alias("p50_per_key"))
    p99 = ranked.where(
        F.col("cum") >= F.expr("(99 * total_keys + 99) div 100")) \
        .agg(F.min("c").alias("p99_per_key"))
    top10 = (
        per.orderBy(F.desc("c"), F.asc("k")).limit(10)
        .agg(F.sum("c").alias("top10_rows"))
    )
    totals = per.agg(F.count("*").alias("n_keys"),
                     F.sum("c").alias("n_rows"),
                     F.max("c").alias("max_per_key"))
    from pyspark.sql.functions import broadcast
    return (
        totals.crossJoin(broadcast(p50)).crossJoin(broadcast(p99))
        .crossJoin(broadcast(top10))
        .select("n_keys", "n_rows", "max_per_key", "p50_per_key",
                "p99_per_key", "top10_rows",
                F.expr("(top10_rows * 1000000) div greatest(n_rows, 1)")
                .alias("top10_share_ppm"))
    )


HDR_SUB = 16          # linear sub-buckets per power-of-two octave
HDR_QS = (50, 90, 99)


def hdr_histogram(df: DataFrame, group: str = "source",
                  col: str = "n_chars", sub: int = HDR_SUB) -> DataFrame:
    """HDR-histogram bucketing (Tene's HdrHistogram / hybrid log-linear
    scheme, the same family as DDSketch's log buckets): bucket index =
    octave * sub + sub-bucket, where octave = floor(log2(x)) computed as
    length(bin(x)) - 1 (pure integer — no float log anywhere) and
    sub-bucket = ((x - 2^octave) * sub) div 2^octave.  Every operation is
    integer arithmetic, so the histogram replays bit-identically in any
    engine — unlike t-digest/HLL whose implementations differ per engine.

    The histogram is MERGEABLE: it is a plain (group, bucket) -> count
    table, so shard histograms union+sum into the global one — the
    property that makes one-pass percentiles possible at 100 TB (each
    executor emits its partial histogram; the shuffle moves only
    |groups| x |buckets| rows, never values).  Relative error of the
    bucket-midpoint estimator is bounded by ~1/(2*sub)."""
    x = F.col("x")
    base = (
        df.select(F.col(group).alias("g"), F.col(col).cast("long").alias("x"))
        .where(x > 0)
    )
    return (
        base
        .withColumn("i", (F.length(F.bin(x)) - 1).cast("int"))
        .withColumn("p", F.expr("shiftleft(CAST(1 AS BIGINT), i)"))
        .withColumn("j", F.expr(f"((x - p) * {sub}) div p"))
        .groupBy("g", (F.col("i") * sub + F.col("j")).alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def _hdr_bucket_mid(sub: int) -> Column:
    """Integer midpoint of a bucket's [lo, hi) value range — all-integer
    (no float division: lo+hi can exceed 2^53 where doubles lose ulps)."""
    p = f"shiftleft(CAST(1 AS BIGINT), CAST(bucket div {sub} AS INT))"
    lo = f"({p} + ((bucket % {sub}) * {p}) div {sub})"
    hi = f"({p} + (((bucket % {sub}) + 1) * {p}) div {sub})"
    return F.expr(f"({lo} + {hi}) div 2")


def hdr_quantiles_from_hist(hist: DataFrame, sub: int = HDR_SUB,
                            qs: tuple = HDR_QS) -> DataFrame:
    """Quantile estimates off an hdr_histogram: per group, the first
    bucket whose cumulative count reaches ceil(q*n/100) supplies the
    midpoint estimate.  Bucket midpoints are monotone in bucket index,
    so min-over-qualifying-buckets IS the first qualifying bucket."""
    cw = Window.partitionBy("g").orderBy("bucket") \
        .rowsBetween(Window.unboundedPreceding, 0)
    nw = Window.partitionBy("g")
    ranked = hist.select(
        "g", "bucket", "cnt",
        F.sum("cnt").over(cw).alias("cum"),
        F.sum("cnt").over(nw).alias("n"),
        _hdr_bucket_mid(sub).alias("mid"))
    aggs = [F.max("n").alias("n")]
    for q in qs:
        rank = F.expr(f"({q} * n + 99) div 100")
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("mid")))
            .alias(f"p{q}_est"))
    return ranked.groupBy("g").agg(*aggs)


def hdr_quantile_report(df: DataFrame, group: str = "source",
                        col: str = "n_chars", sub: int = HDR_SUB,
                        qs: tuple = HDR_QS) -> DataFrame:
    """Sketch-vs-exact quantile fidelity report per group: the HDR
    estimate next to the exact order statistic (same ceil-rank rule)
    with the relative error in ppm and the sketch's nominal bound
    (half a sub-bucket width, 1e6/(2*sub) ppm).

    Scale shape (100 TB): the SKETCH side is the production path — one
    partial-aggregated groupBy over (group, bucket), shuffle volume
    |groups| x ~hundreds of buckets.  The EXACT side here is the
    fidelity oracle (same pattern as ann_recall's brute-force truth):
    a per-group sort that exists to grade the sketch at gate scale and
    would not ship in the 100 TB plan."""
    est = hdr_quantiles_from_hist(
        hdr_histogram(df, group, col, sub), sub, qs)
    x = F.col("x")
    base = (
        df.select(F.col(group).alias("g"), F.col(col).cast("long").alias("x"))
        .where(x > 0)
    )
    rw = Window.partitionBy("g").orderBy("x")
    nw = Window.partitionBy("g")
    ranked = base.select(
        "g", "x",
        F.row_number().over(rw).alias("rn"),
        F.count("*").over(nw).alias("n"))
    eaggs = []
    for q in qs:
        rank = F.expr(f"({q} * n + 99) div 100")
        eaggs.append(F.max(F.when(F.col("rn") == rank, F.col("x")))
                     .alias(f"p{q}_exact"))
    exact = ranked.groupBy("g").agg(*eaggs)
    out = est.join(exact, "g")
    cols = [F.col("g").alias(group), F.col("n")]
    for q in qs:
        e, t = F.col(f"p{q}_est"), F.col(f"p{q}_exact")
        cols += [e, t,
                 F.expr(f"(abs(p{q}_est - p{q}_exact) * 1000000) "
                        f"div greatest(p{q}_exact, 1)")
                 .alias(f"p{q}_err_ppm")]
    cols.append(F.lit(1000000 // (2 * sub)).cast("long").alias("bound_ppm"))
    return out.select(*cols).orderBy(group)


def hdr_ingest_drift(corpus: DataFrame, batch: DataFrame,
                     group: str = "source", col: str = "n_chars",
                     sub: int = HDR_SUB, qs: tuple = HDR_QS) -> DataFrame:
    """Resident-sketch quantile monitoring across an ingest: merge the
    new batch's HDR histogram into the resident corpus histogram (pure
    counter addition — the sketch's mergeability IS the ingest path;
    the corpus itself is never re-read in production, its histogram is
    the tiny resident state) and report per-group quantiles before vs
    after with the absolute shift in ppm — the "did this crawl batch
    move the length distribution" alarm.

    All-integer: estimates are bucket midpoints, shifts are
    abs-difference ppm against the before value (signed integer
    division is avoided deliberately — truncation direction differs
    across engines for negatives; direction is read off the
    before/after columns)."""
    hc = hdr_histogram(corpus, group, col, sub)
    hb = hdr_histogram(batch, group, col, sub)
    merged = (
        hc.unionByName(hb)
        .groupBy("g", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    before = hdr_quantiles_from_hist(hc, sub, qs)
    after = hdr_quantiles_from_hist(merged, sub, qs)
    b = before.select(
        "g", F.col("n").alias("n_before"),
        *[F.col(f"p{q}_est").alias(f"p{q}_before") for q in qs])
    a = after.select(
        "g", F.col("n").alias("n_after"),
        *[F.col(f"p{q}_est").alias(f"p{q}_after") for q in qs])
    out = b.join(a, "g")
    cols = [F.col("g").alias(group), "n_before", "n_after"]
    for q in qs:
        cols += [F.col(f"p{q}_before"), F.col(f"p{q}_after"),
                 F.expr(f"(abs(p{q}_after - p{q}_before) * 1000000) "
                        f"div greatest(p{q}_before, 1)")
                 .alias(f"p{q}_shift_ppm")]
    return out.select(*cols).orderBy(group)
