"""Training-data pipeline operators beyond per-doc text stats: benchmark
decontamination, repetition-based quality rules, deterministic stratified
sampling, and context-window sequence packing (BASELINE.json north star;
additive to the reference, SURVEY.md §2.10).

Scale notes (100 TB):
- decontamination broadcasts the eval-set shingles — the corpus side is
  never shuffled; the only exchange is the final per-doc count groupBy
  over compact (doc_id, flag) rows.
- repetition metrics are pure per-row array expressions: map-only, zero
  shuffles, embarrassingly parallel.
- stratified sampling is a map-only filter on a portable md5-derived
  Bernoulli key: zero shuffles, and the SAME rows are selected by any
  engine that can md5 (the DuckDB oracles replay the predicate exactly).
- sequence packing windows within a shard key (source): one shuffle,
  bounded per-shard state, no global ordering.

All hot-path expressions are built-in pyspark.sql.functions — no Python
UDFs anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .dedup import bounded_window_key as _bwk

from .dedup import (_norm_text, _slot_cache, _spread, connected_components,
                    contracted_pair_graph, hash28, hash60,
                    ngram_jaccard_pairs, word_shingles)

# ---------------------------------------------------------------- decontam

# n-gram order for eval-set overlap checks.  Real pipelines use 8-13-gram
# spans (GPT-3 appendix C uses 13-grams); the synthetic corpus has short
# docs, so the default is 5.
DECONTAM_NGRAM = 5
# a doc is "contaminated" when at least this fraction of its distinct
# n-grams also appear in the eval set
DECONTAM_MIN_OVERLAP = 0.05


def _shingle_rows(df: DataFrame, n: int, keys: list[str]) -> DataFrame:
    """(keys..., s) rows of distinct word n-gram shingles per row of
    `df`; rows shorter than n words are dropped.

    The word array MUST be projected to a real column before the
    higher-order transform references it: inlining the
    regexp_replace+split into the lambda re-evaluates the
    normalization per shingle ELEMENT (Catalyst's subexpression
    elimination does not reach inside HOF lambdas) — measured 28x
    slower on the 10x stress corpus (101 s vs 3.6 s for the same
    explode).  Same shape as dedup.word_shingles."""
    ws = F.split(_norm_text(F.col("text")), " ")
    shingles = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.size("_ws") - n),
        lambda i: F.concat_ws(" ", F.slice("_ws", i + 1, n))))
    return (
        df.select(*keys, ws.alias("_ws"))
        .where(F.size("_ws") >= n)
        .select(*keys, F.explode(shingles).alias("s"))
    )


def decontaminate(docs: DataFrame, eval_docs: DataFrame,
                  n: int = DECONTAM_NGRAM,
                  min_overlap: float = DECONTAM_MIN_OVERLAP) -> DataFrame:
    """Benchmark decontamination: flag training docs whose word n-grams
    overlap the eval/benchmark set (the GPT-3/PaLM n-gram-collision
    rule).

    Plan shape: the eval side is distinct n-grams of a SMALL benchmark
    suite — broadcast it; the corpus side left-joins map-side (no
    corpus shuffle), then one groupBy(doc_id) over compact flag rows.
    Shingles are distinct per doc and the broadcast left-join is 1:1,
    so per-doc totals come free as count(*) in the aggregate — the
    shingle array is built once per row (a second F.size column would
    double the array work)."""
    ev = (
        _shingle_rows(eval_docs, n, [])
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    sh = _shingle_rows(_spread(docs), n, ["doc_id"])
    frac = F.col("n_hit").cast("double") / F.col("n_shingles")
    return (
        sh.join(F.broadcast(ev), "s", "left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shingles"),
             F.count("hit").alias("n_hit"))
        .select(
            "doc_id", "n_shingles",
            F.col("n_hit").alias("n_overlapping"),
            F.round(frac, 6).alias("overlap_fraction"),
            (frac >= min_overlap).alias("contaminated"))
        .orderBy("doc_id")
    )


def contamination_by_source(docs: DataFrame, eval_docs: DataFrame,
                            n: int = DECONTAM_NGRAM,
                            min_overlap: float = DECONTAM_MIN_OVERLAP
                            ) -> DataFrame:
    """Benchmark-contamination accounting per crawl source: aggregate
    the per-doc n-gram-collision flags (`decontaminate`) to the source
    grain — n_docs, contaminated count and rate in exact integer ppm,
    plus total overlapping-shingle volume — the table that tells a
    corpus team WHICH upstream is leaking eval data, not just that
    some documents are.

    Scale shape: rides decontaminate's broadcast-probe plan (corpus
    never shuffled for the eval join), one extra doc_id-keyed join of
    the narrow per-doc flags against (doc_id, source), one source
    aggregate."""
    flags = decontaminate(docs, eval_docs, n=n, min_overlap=min_overlap) \
        .select("doc_id", "n_overlapping",
                F.col("contaminated").cast("long").alias("c"))
    return (
        docs.select("doc_id", "source").join(flags, "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("c").alias("n_contaminated"),
             F.sum("n_overlapping").alias("overlap_shingles"))
        .select("source", "n_docs", "n_contaminated", "overlap_shingles",
                F.expr("(n_contaminated * 1000000) div n_docs")
                .alias("contamination_ppm"))
        .orderBy("source")
    )


# Bloom-filter decontamination: `decontaminate` broadcasts the eval set's
# raw shingles — fine for benchmark suites, impossible when the "eval"
# side is itself a large held-out corpus.  The scale path is a Bloom
# filter: the broadcast payload is the SET OF OCCUPIED BIT POSITIONS
# (<= m entries regardless of eval size) and each membership test is a
# map-side broadcast join per hash function — the corpus is never
# shuffled and the only exchange stays the final per-doc groupBy.
# Determinism: ONE md5 per shingle yields two independent 60-bit halves
# (hex digits 1-15 and 17-31) and the k positions derive as
# (h1 + j*h2) mod m — Kirsch-Mitzenmacher double hashing, which keeps
# the Bloom error bounds of k independent hashes at a third of the md5
# CPU (the dominant cost at corpus scale: the 10x stress run spent its
# time hashing, not joining).  Any engine with md5 replays the filter
# bit-for-bit — false positives included (the DuckDB oracle in
# registry.py reproduces them exactly).
BLOOM_M_BITS = 1 << 18
BLOOM_K = 3


def _bloom_hash_halves(col: Column) -> tuple[Column, Column]:
    h = F.md5(col)
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
            F.conv(F.substring(h, 17, 15), 16, 10).cast("long"))


def _bloom_positions(h1: Column, h2: Column, k: int, m: int) -> list[Column]:
    # h1 + (k-1)*h2 < k*2^60: no int64 overflow for k <= 4
    return [(h1 + j * h2) % m for j in range(k)]


def decontaminate_bloom(docs: DataFrame, eval_docs: DataFrame,
                        n: int = DECONTAM_NGRAM,
                        m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K,
                        min_overlap: float = DECONTAM_MIN_OVERLAP) -> DataFrame:
    """Flag training docs whose n-gram Bloom-filter hit fraction against
    the eval set crosses `min_overlap` — a superset of the exact overlap
    flags (one-sided error: false positives only, never false negatives).

    Plan shape: eval side folds to <= m distinct positions (broadcast);
    the corpus side takes k consecutive map-side broadcast left-joins
    (one per hash function, AQE keeps them in a single stage) and then
    the same single groupBy(doc_id) as the exact variant."""
    eh1, eh2 = _bloom_hash_halves(F.col("s"))
    # persisted (slot-bounded): each of the k broadcast builds would
    # otherwise re-shingle the eval corpus
    ev_pos = _slot_cache(
        _shingle_rows(eval_docs, n, [])
        .select(F.explode(F.array(
            *_bloom_positions(eh1, eh2, k, m_bits))).alias("p"))
        .distinct(), "pipeline.bloom_pos")
    # shingles are distinct within a doc and the broadcast left-joins
    # are 1:1, so per-doc totals come free as count(*) in the final
    # aggregate (no second shingle pass for a size column)
    sh = _shingle_rows(_spread(docs), n, ["doc_id"]) \
        .select("doc_id", eh1.alias("h1"), eh2.alias("h2"))
    pos = _bloom_positions(F.col("h1"), F.col("h2"), k, m_bits)
    maybe = F.lit(True)
    for j in range(k):
        pj = ev_pos.select(F.col("p").alias(f"p{j}"),
                           F.lit(1).alias(f"hit{j}"))
        sh = (sh.withColumn(f"p{j}", pos[j])
              .join(F.broadcast(pj), f"p{j}", "left"))
        maybe = maybe & F.col(f"hit{j}").isNotNull()
    frac = F.col("n_bloom_hits").cast("double") / F.col("n_shingles")
    return (
        sh.select("doc_id", maybe.cast("int").alias("maybe"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shingles"),
             F.sum("maybe").cast("long").alias("n_bloom_hits"))
        .select(
            "doc_id", "n_shingles", "n_bloom_hits",
            F.round(frac, 6).alias("bloom_fraction"),
            (frac >= min_overlap).alias("flagged"))
        .orderBy("doc_id")
    )


def source_overlap_matrix(docs: DataFrame,
                          n: int = DECONTAM_NGRAM) -> DataFrame:
    """Cross-source duplication matrix: for every pair of sources, the
    Jaccard overlap of their distinct n-gram shingle sets — the corpus
    QA report that tells a pipeline which source pairs are scraping the
    same upstream content (and therefore need cross-source dedup, not
    just per-source dedup).

    Scale shape: each shingle is folded to its 60-bit md5 hash BEFORE
    anything shuffles, so the distinct and the self-join move 8-byte
    longs instead of ~40-byte shingle strings (the 10x stress run was
    dominated by shuffling raw shingle text; hash-set Jaccard biases
    the ratio by ~|shingles|/2^60 — immaterial, and identical in both
    engines since the oracle replays the same md5).  The corpus folds
    to DISTINCT (source, hash) rows (one shuffle, text never moves),
    the self-join keys on the hash with `source_a < source_b` so each
    shared shingle expands to at most C(n_sources, 2) pairs — bounded
    by the source cardinality, never the corpus size — and the
    per-source totals are a tiny broadcast side.  Pairs with zero
    shared shingles are absent by construction (inner join) in both
    engines."""
    # persisted (slot-bounded): four consumers fan out of this table
    # (both self-join sides + both size branches) — without the persist
    # the corpus is re-shingled once per consumer
    sh = _slot_cache(
        _shingle_rows(_spread(docs), n, ["source"])
        .select("source", hash60(F.col("s")).alias("s"))
        .distinct(), "pipeline.source_overlap")
    sizes = sh.groupBy("source").agg(F.count("*").alias("n_sh"))
    shared = (
        sh.alias("a")
        .join(sh.alias("b"),
              (F.col("a.s") == F.col("b.s"))
              & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"),
                 F.col("b.source").alias("source_b"))
        .agg(F.count("*").alias("shared"))
    )
    jac = F.col("shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        shared
        .join(F.broadcast(sizes.select(F.col("source").alias("source_a"),
                                       F.col("n_sh").alias("n_a"))),
              "source_a")
        .join(F.broadcast(sizes.select(F.col("source").alias("source_b"),
                                       F.col("n_sh").alias("n_b"))),
              "source_b")
        .select("source_a", "source_b", "n_a", "n_b", "shared",
                F.round(jac, 6).alias("jaccard"))
        .orderBy("source_a", "source_b")
    )


# -------------------------------------------------------------- repetition

# Gopher-style repetition thresholds, adapted to word level (the corpus
# has no line structure): Rae et al. 2021 table A1 uses duplicate-line
# and top-n-gram character fractions; these are the word/2-gram analogs.
REP_MAX_DUP_WORD_FRACTION = 0.60
REP_MAX_TOP_WORD_FRACTION = 0.12
REP_MAX_TOP_BIGRAM_FRACTION = 0.08


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """Per-doc repetition quality rules: duplicate-word fraction, most
    frequent word share, most frequent 2-gram share, each with its
    Gopher-style threshold verdict plus the conjunction.

    Computed entirely per-row with array higher-order functions
    (distinct -> count occurrences): O(n_words * n_distinct) CPU per
    doc but ZERO shuffles — at 100 TB this is the map-only plan you
    want; the explode+groupBy alternative costs two full-corpus
    exchanges for the same numbers.  The word array is projected to a
    real column before the nested count lambdas reference it —
    inlining the regexp+split there re-evaluates the normalization per
    array ELEMENT (subexpression elimination does not reach inside HOF
    lambdas), turning the per-doc cost quadratic in practice."""
    split_ws = F.split(_norm_text(F.col("text")), " ")
    ws = F.col("ws")
    n_words = F.size(ws)
    top_count = lambda arr: F.array_max(F.transform(  # noqa: E731
        F.array_distinct(arr),
        lambda v: F.size(F.filter(arr, lambda x: x == v))))
    bigrams = F.transform(
        F.sequence(F.lit(0), n_words - 2),
        lambda i: F.concat_ws(" ", F.slice(ws, i + 1, 2)))
    dup_frac = (n_words - F.size(F.array_distinct(ws))).cast("double") / n_words
    top_w = top_count(ws).cast("double") / n_words
    top_bg = top_count(F.col("bg")).cast("double") / F.greatest(
        n_words - 1, F.lit(1))
    ok_dup = dup_frac <= REP_MAX_DUP_WORD_FRACTION
    ok_top_w = top_w <= REP_MAX_TOP_WORD_FRACTION
    ok_top_bg = top_bg <= REP_MAX_TOP_BIGRAM_FRACTION
    return (
        _spread(docs).select("doc_id", "source", split_ws.alias("ws"))
        .where(n_words >= 2)
        .select("doc_id", "source", "ws", bigrams.alias("bg"))
        .select(
            "doc_id", "source",
            n_words.cast("long").alias("n_words"),
            F.round(dup_frac, 6).alias("dup_word_fraction"),
            F.round(top_w, 6).alias("top_word_fraction"),
            F.round(top_bg, 6).alias("top_bigram_fraction"),
            ok_dup.alias("ok_dup_words"),
            ok_top_w.alias("ok_top_word"),
            ok_top_bg.alias("ok_top_bigram"),
            (ok_dup & ok_top_w & ok_top_bg).alias("passes_repetition"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------- sampling

# per-language keep rates for the gated mix-balancing example: downsample
# over-represented languages, keep the rest.  Any rates dict works.
DEFAULT_MIX_RATES: dict[str, float] = {
    "en": 0.5, "zh": 0.4, "de": 1.0, "es": 1.0, "fr": 1.0}
SAMPLE_SALT = "mix-v1"
_SAMPLE_MOD = 10_000


def sample_key(doc_id: Column, salt: str = SAMPLE_SALT) -> Column:
    """Deterministic Bernoulli key in [0, 10000): md5-derived so any
    engine reproduces the exact sample (same property as hash28's use
    in the LSH oracles).  Changing the salt redraws the sample."""
    return hash28(F.concat_ws(":", F.lit(salt), doc_id.cast("string"))) \
        % _SAMPLE_MOD


def stratified_sample(docs: DataFrame,
                      rates: dict[str, float] | None = None,
                      stratum_col: str = "lang",
                      salt: str = SAMPLE_SALT) -> DataFrame:
    """Deterministic stratified Bernoulli sample: keep a doc iff its
    md5-derived key falls under its stratum's rate.  Map-only filter —
    zero shuffles, no rand() (reproducible across engines and runs,
    unlike df.sample at scale where partition order varies)."""
    rates = DEFAULT_MIX_RATES if rates is None else rates
    rate = F.coalesce(
        *[F.when(F.col(stratum_col) == k, F.lit(v)) for k, v in rates.items()],
        F.lit(1.0))
    return (
        docs.withColumn("sample_key", sample_key(F.col("doc_id"), salt))
        .where(F.col("sample_key") < (rate * _SAMPLE_MOD).cast("int"))
        .select("doc_id", stratum_col, "source", "sample_key")
        .orderBy("doc_id")
    )


def stratified_sample_summary(docs: DataFrame,
                              rates: dict[str, float] | None = None,
                              stratum_col: str = "lang",
                              salt: str = SAMPLE_SALT) -> DataFrame:
    """Per-stratum sampling report: totals, kept counts/tokens, and the
    realized rate next to the target.  Single partial-aggregated
    groupBy; the kept flag is computed map-side from the same portable
    key as stratified_sample, so report == what the filter keeps."""
    rates = DEFAULT_MIX_RATES if rates is None else rates
    rate = F.coalesce(
        *[F.when(F.col(stratum_col) == k, F.lit(v)) for k, v in rates.items()],
        F.lit(1.0))
    kept = sample_key(F.col("doc_id"), salt) < (rate * _SAMPLE_MOD).cast("int")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    return (
        docs.select(
            F.col(stratum_col).alias("stratum"), rate.alias("target_rate"),
            kept.cast("int").alias("kept"), n_tok.alias("n_tok"))
        .groupBy("stratum")
        .agg(F.first("target_rate").alias("target_rate"),
             F.count("*").alias("n_docs"),
             F.sum("kept").alias("n_kept"),
             F.sum(F.col("kept") * F.col("n_tok")).alias("kept_tokens"),
             F.round(F.sum("kept").cast("double") / F.count("*"), 6)
             .alias("realized_rate"))
        .orderBy("stratum")
    )


# ----------------------------------------------------------------- packing

PACK_BUDGET = 256  # tokens per packed training sequence


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET,
                   shard_col: str = "source") -> DataFrame:
    """Context-window sequence packing accounting: concatenate each
    shard's docs in doc_id order and cut every `budget` tokens; a doc
    belongs to the bin where it starts.  Per (shard, bin): doc count,
    token sum, fill ratio (>1 when a doc straddles the boundary — the
    concat-then-chunk accounting used by packed pretraining loaders).

    One shuffle (window partitioned by the shard key); per-shard state
    is a running sum, so skew is bounded by shard sizing, not corpus
    size."""
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    w = Window.partitionBy("shard").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    d = docs.select(
        F.col(shard_col).alias("shard"), "doc_id", n_tok.alias("n_tok"))
    binned = d.select(
        "shard", "doc_id", "n_tok",
        ((F.sum("n_tok").over(w) - F.col("n_tok")) / budget)
        .cast("long").alias("bin"))
    return (
        binned.groupBy("shard", "bin")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tok").alias("n_tokens"),
             F.round(F.sum("n_tok").cast("double") / budget, 6)
             .alias("fill_ratio"))
        .orderBy("shard", "bin")
    )


CTX_LENGTHS = (64, 128, 256, 512, 1024, 2048, 4096, 8192)


def context_length_coverage(docs: DataFrame,
                            lengths: tuple[int, ...] = CTX_LENGTHS
                            ) -> DataFrame:
    """Context-length sizing report: for each candidate max_seq_len,
    how many documents fit whole, and how many tokens survive if longer
    docs are TRUNCATED at that length — the tokens_lost column is the
    data thrown away by each training-config choice, the number that
    picks max_seq_len (alongside pack_sequences' fill accounting for
    what happens BELOW the boundary).  Exact integers and ppm floor
    divisions throughout.

    Scale shape: ONE map + groupBy collapses the corpus to its
    token-length histogram (distinct lengths, not docs); the per-length
    sweep is a broadcast literal spine joined against that tiny
    histogram — the corpus is scanned once no matter how many candidate
    lengths are swept."""
    from pyspark.sql.functions import broadcast
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    hist = (
        docs.select(n_tok.alias("n_tok"))
        .groupBy("n_tok").agg(F.count("*").alias("n"))
    )
    spine = docs.sparkSession.createDataFrame(
        [(int(l),) for l in lengths], "ctx_len long")
    kept = F.when(F.col("n_tok") <= F.col("ctx_len"),
                  F.col("n_tok")).otherwise(F.col("ctx_len"))
    return (
        hist.crossJoin(broadcast(spine))
        .groupBy("ctx_len")
        .agg(
            F.sum("n").alias("_docs"),
            F.sum((F.col("n_tok") <= F.col("ctx_len")).cast("long")
                  * F.col("n")).alias("n_docs_fit"),
            F.sum(F.col("n_tok") * F.col("n")).alias("_tokens"),
            F.sum(kept * F.col("n")).alias("tokens_kept"))
        .select(
            "ctx_len",
            F.col("n_docs_fit"),
            F.expr("(n_docs_fit * 1000000) div _docs").alias("docs_fit_ppm"),
            "tokens_kept",
            (F.col("_tokens") - F.col("tokens_kept")).alias("tokens_lost"),
            F.expr("(tokens_kept * 1000000) div _tokens")
            .alias("tokens_kept_ppm"))
        .orderBy("ctx_len")
    )


# ------------------------------------------------------- cluster resolution

def resolve_keep_best(docs: DataFrame, threshold: float = 0.1,
                      n: int = 3) -> DataFrame:
    """Duplicate-cluster resolution with QUALITY-based canonical
    selection: near-dup pairs -> connected components -> keep the
    highest-quality member of each cluster (ties broken by lowest
    doc_id).  This is the "keep best, not first" policy real curation
    pipelines use — min-doc_id keeps whichever copy happened to be
    crawled first; keep-best retains the cleanest copy.

    Every doc appears in the output: singletons (no near-dup) are their
    own cluster and always keepers.  Scale shape: the pair graph and
    components come from the capped LSH-style machinery (never
    all-pairs); the per-cluster argmax is one window over (cluster_id)
    — clusters are near-dup groups, so partitions are tiny by
    construction."""
    from .text import quality_features
    pairs = ngram_jaccard_pairs(docs, n=n, threshold=threshold)
    cc = connected_components(pairs)
    q = quality_features(docs).select("doc_id", "quality_score")
    labeled = (
        docs.select("doc_id").join(cc, "doc_id", "left")
        .select("doc_id",
                F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"))
        .join(q, "doc_id")
    )
    w = Window.partitionBy("cluster_id")
    rk = F.row_number().over(
        Window.partitionBy("cluster_id")
        .orderBy(F.desc("quality_score"), F.asc("doc_id")))
    return (
        labeled.select(
            "doc_id", "cluster_id", "quality_score",
            F.count("*").over(w).alias("cluster_size"),
            (rk == 1).alias("is_keeper"))
        .orderBy("doc_id")
    )


def _dup_degree_report(buckets_in: DataFrame) -> DataFrame:
    """Shared tail of the two dup-degree formulations: bucket weighted
    (deg, n, q_sum) rows and report exact integer mean quality.  Input
    rows carry deg (near-dup partner count), n (docs at that deg from
    this row) and q_sum (their summed micro-quality)."""
    d = F.col("deg")
    bucket_order = (
        F.when(d == 0, 0).when(d == 1, 1).when(d <= 3, 2)
        .when(d <= 7, 3).otherwise(4))
    bucket = (
        F.when(d == 0, "0").when(d == 1, "1").when(d <= 3, "2-3")
        .when(d <= 7, "4-7").otherwise("8+"))
    return (
        buckets_in
        .select(bucket_order.cast("long").alias("bucket_order"),
                bucket.alias("dup_degree_bucket"), "n", "q_sum")
        .groupBy("bucket_order", "dup_degree_bucket")
        .agg(F.sum("n").alias("n_docs"),
             F.expr("sum(q_sum) div sum(n)").alias("mean_quality_micro"))
        .orderBy("bucket_order")
    )


def quality_by_dup_degree(docs: DataFrame,
                          threshold: float = 0.1) -> DataFrame:
    """Does duplication predict low quality on THIS corpus?  Buckets
    every document by its near-dup degree (number of capped-Jaccard
    MEMBER pair partners: 0 / 1 / 2-3 / 4-7 / 8+) and reports each
    bucket's exact mean quality in integer micro units — the report
    that decides whether near-dup dedup doubles as a quality filter
    (steeply falling means) or throws away good text (flat means),
    i.e. whether to run dedup before or after the quality gate.

    Degree stays MEMBER-grain (a doc's own copy count IS part of its
    duplication degree) but is computed ALGEBRAICALLY from the
    contracted pair graph (VERDICT r7 item 1): every member of a
    fingerprint group g has the same degree

        deg(g) = [within(g)] * (n_g - 1)  +  sum over rep partners g'
                 of n_g'

    so the member pair list is never materialized — degree lives at
    DISTINCT-TEXT grain and fans back as weights.  Copies share a
    normalized text (and therefore a degree) but NOT necessarily a raw
    text, so quality sums aggregate per fingerprint before the fan-in.
    `tests/test_invariants.py` reconciles this against the
    member-level formulation (`quality_by_dup_degree_member`) at gate
    scale; `contracted_pair_graph`'s docstring carries the
    cap-semantics proof.

    Scale shape: contraction before any quadratic stage; one map-only
    (fingerprint, quality) projection + fingerprint-keyed aggregate;
    degree is a contracted-edge aggregate; the report is a 5-row
    bucket rollup.  Mean = sum(q_micro) DIV n — exact integer, no
    distributed float sums."""
    from .dedup import _norm_text, contracted_pair_graph
    from .text import quality_score_col
    groups, cross, within = contracted_pair_graph(docs,
                                                  threshold=threshold)
    # partner copy-counts fan along the symmetrized contracted edges
    nm = groups.select(F.col("rep").alias("partner"),
                       F.col("n_members").alias("pn"))
    sym = (
        cross.select(F.col("rep_a").alias("rep"),
                     F.col("rep_b").alias("partner"))
        .unionByName(cross.select(F.col("rep_b").alias("rep"),
                                  F.col("rep_a").alias("partner")))
    )
    deg_cross = (
        sym.join(nm, "partner")
        .groupBy("rep").agg(F.sum("pn").alias("dc"))
    )
    q = (
        docs.select(F.md5(_norm_text(F.col("text"))).alias("fp"),
                    F.round(quality_score_col(F.col("text")) * 1_000_000)
                    .cast("long").alias("q_micro"))
        .groupBy("fp").agg(F.sum("q_micro").alias("q_sum"))
    )
    per_fp = (
        groups.join(q, "fp")
        .join(deg_cross, "rep", "left")
        .join(within.select("rep", F.lit(1).alias("w_pass")),
              "rep", "left")
        .select(
            (F.coalesce("dc", F.lit(0))
             + F.when(F.col("w_pass").isNotNull(),
                      F.col("n_members") - 1).otherwise(0)).alias("deg"),
            F.col("n_members").alias("n"), "q_sum")
    )
    return _dup_degree_report(per_fp)


def quality_by_dup_degree_member(docs: DataFrame,
                                 threshold: float = 0.1) -> DataFrame:
    """Member-level reference formulation of `quality_by_dup_degree`
    (the pre-r8 implementation): materializes the member pair list and
    counts partners directly.  Kept as the reconciliation oracle for
    the contracted algebra — quadratic in copy count, so not the
    production path."""
    from .text import quality_features
    pairs = ngram_jaccard_pairs(docs, threshold=threshold) \
        .select("doc_a", "doc_b")
    deg = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id").agg(F.count("*").alias("deg"))
    )
    q = quality_features(docs).select(
        "doc_id",
        F.round(F.col("quality_score") * 1_000_000).cast("long")
        .alias("q_micro"))
    return _dup_degree_report(
        q.join(deg, "doc_id", "left")
        .select(F.coalesce("deg", F.lit(0)).alias("deg"),
                F.lit(1).alias("n"), F.col("q_micro").alias("q_sum")))


def keeper_policy_audit(docs: DataFrame,
                        threshold: float = 0.1) -> DataFrame:
    """Keeper-policy audit: across all multi-member duplicate clusters,
    how often does the cheap keep-FIRST rule (min doc_id — what
    exact_duplicates/duplicate_clusters use) pick the same document the
    keep-BEST rule (highest quality_score, resolve_keep_best) would
    keep, and how much quality is left on the table when it doesn't —
    the one-row report that decides whether a corpus needs the
    quality-ranked resolution pass or can ship with the cheap rule.

    Rides `duplicate_clusters` (exact contraction BEFORE the pair
    stages) rather than the raw member-level pair list: the contraction
    is LOSSLESS here — exact copies share identical text and therefore
    identical quality, so keep-best vs keep-first can only disagree
    across DISTINCT texts, and the copy-heavy quadratic pair blowup
    buys nothing (the raw-pair formulation measured 75 s at the 10x
    90%-copies stress vs ~38 s for the contracted cluster siblings).
    It also counts exact-dup families too short to shingle, which raw
    pair CC structurally misses.

    quality_regret_micro is the exact integer sum over clusters of
    (best member quality − min-id member quality) in micro units
    (quality_score is already 6dp-rounded, so ×1e6 is exact) — no
    distributed float sums.

    Scale shape: duplicate_clusters' contracted machinery + one
    cluster-keyed aggregate plus a rank window partitioned by cluster
    (duplicate clusters are small by construction) folding to one row."""
    from .dedup import duplicate_clusters
    from .text import quality_features
    cc = duplicate_clusters(docs, threshold=threshold) \
        .select("doc_id", "cluster_id")
    q = quality_features(docs).select(
        "doc_id",
        F.round(F.col("quality_score") * 1_000_000).cast("long").alias("q"))
    m = cc.join(q, "doc_id").select(F.col("cluster_id").alias("cl"),
                                    F.col("doc_id").alias("d"), "q")
    # ONE struct-ordered aggregation per cluster instead of a rank
    # window plus three joins back onto the cluster table: the earlier
    # three-branch formulation re-executed the (lazy) cluster plan once
    # per branch — measured 83 s vs 36 s for the machinery itself at
    # the 30x probe.  max(struct(q, -d)) is keep-best (highest quality,
    # then lowest id); min(struct(d, q)) carries the keep-first
    # member's quality alongside its id (doc ids are unique, so both
    # orderings are total and replay exactly).
    joined = m.groupBy("cl").agg(
        F.count("*").alias("sz"),
        F.max(F.struct(F.col("q"), (-F.col("d")).alias("nd"))).alias("bs"),
        F.min(F.struct(F.col("d"), F.col("q"))).alias("ms"),
    ).select(
        "sz",
        (-F.col("bs.nd")).alias("best_id"), F.col("bs.q").alias("best_q"),
        F.col("ms.d").alias("minid"), F.col("ms.q").alias("min_q"),
    )
    return joined.agg(
        F.count("*").alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
        F.sum((F.col("best_id") == F.col("minid")).cast("long"))
        .alias("n_same_pick"),
        F.sum(F.col("best_q") - F.col("min_q"))
        .alias("quality_regret_micro"),
    ).select(
        "n_clusters", "n_docs", "n_same_pick",
        F.expr("(n_same_pick * 1000000) div greatest(n_clusters, 1)")
        .alias("same_pick_ppm"),
        "quality_regret_micro")


# ---------------------------------------------------------- domain mixture

def domain_mixture(docs: DataFrame,
                   stratum_col: str = "source") -> DataFrame:
    """Domain-mixture report: per-domain token share and the
    downsample-only resampling weight that moves the corpus toward a
    UNIFORM target mix (weight = min(1, target_share / token_share) —
    over-represented domains are thinned, under-represented ones kept
    whole; the standard recipe for re-weighting web crawls before
    training).

    Plan shape: one partial-aggregated groupBy(domain); the share /
    target math runs as windows over the AGGREGATE (one row per
    domain — thousands at web scale, not corpus-sized), so the
    unpartitioned window is benign by construction."""
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    agg = (
        docs.select(F.col(stratum_col).alias("domain"), n_tok.alias("n_tok"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )
    w = Window.partitionBy(_bwk("domain"))  # per-domain rows only
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    target = F.lit(1.0) / F.count("*").over(w)
    weight = F.least(F.lit(1.0), target / share)
    return (
        agg.select(
            "domain", "n_docs", "n_tokens",
            F.round(share, 6).alias("token_share"),
            F.round(target, 6).alias("target_share"),
            F.round(weight, 6).alias("mix_weight"),
            F.floor(weight * F.col("n_tokens")).cast("long")
            .alias("effective_tokens"))
        .orderBy("domain")
    )


# --------------------------------------------------------- duplicated spans

DUP_SPAN_NGRAM = 8       # span width in words (Lee et al. 2022 use 50-token
                         # substrings; the synthetic docs are short)
DUP_SPAN_MIN_DOCS = 2    # a span is "duplicated" when >= this many docs have it


def duplicated_spans(docs: DataFrame, n: int = DUP_SPAN_NGRAM,
                     min_docs: int = DUP_SPAN_MIN_DOCS) -> DataFrame:
    """Per-document duplicated-text fraction: the share of a doc's
    distinct n-word spans that also occur in other documents — the
    span-level dup metric behind exact-substring dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"),
    at n-gram granularity instead of suffix arrays.

    Scale shape: spans are counted, never paired — distinct spans per
    doc (map-side), one groupBy(span-hash) for document frequency, one
    join back, one groupBy(doc_id).  Linear in corpus size; no
    quadratic bucket explosion, so no hot-span cap is needed (a span
    shared by a million docs is one counter, not 10^12 pairs).  The
    span key is the md5-derived 60-bit hash (same width as its
    destructive sibling remove_duplicate_spans): with ~2^28 bits the
    repo's own birthday math (see the hash60 note below at
    remove_duplicate_spans) makes collisions CERTAIN at production span
    counts, and a collision here silently inflates dup_fraction —
    metric corruption the gate cannot see because the oracle replays
    the same hash.  60 bits keeps the expected collision count < 1 up
    to ~10^9 distinct spans."""
    sh = word_shingles(docs, n=n).select(
        "doc_id", hash60(F.col("shingle")).alias("h"))
    df_counts = sh.groupBy("h").agg(F.count("*").alias("span_df"))
    dup_frac = F.col("n_dup_spans").cast("double") / F.col("n_spans")
    return (
        sh.join(df_counts, "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_spans"),
             F.sum((F.col("span_df") >= min_docs).cast("long"))
             .alias("n_dup_spans"))
        .select("doc_id", "n_spans", "n_dup_spans",
                F.round(dup_frac, 6).alias("dup_fraction"),
                (dup_frac >= 0.5).alias("mostly_duplicated"))
        .orderBy("doc_id")
    )


# ------------------------------------------------------ shards & splits

SPLIT_SALT = "split-v1"
SHARD_SALT = "shard-v1"
N_SHARDS = 8
# cumulative per-mille cuts of the md5 key space: [0,9800) train,
# [9800,9900) val, [9900,10000) test
SPLIT_CUTS = (("train", 9800), ("val", 9900), ("test", 10_000))


def training_shards(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """Deterministic train/val/test split + global-shuffle shard and
    position assignment: every doc gets (split, shard, position) from
    md5-derived keys — reproducible across engines/runs/cluster sizes,
    unlike orderBy(rand()).  Position = rank of the doc's shuffle key
    within its (split, shard), i.e. the order a training loader reads
    the shard in.

    Map-only key derivation + ONE window shuffle partitioned by
    (split, shard) — at 100 TB the shard count is sized so each
    partition's sort fits an executor (n_shards scales with data, the
    per-shard sort is the only non-map work)."""
    split_key = sample_key(F.col("doc_id"), SPLIT_SALT)
    shuffle_key = hash28(
        F.concat_ws(":", F.lit(SHARD_SALT), F.col("doc_id").cast("string")))
    split = F.when(split_key < SPLIT_CUTS[0][1], SPLIT_CUTS[0][0]) \
        .when(split_key < SPLIT_CUTS[1][1], SPLIT_CUTS[1][0]) \
        .otherwise(SPLIT_CUTS[2][0])
    keyed = docs.select(
        "doc_id", split.alias("split"),
        (shuffle_key % n_shards).alias("shard"),
        shuffle_key.alias("skey"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"))
    pos = F.row_number().over(
        Window.partitionBy("split", "shard").orderBy("skey", "doc_id"))
    return (
        keyed.select("doc_id", "split", "shard", "n_tok",
                     pos.alias("position"))
        .orderBy("doc_id")
    )


def shard_balance(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """Per-split shard-balance report over the training_shards
    assignment: shard count, min/max/total token loads and the
    max-vs-min imbalance in exact integer ppm — the number that decides
    whether the md5 global shuffle spreads tokens evenly enough that no
    data-parallel rank starves (a skewed shard IS a straggler epoch).

    Scale shape: rides training_shards (one window exchange), then a
    (split, shard) aggregate and a |splits|-row rollup."""
    per_shard = (
        training_shards(docs, n_shards)
        .groupBy("split", "shard")
        .agg(F.sum("n_tok").alias("tok"))
    )
    return (
        per_shard.groupBy("split")
        .agg(F.count("*").alias("n_shards"),
             F.min("tok").alias("min_tokens"),
             F.max("tok").alias("max_tokens"),
             F.sum("tok").alias("total_tokens"))
        .select("split", "n_shards", "min_tokens", "max_tokens",
                "total_tokens",
                F.expr("((max_tokens - min_tokens) * 1000000)"
                       " div max_tokens").alias("imbalance_ppm"))
        .orderBy("split")
    )


def approx_group_counts(docs: DataFrame, rate: float = 0.1,
                        stratum_col: str = "lang",
                        salt: str = "htsample-v1") -> DataFrame:
    """Sample-first aggregation with its error audit: per group, the
    Horvitz-Thompson scale-up (sampled_count / rate) from a
    deterministic md5 Bernoulli sample next to the exact count — the
    pattern that turns a 100 TB group-by into a 10 TB one when ±3% is
    acceptable, with the fixture-scale exact column proving the
    estimator honest (production drops it; the estimate is the point).

    Determinism: the sample is the md5-keyed Bernoulli from
    stratified_sample (any engine replays the exact member set), so the
    'estimate' is reproducible — no rand() in the plan.

    Scale shape: one scan; the sample filter is map-only; both counts
    fold in the same group exchange via conditional aggregation."""
    threshold = int(rate * _SAMPLE_MOD)
    in_sample = sample_key(F.col("doc_id"), salt) < threshold
    est = F.sum(in_sample.cast("long")) / rate
    return (
        docs.groupBy(stratum_col)
        .agg(F.count("*").alias("exact_docs"),
             F.sum(in_sample.cast("long")).alias("sampled_docs"),
             F.round(est, 4).alias("ht_estimate"),
             F.round(F.abs(est - F.count("*")) / F.count("*"), 6)
             .alias("rel_err"))
        .orderBy(stratum_col)
    )


NEAR_LEAK_THRESHOLD = 0.5


def _split_col() -> Column:
    """The standard md5 split rule as a Column over doc_id."""
    split_key = sample_key(F.col("doc_id"), SPLIT_SALT)
    return F.when(split_key < SPLIT_CUTS[0][1], SPLIT_CUTS[0][0]) \
        .when(split_key < SPLIT_CUTS[1][1], SPLIT_CUTS[1][0]) \
        .otherwise(SPLIT_CUTS[2][0])


def near_dup_leakage(docs: DataFrame,
                     threshold: float = NEAR_LEAK_THRESHOLD) -> DataFrame:
    """NEAR-duplicate train/val/test leakage — the contamination
    split_leakage's exact fingerprints structurally miss (Lee et al.
    2022: models memorize near-copies, so a test doc whose 0.9-Jaccard
    twin sits in train is still leaked even though no fingerprint
    matches).  MEMBER pairs whose endpoints land in DIFFERENT splits of
    the standard md5 rule, rolled up per unordered split pair: pair
    count and distinct leaked docs on each side.

    Member-grain numbers are computed ALGEBRAICALLY from the contracted
    pair graph (VERDICT r7 item 1) — the member pair list is never
    materialized.  With cnt_g(s) = copies of fingerprint group g in
    split s:

      * pair counts: a cross-text rep pair (a, b) contributes
        cnt_a(s) * cnt_b(s') to cell (s, s') for s != s' (both
        orientations); a within-group pass contributes
        cnt_g(s) * cnt_g(s') for s < s';
      * distinct docs: a doc in split s counts for cell (s, s') iff
        its group has ANY partner copy in s' — within (cnt_g(s') >= 1
        and the within jaccard passes) or via any rep neighbor with
        presence in s' — so each side's doc count is a sum of cnt over
        (group, has_partner-in-other-split) indicators.

    `tests/test_invariants.py` reconciles this against the
    member-level formulation (`near_dup_leakage_member`) at gate scale;
    `contracted_pair_graph`'s docstring carries the cap-semantics
    proof.

    Scale shape: contraction before any quadratic stage; split labels
    are map-only md5 keys aggregated to |splits|-bounded per-group
    counts; every subsequent join is edge-list- or group-count-sized;
    the rollup grain is bounded by |splits|^2."""
    from .dedup import contracted_pair_graph
    groups, cross, within = contracted_pair_graph(docs,
                                                  threshold=threshold)
    splitcnt = (
        docs.select(F.md5(_norm_text(F.col("text"))).alias("fp"),
                    _split_col().alias("split"))
        .groupBy("fp", "split").agg(F.count("*").alias("cnt"))
        .join(groups.select("fp", "rep"), "fp")
        .select("rep", "split", "cnt")
    )
    splitcnt = _slot_cache(splitcnt, "leakage_splitcnt")
    ca = splitcnt.select(F.col("rep").alias("rep_a"),
                         F.col("split").alias("sa"),
                         F.col("cnt").alias("cnt_a"))
    cb = splitcnt.select(F.col("rep").alias("rep_b"),
                         F.col("split").alias("sb"),
                         F.col("cnt").alias("cnt_b"))
    cross_cells = (
        cross.join(ca, "rep_a").join(cb, "rep_b")
        .where(F.col("sa") != F.col("sb"))
        .select(F.least("sa", "sb").alias("split_lo"),
                F.greatest("sa", "sb").alias("split_hi"),
                (F.col("cnt_a") * F.col("cnt_b")).alias("w"))
    )
    wa = splitcnt.select(F.col("rep").alias("w_rep"),
                         F.col("split").alias("sa"),
                         F.col("cnt").alias("cnt_a"))
    wb = splitcnt.select(F.col("rep").alias("w_rep"),
                         F.col("split").alias("sb"),
                         F.col("cnt").alias("cnt_b"))
    within_cells = (
        within.select(F.col("rep").alias("w_rep"))
        .join(wa, "w_rep").join(wb, "w_rep")
        .where(F.col("sa") < F.col("sb"))
        .select(F.col("sa").alias("split_lo"),
                F.col("sb").alias("split_hi"),
                (F.col("cnt_a") * F.col("cnt_b")).alias("w"))
    )
    n_pairs = (
        cross_cells.unionByName(within_cells)
        .groupBy("split_lo", "split_hi").agg(F.sum("w").alias("n_pairs"))
    )
    # has_partner(group, split'): some OTHER doc of the pair graph sits
    # in split' — via a rep neighbor's split presence, or via a sibling
    # copy when the within-group jaccard passes
    sym = (
        cross.select(F.col("rep_a").alias("rep"),
                     F.col("rep_b").alias("partner"))
        .unionByName(cross.select(F.col("rep_b").alias("rep"),
                                  F.col("rep_a").alias("partner")))
    )
    nbr_presence = (
        sym.join(splitcnt.select(F.col("rep").alias("partner"),
                                 F.col("split").alias("psplit")), "partner")
        .select("rep", "psplit")
    )
    self_presence = (
        within.select("rep")
        .join(splitcnt.select("rep", F.col("split").alias("psplit")),
              "rep")
        .select("rep", "psplit")
    )
    has_partner = nbr_presence.unionByName(self_presence).distinct()
    docside = (
        splitcnt.join(has_partner, "rep")
        .where(F.col("split") != F.col("psplit"))
        .select(F.least("split", "psplit").alias("split_lo"),
                F.greatest("split", "psplit").alias("split_hi"),
                F.when(F.col("split") < F.col("psplit"), F.col("cnt"))
                .otherwise(0).alias("lo_docs"),
                F.when(F.col("split") > F.col("psplit"), F.col("cnt"))
                .otherwise(0).alias("hi_docs"))
        .groupBy("split_lo", "split_hi")
        .agg(F.sum("lo_docs").alias("n_docs_lo"),
             F.sum("hi_docs").alias("n_docs_hi"))
    )
    return (
        n_pairs.join(docside, ["split_lo", "split_hi"])
        .select("split_lo", "split_hi", "n_pairs",
                "n_docs_lo", "n_docs_hi")
        .orderBy("split_lo", "split_hi")
    )


def near_dup_leakage_member(docs: DataFrame,
                            threshold: float = NEAR_LEAK_THRESHOLD
                            ) -> DataFrame:
    """Member-level reference formulation of `near_dup_leakage` (the
    pre-r8 implementation): materializes the member pair list and
    counts pairs/docs directly.  Kept as the reconciliation oracle for
    the contracted algebra — quadratic in copy count, so not the
    production path."""
    pairs = ngram_jaccard_pairs(docs, threshold=threshold) \
        .select("doc_a", "doc_b")
    sp = docs.select("doc_id", _split_col().alias("split"))
    joined = (
        pairs.join(sp.select(F.col("doc_id").alias("doc_a"),
                             F.col("split").alias("sa")), "doc_a")
        .join(sp.select(F.col("doc_id").alias("doc_b"),
                        F.col("split").alias("sb")), "doc_b")
        .where(F.col("sa") != F.col("sb"))
    )
    # orient each pair (lo split, hi split) and carry the doc on each
    # side so distinct-doc counts are per split, not per pair slot
    lo_first = F.col("sa") < F.col("sb")
    oriented = joined.select(
        F.least("sa", "sb").alias("split_lo"),
        F.greatest("sa", "sb").alias("split_hi"),
        F.when(lo_first, F.col("doc_a")).otherwise(F.col("doc_b"))
        .alias("doc_lo"),
        F.when(lo_first, F.col("doc_b")).otherwise(F.col("doc_a"))
        .alias("doc_hi"))
    return (
        oriented.groupBy("split_lo", "split_hi")
        .agg(F.count("*").alias("n_pairs"),
             F.countDistinct("doc_lo").alias("n_docs_lo"),
             F.countDistinct("doc_hi").alias("n_docs_hi"))
        .orderBy("split_lo", "split_hi")
    )


def split_leakage(docs: DataFrame) -> DataFrame:
    """Train/val/test leakage audit: for every content fingerprint, the
    SET of splits its copies landed in — a fingerprint spanning splits
    means the model is evaluated on text it trained on verbatim (the
    self-inflicted contamination `decontaminate` can't see because both
    sides are your own corpus).  One row per observed split-set with
    fingerprint/doc counts and the leak flag; clean splits still report
    their singleton rows, so an empty-leak run is distinguishable from
    a broken one.

    Scale shape: the split is the same map-only md5 rule as
    training_shards (no join against it needed); the audit is one
    fingerprint-keyed aggregate folding splits with collect_set
    (bounded by |splits| = 3) and one 2^|splits|-row rollup."""
    split_key = sample_key(F.col("doc_id"), SPLIT_SALT)
    split = F.when(split_key < SPLIT_CUTS[0][1], SPLIT_CUTS[0][0]) \
        .when(split_key < SPLIT_CUTS[1][1], SPLIT_CUTS[1][0]) \
        .otherwise(SPLIT_CUTS[2][0])
    fp = F.md5(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""))
    per_fp = (
        docs.select(split.alias("split"), fp.alias("fp"))
        .groupBy("fp")
        .agg(F.array_join(F.array_sort(F.collect_set("split")), "+")
             .alias("split_set"),
             F.count("*").alias("n_docs"))
    )
    return (
        per_fp.groupBy("split_set")
        .agg(F.count("*").alias("n_fingerprints"),
             F.sum("n_docs").alias("n_docs"))
        .select("split_set", "n_fingerprints", "n_docs",
                F.col("split_set").contains("+").alias("is_leak"))
        .orderBy("split_set")
    )


# ------------------------------------------------------ cross-corpus dedup

CROSS_EXISTING_RE = r"^src[0-9]$"   # fixture: src0-9 = existing corpus,
                                    # src10-19 = newly crawled batch


def cross_corpus_dedup(docs: DataFrame, threshold: float = 0.1,
                       n: int = 3, max_bucket: int = 200) -> DataFrame:
    """Incremental-ingest dedup: check each NEW document against the
    EXISTING corpus — exact (normalized fingerprint seen before) and
    near (n-gram Jaccard vs any existing doc >= threshold) — and emit a
    keep/drop verdict per new doc.  This is the steady-state shape of a
    production pipeline: the corpus is deduped once, then every
    incoming crawl batch is checked against it, never against itself.

    Scale shape: the batch side is SMALL relative to the corpus — its
    fingerprint/shingle sets join against the corpus index without ever
    shuffling the corpus text.  Pair generation is restricted to
    new x existing on shared shingles (inverted-index join, saturated
    shingles capped like `ngram_jaccard_pairs`); exact check is one
    semi-join on the 16-byte fingerprint."""
    is_existing = F.col("source").rlike(CROSS_EXISTING_RE)
    fp = F.md5(_norm_text(F.col("text")))
    existing, new = docs.where(is_existing), docs.where(~is_existing)

    exact_hit = (
        new.select("doc_id", fp.alias("fp"))
        .join(existing.select(fp.alias("fp")).distinct(), "fp", "left_semi")
        .select("doc_id", F.lit(True).alias("exact_dup"))
    )

    # shingles derived per side so each scan prunes to its side's rows
    sh_ex = word_shingles(existing, n=n)
    sh_new = word_shingles(new, n=n)
    sizes_ex = sh_ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sizes_new = sh_new.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    hot = (
        sh_ex.select("shingle").union(sh_new.select("shingle"))
        .groupBy("shingle").agg(F.count("*").alias("df"))
        .where(F.col("df") <= max_bucket)
        .select("shingle")
    )
    common = (
        sh_new.join(hot, "shingle", "left_semi").withColumnRenamed("doc_id", "new_id")
        .join(sh_ex.withColumnRenamed("doc_id", "ex_id"), "shingle")
        .groupBy("new_id", "ex_id")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("sn.n_sh") + F.col("se.n_sh") - F.col("n_common"))
    best = (
        common
        .join(sizes_new.alias("sn"),
              F.col("new_id") == F.col("sn.doc_id"))
        .join(sizes_ex.alias("se"), F.col("ex_id") == F.col("se.doc_id"))
        .select(F.col("new_id").alias("doc_id"), jac.alias("j"))
        .where(F.col("j") >= threshold)
        .groupBy("doc_id").agg(F.round(F.max("j"), 6).alias("best_jaccard"))
    )
    verdict = F.when(F.col("exact_dup"), "exact_dup") \
        .when(F.col("best_jaccard").isNotNull(), "near_dup") \
        .otherwise("unique")
    return (
        new.select("doc_id", "source")
        .join(exact_hit, "doc_id", "left")
        .join(best, "doc_id", "left")
        .select("doc_id", "source",
                F.coalesce("exact_dup", F.lit(False)).alias("exact_dup"),
                "best_jaccard", verdict.alias("verdict"))
        .orderBy("doc_id")
    )


# ------------------------------------------- exact-substring span removal

SPAN_REMOVE_NGRAM = 8   # removal span width in words (Lee et al. 2022 use
                        # 50 BPE tokens; the synthetic docs are short)


def remove_duplicate_spans(docs: DataFrame,
                           n: int = SPAN_REMOVE_NGRAM) -> DataFrame:
    """Exact-substring dedup that REWRITES the text (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"), at
    word granularity instead of suffix arrays: every n-word span that
    occurs in >= 2 documents is removed from every document except the
    lowest-doc_id one containing it (keep-first); surviving words are
    re-joined in order.  `duplicated_spans` measures the overlap — this
    operator performs the deletion.

    Per doc: token total, tokens removed, removed fraction, and the md5
    fingerprint of the cleaned text (the full rewritten text would be
    the payload column in production; the fingerprint keeps gate rows
    scalar while still value-checking every byte of the rewrite).

    Scale shape: spans carry (doc_id, start) and are hashed to 60-bit
    ints (28 bits would see birthday collisions once the corpus holds
    ~19k distinct spans — certain at scale — and a collision here
    DELETES real text; 60 bits pushes the expected first collision past
    ~1e9 distinct spans while staying BIGINT-replayable in any engine
    with md5); one groupBy(h) computes (doc-frequency, keeper) per span and
    the join back reuses that exchange; covered positions explode n
    rows per REMOVABLE occurrence only (duplicated text volume, not
    corpus volume); the rebuild is one groupBy(doc_id) whose state is
    the document's own tokens.  Everything is linear — spans are
    counted and subtracted, never paired — and all expressions are
    built-in (codegen'd); the md5-derived span hash is replayed
    bit-exactly by the DuckDB oracle."""
    words = F.split(_norm_text(F.col("text")), " ")
    d = _spread(docs).select("doc_id", words.alias("ws"))
    # (doc_id, start, h): every span occurrence with its 1-based start
    spans = (
        d.where(F.size("ws") >= n)
        .select("doc_id", F.posexplode(F.transform(
            F.sequence(F.lit(1), F.size("ws") - n + 1),
            lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, n))))
            .alias("off", "span"))
        .select("doc_id", (F.col("off") + 1).alias("start"),
                hash60(F.col("span")).alias("h"))
    )
    stats = spans.groupBy("h").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("keeper_doc_id"))
    covered = (
        spans.join(stats, "h")
        .where((F.col("n_docs") >= 2)
               & (F.col("doc_id") > F.col("keeper_doc_id")))
        .select("doc_id", F.explode(
            F.sequence(F.col("start"), F.col("start") + n - 1)).alias("pos"))
        .distinct()
    )
    toks = d.select("doc_id", F.posexplode("ws").alias("p0", "tok")).select(
        "doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    flagged = toks.join(
        covered.withColumn("cov", F.lit(True)), ["doc_id", "pos"], "left")
    kept_struct = F.when(F.col("cov").isNull(),
                         F.struct(F.col("pos"), F.col("tok")))
    n_removed = F.sum(F.col("cov").isNotNull().cast("long"))
    return (
        flagged.groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"),
             n_removed.alias("n_removed"),
             F.md5(F.concat_ws(" ", F.transform(
                 F.array_sort(F.collect_list(kept_struct)),
                 lambda s: s["tok"]))).alias("cleaned_fp"))
        .select("doc_id", "n_tokens", "n_removed",
                F.round(F.col("n_removed").cast("double")
                        / F.col("n_tokens"), 6).alias("frac_removed"),
                "cleaned_fp")
        .orderBy("doc_id")
    )


WATERFILL_EPOCH_CAP = 4   # Muennighoff et al. 2023: ~4 epochs before decay
WATERFILL_BUDGET_X = 3    # token budget = 3x the corpus (forces saturation)
SHARD_LEAK_SALT = "shardleak-v1"


def mixture_waterfill(docs: DataFrame,
                      epoch_cap: int = WATERFILL_EPOCH_CAP,
                      budget_x: int = WATERFILL_BUDGET_X) -> DataFrame:
    """Balanced-mixture token allocation with per-cell epoch caps via
    exact water-filling — the multilingual rebalancing computation: give
    every language an equal share of the training-token budget, EXCEPT
    that no language may be repeated past `epoch_cap` epochs (the
    data-constrained scaling rule of Muennighoff et al. 2023), and
    re-distribute what the capped languages can't absorb to the rest.

    Closed-form waterfill instead of an iterative redistribution loop:
    sort cells by capacity ascending; cell r is saturated iff
    cap_r * (n - r) <= B - C_r (C_r = cumulative capacity through r) —
    the predicate is monotone along the sort (f(r) - f(r+1) =
    (n - r)(cap_{r+1} - cap_r) >= 0), so the saturated set is a PREFIX
    and one window pass finds it.  Everything is integer arithmetic
    (cross-multiplied comparisons, floor-div shares), so the allocation
    replays bit-identically in any engine.

    Scale shape (100 TB): one partial-aggregated groupBy(lang) over the
    corpus; the waterfill itself runs on the LANGUAGE-cardinality table
    (dozens of rows) — the unpartitioned windows are bounded by the
    language vocabulary, never by data."""
    cells = (
        docs.groupBy("lang")
        .agg(F.sum(F.size(F.split(F.col("text"), " ")).cast("long"))
             .alias("toks"))
        .withColumn("cap", F.col("toks") * epoch_cap)
    )
    tot = cells.agg(F.sum("toks").alias("tt"), F.count("*").alias("n"))
    rw = Window.partitionBy(_bwk("lang")).orderBy("cap", "lang")
    cw = rw.rowsBetween(Window.unboundedPreceding, 0)
    j = (
        cells.crossJoin(F.broadcast(tot))
        .select("lang", "toks", "cap", "n",
                (F.lit(budget_x) * F.col("tt")).alias("b"),
                F.row_number().over(rw).alias("r"),
                F.sum("cap").over(cw).alias("c"))
        .withColumn(
            "saturated",
            (F.col("cap") * (F.col("n") - F.col("r"))
             <= F.col("b") - F.col("c")).cast("int"))
    )
    sat = j.agg(F.sum("saturated").alias("rstar"),
                F.sum(F.col("cap") * F.col("saturated")).alias("csat"))
    return (
        j.crossJoin(F.broadcast(sat))
        .withColumn("share",
                    F.expr("(b - csat) div greatest(n - rstar, 1)"))
        .withColumn("allocated",
                    F.when(F.col("saturated") == 1, F.col("cap"))
                    .otherwise(F.col("share")))
        .select("lang", "toks", "cap", "allocated",
                F.expr("(allocated * 1000000) div greatest(toks, 1)")
                .alias("epochs_ppm"),
                F.col("saturated").cast("long").alias("saturated"))
        .orderBy("lang")
    )


def temperature_mixture(docs: DataFrame) -> DataFrame:
    """Temperature-based multilingual sampling report — the p^alpha
    rebalance (alpha = 1/2) of XLM-R-style pretraining (Conneau et al.
    2020, public): sampling share q_l proportional to sqrt(tokens_l),
    which boosts low-resource languages without flattening the mix
    entirely.  Complements mixture_waterfill: the waterfill answers
    "equal shares under epoch caps", temperature answers "smooth
    rebalance by a power law".  Columns per language: doc/token counts,
    the natural token share, the tempered share, and the boost ratio
    (tempered over natural) — all exact integer ppm.

    Determinism: alpha is fixed at 1/2 ON PURPOSE — IEEE-754 sqrt is
    correctly rounded (bit-identical in Spark and DuckDB, unlike
    general pow), and floor(sqrt(tokens)) then re-enters exact integer
    arithmetic, so the whole report replays bit-identically with no
    float-boundary hazard.  Token counts stay below 2^52, inside
    double's exact-integer range.

    Scale shape: ONE partial-aggregated groupBy(lang) over the corpus;
    everything after runs on the language-cardinality table with the
    totals folded in as a broadcast one-row scalar (the sanctioned
    crossJoin)."""
    cells = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.size(F.split(F.col("text"), " ")).cast("long"))
             .alias("tokens"))
        .withColumn("w", F.floor(F.sqrt(F.col("tokens"))).cast("long"))
    )
    tot = cells.agg(F.sum("tokens").alias("tt"), F.sum("w").alias("tw"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "lang", "n_docs", "tokens",
            F.expr("(tokens * 1000000) div greatest(tt, 1)")
            .alias("natural_ppm"),
            F.expr("(w * 1000000) div greatest(tw, 1)").alias("temp_ppm"))
        .withColumn("boost_ppm", F.expr(
            "(temp_ppm * 1000000) div greatest(natural_ppm, 1)"))
        .orderBy("lang")
    )


def shard_dedup_leakage(docs: DataFrame, n: int = DUP_SPAN_NGRAM,
                        n_shards: int = N_SHARDS) -> DataFrame:
    """Dedup-aware sharding audit at span grain: when documents sharing
    duplicated n-word spans are scattered across training shards,
    shard-local exact-substring dedup (the only dedup that runs inside
    a shard at load time) cannot see the repetition and every shard
    re-teaches the same text.  Compare two doc->shard rules by the
    share of duplicated-span pairs they leave CROSS-shard:

      doc_hash — the naive md5(doc_id) assignment (training_shards'
        rule family): duplication lands across shards ~uniformly;
      span_locality — shard = (min span hash) mod S, one-permutation
        MinHash: two docs share their minimum span hash with
        probability equal to their span-set Jaccard (the MinHash
        collision property), so near-identical docs co-locate and the
        cross-shard leak collapses, at zero extra machinery beyond the
        span hashes the dedup family already computes.

    Counting is algebraic, never pairwise-materialized: per span hash h
    held by n docs, total pairs = C(n,2) and same-shard pairs =
    sum_shard C(n_s,2), so cross = C(n,2) - sum C(n_s,2) — counts per
    (h, shard), no h-sized blow-up even for a span in a million docs.

    Scale shape: the span table is the map-only word_shingles stage;
    one window per doc_id for the min hash; two groupBys over
    (h[, shard]).  Document text is hashed once and never shuffled."""
    sh = word_shingles(docs, n=n).select(
        "doc_id", hash60(F.col("shingle")).alias("h")).distinct()
    # the distinct runs POST-hash on (doc_id, h), term-for-term the
    # oracle's SELECT DISTINCT doc_id, h — pre-hash string dedup would
    # diverge on a (negligible but possible) within-doc 60-bit
    # collision (ADVICE r8)
    mh = F.min("h").over(Window.partitionBy("doc_id"))
    keyed = sh.select(
        "h",
        F.pmod(hash28(F.concat_ws(
            ":", F.lit(SHARD_LEAK_SALT), F.col("doc_id").cast("string"))),
            F.lit(n_shards)).alias("shard_doc"),
        F.pmod(mh, F.lit(n_shards)).alias("shard_loc"))

    def leak(shard_col: str, label: str) -> DataFrame:
        per_shard = keyed.groupBy("h", shard_col).agg(
            F.count("*").alias("ns"))
        per_h = per_shard.groupBy("h").agg(
            F.sum("ns").alias("nh"),
            F.sum(F.expr("ns * (ns - 1) div 2")).alias("same_pairs"))
        dup = per_h.where(F.col("nh") > 1)
        return dup.agg(
            F.count("*").alias("n_dup_spans"),
            F.coalesce(F.sum(F.expr("nh * (nh - 1) div 2")), F.lit(0))
            .alias("dup_pairs"),
            F.coalesce(
                F.sum(F.expr("nh * (nh - 1) div 2") - F.col("same_pairs")),
                F.lit(0)).alias("cross_shard_pairs"),
        ).select(
            F.lit(label).alias("strategy"),
            "n_dup_spans", "dup_pairs", "cross_shard_pairs",
            F.expr("(cross_shard_pairs * 1000000) div greatest(dup_pairs, 1)")
            .alias("cross_ppm"))

    return (
        leak("shard_doc", "doc_hash")
        .unionByName(leak("shard_loc", "span_locality"))
        .orderBy("strategy")
    )
