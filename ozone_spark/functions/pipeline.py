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

from .dedup import _norm_text, _spread, hash28

# ---------------------------------------------------------------- decontam

# n-gram order for eval-set overlap checks.  Real pipelines use 8-13-gram
# spans (GPT-3 appendix C uses 13-grams); the synthetic corpus has short
# docs, so the default is 5.
DECONTAM_NGRAM = 5
# a doc is "contaminated" when at least this fraction of its distinct
# n-grams also appear in the eval set
DECONTAM_MIN_OVERLAP = 0.05


def _distinct_shingles(n: int) -> Column:
    words = F.split(_norm_text(F.col("text")), " ")
    return F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))))


def decontaminate(docs: DataFrame, eval_docs: DataFrame,
                  n: int = DECONTAM_NGRAM,
                  min_overlap: float = DECONTAM_MIN_OVERLAP) -> DataFrame:
    """Benchmark decontamination: flag training docs whose word n-grams
    overlap the eval/benchmark set (the GPT-3/PaLM n-gram-collision
    rule).

    Plan shape: the eval side is distinct n-grams of a SMALL benchmark
    suite — broadcast it; the corpus side left-joins map-side (no
    corpus shuffle), then one groupBy(doc_id) over compact flag rows.
    Per-doc totals ride along from F.size on the pre-explode array, so
    no second pass and no sizes join."""
    ev = (
        eval_docs.where(F.size(F.split(_norm_text(F.col("text")), " ")) >= n)
        .select(F.explode(_distinct_shingles(n)).alias("s"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    d = _spread(docs).where(
        F.size(F.split(_norm_text(F.col("text")), " ")) >= n)
    sh = d.select(
        "doc_id", F.size(_distinct_shingles(n)).cast("long").alias("n_sh"),
        F.explode(_distinct_shingles(n)).alias("s"))
    frac = F.col("n_hit").cast("double") / F.col("n_shingles")
    return (
        sh.join(F.broadcast(ev), "s", "left")
        .groupBy("doc_id")
        .agg(F.first("n_sh").alias("n_shingles"),
             F.count("hit").alias("n_hit"))
        .select(
            "doc_id", "n_shingles",
            F.col("n_hit").alias("n_overlapping"),
            F.round(frac, 6).alias("overlap_fraction"),
            (frac >= min_overlap).alias("contaminated"))
        .orderBy("doc_id")
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
    exchanges for the same numbers."""
    ws = F.split(_norm_text(F.col("text")), " ")
    n_words = F.size(ws)
    top_count = lambda arr: F.array_max(F.transform(  # noqa: E731
        F.array_distinct(arr),
        lambda v: F.size(F.filter(arr, lambda x: x == v))))
    bigrams = F.transform(
        F.sequence(F.lit(0), n_words - 2),
        lambda i: F.concat_ws(" ", F.slice(ws, i + 1, 2)))
    dup_frac = (n_words - F.size(F.array_distinct(ws))).cast("double") / n_words
    top_w = top_count(ws).cast("double") / n_words
    top_bg = top_count(bigrams).cast("double") / F.greatest(
        n_words - 1, F.lit(1))
    ok_dup = dup_frac <= REP_MAX_DUP_WORD_FRACTION
    ok_top_w = top_w <= REP_MAX_TOP_WORD_FRACTION
    ok_top_bg = top_bg <= REP_MAX_TOP_BIGRAM_FRACTION
    return (
        _spread(docs).where(n_words >= 2)
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
