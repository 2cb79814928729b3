"""Text-analysis operators for the training-data pipeline surface
(BASELINE.json north star; additive to the reference, SURVEY.md §2.10).

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen'd) — no Python UDFs.  Token model: documents are
single-space-separated word streams; token = split on spaces.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

STOPWORDS = ["the", "a", "of", "and", "to", "in"]

# tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic; scored by hit count, ties broken by profile order.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "and"],
    "de": ["der", "und", "die"],
    "es": ["el", "la", "los"],
    "fr": ["le", "et", "les"],
}


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


# BPE-ish tokenization: word pieces + digit runs + punctuation singles —
# the cheap regex approximation of a subword tokenizer's pre-tokenizer
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)).cast("long")


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace vs BPE-ish token counts per doc (training-data token
    accounting surface)."""
    t = F.col("text")
    return docs.select(
        "doc_id", "lang",
        token_count(t).alias("ws_tokens"),
        bpe_ish_token_count(t).alias("bpe_ish_tokens"),
        F.round(bpe_ish_token_count(t).cast("double")
                / F.greatest(token_count(t), F.lit(1)), 6).alias("fertility"),
    )


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS)])
    return F.size(F.filter(tokens(text), lambda w: F.array_contains(sw, w))).cast("long")


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-document quality signals: length, token count, mean word
    length, stopword ratio, and a composite score in [0,1]."""
    t = F.col("text")
    n_tok = token_count(t)
    n_sw = stopword_count(t)
    mean_word_len = F.round((F.length(t) - n_tok + 1).cast("double") / n_tok, 6)
    raw_ratio = n_sw.cast("double") / n_tok
    sw_ratio = F.round(raw_ratio, 6)
    # score uses the *unrounded* ratio: rounding first can park the sum on an
    # exact .5 boundary where Spark(HALF_UP) and DuckDB disagree
    score = F.round(
        F.least(n_tok.cast("double") / 64.0, F.lit(1.0)) * 0.5
        + F.least(raw_ratio * 5.0, F.lit(1.0)) * 0.5, 6)
    return docs.select(
        "doc_id", "lang", "source",
        F.length(t).cast("long").alias("n_chars_measured"),
        n_tok.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        sw_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def text_stats(docs: DataFrame) -> DataFrame:
    """Corpus rollup per (lang, source): doc/token/char totals."""
    t = F.col("text")
    return (
        docs.select("lang", "source", token_count(t).alias("n_tok"),
                    F.length(t).cast("long").alias("n_ch"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_ch").alias("total_chars"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        )
        .orderBy("lang", "source")
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-profile language-ID heuristic; emits the per-(label,
    prediction) confusion counts.  (The fixture's lang labels are random
    word-salad, so this checks determinism of the classifier, not
    accuracy.)"""
    t = F.col("text")
    scores = [stopword_count(t, ws).alias(f"hits_{lang}")
              for lang, ws in LANG_PROFILES.items()]
    scored = docs.select("doc_id", "lang", *scores)
    langs = list(LANG_PROFILES)
    best = F.lit(langs[0])
    best_hits = F.col(f"hits_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"hits_{lang}") > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, F.col(f"hits_{lang}")).otherwise(best_hits)
    pred = F.when(best_hits > 0, best).otherwise(F.lit("und"))
    return (
        scored.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted")
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprinting: md5 over case/punct-normalized text
    (the cheap exact-dup fingerprint; rolling-hash near-dup lives in
    functions/dedup.py)."""
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    return docs.select(
        "doc_id", "lang", "source",
        F.md5(norm).alias("fingerprint"),
        F.sha2(norm, 256).alias("fingerprint_sha256"),
    )


def curation_pipeline(docs: DataFrame, min_tokens: int = 16,
                      min_stopword_ratio: float = 0.02) -> DataFrame:
    """End-to-end training-data curation: quality gate (length +
    stopword ratio) -> exact dedup by normalized fingerprint (keep the
    lowest doc_id) -> per-(lang, source) corpus stats with kept/dropped
    accounting.  The composition every 100 TB text pipeline runs; each
    stage is one of this library's operators."""
    t = F.col("text")
    n_tok = token_count(t)
    sw_ratio = stopword_count(t).cast("double") / n_tok
    norm = F.regexp_replace(F.lower(t), "[^a-z0-9 ]", "")
    gated = docs.select(
        "doc_id", "lang", "source", n_tok.alias("n_tokens"),
        ((n_tok >= min_tokens) & (sw_ratio >= min_stopword_ratio))
        .alias("passes_quality"),
        F.md5(norm).alias("fp"),
    )
    keeper = F.min(F.when(F.col("passes_quality"), F.col("doc_id"))).over(
        Window.partitionBy("fp"))
    curated = gated.withColumn(
        "kept", F.col("passes_quality") & (F.col("doc_id") == keeper))
    return (
        curated.groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
             F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
             .alias("kept_tokens"))
        .orderBy("lang", "source")
    )


def fingerprint_summary(docs: DataFrame) -> DataFrame:
    """Per-source corpus dedup stats: docs vs distinct fingerprints."""
    return (
        fingerprints(docs)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.countDistinct("fingerprint").alias("n_unique"))
        .orderBy("source")
    )
