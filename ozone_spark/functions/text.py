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


def quality_score_col(t: Column) -> Column:
    """The composite quality score in [0,1] as a Column expression —
    shared by quality_features and the contracted dup-degree report
    (which needs (fingerprint, score) in ONE map-only projection, no
    corpus self-join)."""
    n_tok = token_count(t)
    raw_ratio = stopword_count(t).cast("double") / n_tok
    # score uses the *unrounded* ratio: rounding first can park the sum on an
    # exact .5 boundary where Spark(HALF_UP) and DuckDB disagree
    return F.round(
        F.least(n_tok.cast("double") / 64.0, F.lit(1.0)) * 0.5
        + F.least(raw_ratio * 5.0, F.lit(1.0)) * 0.5, 6)


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-document quality signals: length, token count, mean word
    length, stopword ratio, and a composite score in [0,1]."""
    t = F.col("text")
    n_tok = token_count(t)
    n_sw = stopword_count(t)
    mean_word_len = F.round((F.length(t) - n_tok + 1).cast("double") / n_tok, 6)
    sw_ratio = F.round(n_sw.cast("double") / n_tok, 6)
    score = quality_score_col(t)
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


def label_agreement(docs: DataFrame) -> DataFrame:
    """Per-source label-noise report: how often the stopword-profile
    classifier agrees with the stored `lang` label, plus the
    undecidable fraction — the audit a curation team runs on a NEW
    source before trusting its self-reported language metadata (a
    source whose labels disagree with content gets re-tagged or
    dropped, since lang drives the per-language dedup/perplexity
    partitions downstream).

    Scale shape: the classifier is the same map-only built-in expression
    stack as language_id; the report is one |sources|-row aggregate."""
    t = F.col("text")
    scores = [stopword_count(t, ws).alias(f"hits_{lang}")
              for lang, ws in LANG_PROFILES.items()]
    scored = docs.select("lang", "source", *scores)
    langs = list(LANG_PROFILES)
    best = F.lit(langs[0])
    best_hits = F.col(f"hits_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"hits_{lang}") > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, F.col(f"hits_{lang}")).otherwise(best_hits)
    pred = F.when(best_hits > 0, best).otherwise(F.lit("und"))
    return (
        scored.select("source", "lang", pred.alias("predicted"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum((F.col("predicted") == F.col("lang")).cast("long"))
             .alias("n_agree"),
             F.sum((F.col("predicted") == "und").cast("long"))
             .alias("n_undecided"))
        .select("source", "n_docs", "n_agree", "n_undecided",
                F.round(F.col("n_agree") / F.col("n_docs"), 6)
                .alias("agree_rate"))
        .orderBy("source")
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


def document_chunks(docs: DataFrame, chunk_tokens: int = 32,
                    overlap: int = 8) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    preprocessing step of every LLM training / RAG pipeline (sequence
    packing, context-window fitting).

    Chunk starts are 0, stride, 2*stride, ... with
    stride = chunk_tokens - overlap; every token belongs to at least one
    chunk and the last chunk keeps its `overlap` lookback.  Emits the
    md5 of each chunk's text (compact at any scale) plus its token
    count, not the chunk text itself.

    Pure per-row array math (split + sequence + slice): ZERO shuffles —
    at 100 TB this is a map-only pass that Catalyst pipelines into the
    parquet scan.  The word array is projected to a real column before
    the chunk lambda slices it — inlining the split there re-evaluates
    it per chunk ELEMENT (subexpression elimination does not reach
    inside HOF lambdas)."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    words = F.split(F.col("text"), " ")
    n_tok = F.size("ws")
    starts = F.sequence(
        F.lit(0), F.greatest(n_tok - overlap - 1, F.lit(0)), F.lit(stride))
    chunk = F.explode(F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.least(n_tok - s, F.lit(chunk_tokens)).cast("long")
            .alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.slice("ws", s + 1, chunk_tokens)))
            .alias("chunk_md5"))))
    return (
        docs.where(F.size(words) > 0)
        .select("doc_id", words.alias("ws"))
        .select("doc_id", chunk.alias("c"))
        .select("doc_id", "c.chunk_id", "c.n_tokens", "c.chunk_md5")
    )


# Gopher-style quality rule bounds (Rae et al. 2021, §A1.1 heuristics,
# adapted to the fixture's single-line word-stream corpus)
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_DISTINCT_STOPWORDS = 2
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8


def gopher_quality_filters(docs: DataFrame) -> DataFrame:
    """Per-document Gopher/C4-style quality rule evaluation: each rule
    as an explicit boolean column plus the conjunction, so a pipeline
    can both filter and report per-rule drop accounting.  All built-in
    expressions, map-only."""
    t = F.col("text")
    words = F.split(t, " ")
    n_words = F.size(words).cast("long")
    mean_wl = (F.length(t) - n_words + 1).cast("double") / n_words
    n_sym = (F.length(t)
             - F.length(F.regexp_replace(t, r"[^a-z0-9 ]", ""))).cast("long")
    sym_ratio = n_sym.cast("double") / F.greatest(n_words, F.lit(1))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_sw_distinct = F.size(F.array_intersect(F.array_distinct(words), sw))
    alpha_ratio = (
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast("double")
        / F.greatest(n_words, F.lit(1)))
    ok_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    ok_wl = ((mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
             & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN))
    ok_sym = sym_ratio <= GOPHER_MAX_SYMBOL_RATIO
    ok_sw = n_sw_distinct >= GOPHER_MIN_DISTINCT_STOPWORDS
    ok_alpha = alpha_ratio >= GOPHER_MIN_ALPHA_WORD_RATIO
    return docs.select(
        "doc_id", "source",
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        n_sw_distinct.cast("long").alias("n_distinct_stopwords"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        ok_words.alias("ok_word_count"),
        ok_wl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_sw.alias("ok_stopwords"),
        ok_alpha.alias("ok_alpha_words"),
        (ok_words & ok_wl & ok_sym & ok_sw & ok_alpha).alias("passes_gopher"),
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

GOPHER_STAGE_ORDER = ("ok_word_count", "ok_mean_word_len",
                      "ok_symbol_ratio", "ok_stopwords", "ok_alpha_words")


def quality_funnel(docs: DataFrame) -> DataFrame:
    """Sequential filter-attrition funnel over the Gopher rules: one row
    per stage with docs in/out, the marginal drop, and the cumulative
    survival percentage — the report a curation team reads to see WHICH
    rule is eating the corpus (a rule dropping 40% marginally is either
    doing its job or mis-tuned; the conjunction alone can't tell).

    Stage i's survivor count is the conjunction of rules 1..i, so the
    funnel is order-sensitive by design (each rule is charged only docs
    the earlier rules passed).

    Scale shape: all five rules are map-only built-ins evaluated in one
    corpus pass (gopher_quality_filters), the funnel is ONE global
    aggregate of six conditional counts collapsing map-side to a single
    row, and the per-stage unpivot explodes that one row — the whole
    report costs one scan + one one-row exchange at any corpus size."""
    g = gopher_quality_filters(docs)
    surv = None
    aggs = [F.count("*").alias("n_in")]
    for i, s in enumerate(GOPHER_STAGE_ORDER):
        surv = F.col(s) if surv is None else surv & F.col(s)
        aggs.append(F.sum(surv.cast("long")).alias(f"s{i}"))
    one = g.agg(*aggs)
    stages = F.array(*[
        F.struct(
            F.lit(i + 1).alias("stage"),
            F.lit(s).alias("rule"),
            (F.col("n_in") if i == 0 else F.col(f"s{i - 1}"))
            .alias("docs_in"),
            F.col(f"s{i}").alias("docs_out"),
            F.round(F.col(f"s{i}") * 100.0 / F.col("n_in"), 4)
            .alias("cum_pct"))
        for i, s in enumerate(GOPHER_STAGE_ORDER)])
    return (
        one.select(F.explode(stages).alias("r"))
        .select("r.stage", "r.rule", "r.docs_in", "r.docs_out",
                (F.col("r.docs_in") - F.col("r.docs_out"))
                .alias("n_dropped"),
                "r.cum_pct")
        .orderBy("stage")
    )


LANGS = ("de", "en", "es", "fr", "zh")


def source_lang_matrix(docs: DataFrame) -> DataFrame:
    """Per-source language composition as a WIDE matrix — one column
    per language plus a total — via the DataFrame pivot API (the
    corpus-composition sheet a data team exports to spreadsheets).

    Scale shape: `pivot` with an EXPLICIT value list compiles to one
    hash aggregate with |langs| conditional counts per group — one
    exchange, no per-language scans, and no pre-pass to discover the
    pivot domain (an open pivot would need one); sources are the group
    key, so the wide result is |sources| rows."""
    out = (
        docs.groupBy("source")
        .pivot("lang", list(LANGS))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(LANGS))
    )
    total = None
    for lg in LANGS:
        total = F.col(lg) if total is None else total + F.col(lg)
    return (
        out.withColumn("n_docs", total.cast("long"))
        .select("source", *[F.col(lg).cast("long").alias(lg)
                            for lg in LANGS], "n_docs")
        .orderBy("source")
    )


def source_length_drift(docs: DataFrame) -> DataFrame:
    """Length-distribution drift per source: total-variation distance
    between each source's log2(n_chars+1)-bin histogram and the
    corpus-wide histogram, in EXACT integer parts-per-million — the
    shift detector a pipeline runs when a crawl source silently changes
    its extraction (truncation, boilerplate bloat) and its documents
    stop looking like the corpus they feed.

    Exact integer math end to end: with o = per-(source, bin) count,
    rt = source total, bt = bin total, g = grand total, the TV distance
    is sum_b |o/rt - bt/g| / 2 = (sum_b |o*g - rt*bt|) / (2*rt*g) —
    and the bins ABSENT from a source contribute rt*bt exactly, so
    their sum folds to rt*(g - sum_present(bt)) without materializing a
    source x bin grid.  Everything is BIGINT products of counts (far
    inside 2^63 at any per-source volume that fits a BIGINT count) and
    one floor division to ppm — no float anywhere, hash-robust by
    construction.

    Scale shape: one (source, bin) aggregate over the corpus (map-side
    combined), then all arithmetic runs on the tiny histogram table;
    bin and grand totals re-aggregate it, never the corpus."""
    # floor(log2(x)) computed as length(bin(x)) - 1: a pure INTEGER bit
    # length on both engines (ADVICE r6 — the double log2 matched at
    # every probed power-of-2 boundary, but bit length makes the
    # "no float anywhere" claim literally true)
    binned = docs.select(
        "source",
        (F.length(F.bin(F.col("n_chars") + 1)) - 1)
        .cast("long").alias("bin"))
    o = binned.groupBy("source", "bin").agg(F.count("*").alias("o"))
    rt = o.groupBy("source").agg(F.sum("o").alias("rt"))
    bt = o.groupBy("bin").agg(F.sum("o").alias("bt"))
    g = o.agg(F.sum("o").alias("g"))
    per = (
        o.join(bt, "bin").join(rt, "source").crossJoin(F.broadcast(g))
        .groupBy("source")
        .agg(F.first("rt").alias("rt"), F.first("g").alias("g"),
             F.sum(F.abs(F.col("o") * F.col("g")
                         - F.col("rt") * F.col("bt"))).alias("s1"),
             F.sum("bt").alias("s2"),
             F.count("*").alias("n_bins_active"))
    )
    return (
        per.select(
            "source", F.col("rt").alias("n_docs"), "n_bins_active",
            F.expr("(s1 + rt * (g - s2)) * 1000000 div (2 * rt * g)")
            .alias("tv_ppm"))
        .orderBy("source")
    )


SENTENCE_RE = r"[.!?]+"
SYLLABLE_RE = r"[aeiou]+"


def reading_ease(docs: DataFrame) -> DataFrame:
    """Readability profile per language: exact integer counts of words,
    sentence-ending runs and vowel-group "syllables", with
    words-per-sentence and syllables-per-word in integer ppm — the
    Flesch-style complexity signal (vowel-group syllable counting is
    the standard cheap approximation) that separates listy/boilerplate
    text from prose before quality filtering.

    All counts are regexp-match counts (regexp_extract_all -> size),
    identical semantics in Spark and DuckDB; ratios are BIGINT floor
    divisions to ppm, null when the denominator is zero — no float
    anywhere.

    Scale shape: map-only per-document counting (codegen'd regex over
    the text column), one lang-keyed aggregate with map-side combine."""
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    words = F.size(F.filter(F.split(norm, " "), lambda x: x != ""))
    sents = F.size(F.regexp_extract_all("text", F.lit(SENTENCE_RE), F.lit(0)))
    sylls = F.size(F.regexp_extract_all(norm, F.lit(SYLLABLE_RE), F.lit(0)))
    per = docs.select(
        "lang", words.cast("long").alias("w"),
        sents.cast("long").alias("s"), sylls.cast("long").alias("y"))
    return (
        per.groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("w").alias("total_words"),
             F.sum("s").alias("total_sentences"),
             F.sum("y").alias("total_syllables"))
        .select(
            "lang", "n_docs", "total_words", "total_sentences",
            "total_syllables",
            F.when(F.col("total_sentences") > 0,
                   F.expr("(total_words * 1000000) div total_sentences"))
            .alias("words_per_sentence_ppm"),
            F.when(F.col("total_words") > 0,
                   F.expr("(total_syllables * 1000000) div total_words"))
            .alias("syllables_per_word_ppm"))
        .orderBy("lang")
    )


CURATION_KEEP_PPM = 600_000      # >= 60% gopher pass: keep as-is
CURATION_DOWNSAMPLE_PPM = 300_000  # 30-60%: downsample; below: drop


def curation_report(docs: DataFrame) -> DataFrame:
    """Per-source curation decision table: corpus share, Gopher-filter
    pass counts and the keep/downsample/drop verdict thresholded on
    the pass rate — the one-page report a corpus team reads to decide
    which crawl sources enter the mixture at full weight.

    All metrics are exact integers (counts and BIGINT ppm floor
    divisions); the verdict is a deterministic threshold on the integer
    pass ppm, so the whole table replays bit-identically in SQL.

    Scale shape: rides the map-only gopher_quality_filters scan, one
    source-keyed aggregate (map-side combined), the corpus total as a
    broadcast one-row scalar."""
    from pyspark.sql.functions import broadcast
    g = gopher_quality_filters(docs).select(
        "source", F.col("passes_gopher").cast("long").alias("p"))
    total = g.agg(F.count("*").alias("_total"))
    per = (
        g.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("p").alias("n_pass"))
        .crossJoin(broadcast(total))
    )
    pass_ppm = F.expr("(n_pass * 1000000) div n_docs")
    verdict = (
        F.when(pass_ppm >= CURATION_KEEP_PPM, "keep")
        .when(pass_ppm >= CURATION_DOWNSAMPLE_PPM, "downsample")
        .otherwise("drop"))
    return (
        per.select(
            "source", "n_docs",
            F.expr("(n_docs * 1000000) div _total").alias("share_ppm"),
            "n_pass", pass_ppm.alias("pass_ppm"),
            verdict.alias("verdict"))
        .orderBy("source")
    )


def length_percentiles_by_source(docs: DataFrame) -> DataFrame:
    """Per-source document-length profile: exact p50/p90/p99 order
    statistics of n_chars (rank = ceil(q*n), doc_id tiebreak — never an
    interpolated quantile) plus min/max — the companion detail view to
    source_length_drift's one-number distance.

    Scale shape: one rank window partitioned by source over (source,
    n_chars, doc_id) triples — never the text — and a |sources|-row
    pivot of the three picked ranks."""
    from pyspark.sql import Window
    base = docs.select("source", "n_chars", "doc_id")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = base.withColumn("rn", F.row_number().over(w))
    stats = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"))
    picks = None
    for col, num in (("p50_chars", 1), ("p90_chars", 9), ("p99_chars", 99)):
        den = {1: 2, 9: 10, 99: 100}[num]
        p = stats.select(
            "source",
            F.expr(f"({num} * n_docs + {den - 1}) div {den}")
            .alias("target"), F.lit(col).alias("which"))
        picks = p if picks is None else picks.unionByName(p)
    quant = (
        ranked.join(picks, (ranked.source == picks.source)
                    & (ranked.rn == picks.target))
        .groupBy(ranked.source)
        .pivot("which", ["p50_chars", "p90_chars", "p99_chars"])
        .agg(F.first("n_chars"))
    )
    return (
        stats.join(quant, "source")
        .select("source", "n_docs", "min_chars", "p50_chars",
                "p90_chars", "p99_chars", "max_chars")
        .orderBy("source")
    )
