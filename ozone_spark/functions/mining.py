"""Corpus-mining operators: PII detection/redaction and TF-IDF / BM25
term scoring (training-data pipeline surface, additive to the reference
— SURVEY.md §2.10 north star, same family as functions/pipeline.py).

Scale notes (100 TB):
- PII redaction is pure per-row regex work: map-only, zero shuffles,
  whole-stage-codegen'd JVM regexes (no Python UDFs).
- TF-IDF shuffles exactly three times: token counts by (doc_id, term),
  document frequency by term, and the per-doc top-k window by doc_id.
  The scalar corpus stats (N, avgdl) ride along as a broadcast one-row
  crossJoin — no collect(), no driver round-trip.
- All floating-point scores are deterministic-by-construction (fixed
  fold order, integer inputs) and rounded to 6 decimals so any engine
  replays them bit-identically; the DuckDB oracles in registry.py do.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .dedup import bounded_window_key as _bwk
from pyspark.sql.functions import broadcast

# ------------------------------------------------------------------ PII

# The synthetic documents are word-salad with no natural PII, so the
# operator derives a deterministic contact tail per doc (email, IPv4,
# phone) and then detects/redacts it — the regex path is exercised for
# real, and the DuckDB oracle replays the same derivation.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"


def _with_contact_tail(docs: DataFrame) -> Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"), d.cast("string"), F.lit("@example.com"),
        F.lit(" from 10."), (d % 256).cast("string"),
        F.lit(".0."), ((d * 7) % 256).cast("string"),
        F.lit(" call 555-"), F.lpad((d % 10000).cast("string"), 4, "0"),
    )


def pii_redaction(docs: DataFrame) -> DataFrame:
    """Detect and redact emails / IPv4s / phone numbers: per-doc match
    counts plus an md5 fingerprint of the redacted text (compact proof
    the full replacement happened, verifiable by any engine with md5).

    Redaction order matters: emails first (their host part would
    otherwise be chewed up by later passes), then IPs, then phones.
    """
    aug = _with_contact_tail(docs)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"),
            IPV4_RE, "<IP>"),
        PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(IPV4_RE), F.lit(0)))
        .cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all(aug, F.lit(PHONE_RE), F.lit(0)))
        .cast("long").alias("n_phones"),
        F.md5(red).alias("redacted_fp"),
        F.length(red).cast("long").alias("redacted_len"),
    )


# --------------------------------------------------- bigram LM scoring


def bigram_lm_scores(docs: DataFrame) -> DataFrame:
    """CCNet/KenLM-style quality signal: train an add-one-smoothed bigram
    LM on the corpus itself, score each document's cross-entropy
    (bits/bigram) and perplexity under it.  High-perplexity docs are
    out-of-distribution (boilerplate, gibberish, wrong language) — the
    classic cheap filter before expensive model-based scoring.

    p(cur|prev) = (c2(prev,cur)+1) / (c1(prev)+V), V = |vocab|.

    Scale shape (100 TB): one explode + three hash aggregations
    (doc-bigram counts, corpus bigram counts, context counts) and one
    equi-join of doc-bigrams back to the model on (prev, cur) — the
    model lives distributed, partitioned by its join key; V rides along
    as a broadcast one-row crossJoin.  No collect(), no all-pairs, no
    Python in the hot path.
    """
    w = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(w)
    bigrams = F.when(
        n >= 2,
        F.zip_with(F.slice(w, F.lit(1), n - 1), F.slice(w, F.lit(2), n - 1),
                   lambda a, b: F.struct(a.alias("prev"), b.alias("cur"))),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    dbc = (
        docs.select("doc_id", F.explode(bigrams).alias("bg"))
        .select("doc_id", F.col("bg.prev").alias("prev"),
                F.col("bg.cur").alias("cur"))
        .groupBy("doc_id", "prev", "cur").agg(F.count("*").alias("n"))
    )
    c2 = dbc.groupBy("prev", "cur").agg(F.sum("n").alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    vocab = (
        docs.select(F.explode(w).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    h = (-F.sum(F.col("n")
                * F.log2((F.col("c2") + 1) / (F.col("c1") + F.col("v"))))
         / F.sum("n"))
    return (
        dbc.join(c2, ["prev", "cur"]).join(c1, "prev")
        .crossJoin(broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.sum("n").cast("long").alias("n_bigrams"), h.alias("h"))
        .select("doc_id", "n_bigrams",
                F.round("h", 6).alias("cross_entropy_bits"),
                F.round(F.pow(F.lit(2.0), F.col("h")), 4).alias("perplexity"))
    )


# ------------------------------------------------------- TF-IDF / BM25

BM25_K1 = 1.2
BM25_B = 0.75
TOP_TERMS = 3


def tf_idf_top_terms(docs: DataFrame, top_n: int = TOP_TERMS) -> DataFrame:
    """Per-doc top-n terms by TF-IDF with a BM25 score alongside.

    tfidf = tf * ln(N / df);  bm25 = ln((N-df+0.5)/(df+0.5) + 1) *
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).  Ties broken by term
    ascending so the top-n set is total-order deterministic.
    """
    toks = (
        docs.select("doc_id",
                    F.explode(F.split(F.col("text"), " ")).alias("term"))
        .where(F.col("term") != "")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus scalars as a broadcast one-row join (no collect())
    scalars = docs.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(F.filter(F.split(F.col("text"), " "),
                              lambda w: w != ""))).alias("avgdl"))
    dl_w = Window.partitionBy("doc_id")
    scored = (
        tf.join(df_t, "term")
        .crossJoin(broadcast(scalars))
        .withColumn("dl", F.sum("tf").over(dl_w))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
        .withColumn(
            "bm25",
            F.log((F.col("n_docs") - F.col("df") + 0.5)
                  / (F.col("df") + 0.5) + 1.0)
            * (F.col("tf") * (BM25_K1 + 1))
            / (F.col("tf") + BM25_K1
               * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))))
    )
    rank_w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= top_n)
        .select("doc_id", "term", "tf", "df",
                F.col("rank").cast("long").alias("rank"),
                F.round("tfidf", 6).alias("tfidf"),
                F.round("bm25", 6).alias("bm25"))
    )


# --------------------------------------------------------- vocabulary

def vocab_coverage(docs: DataFrame, k: int = 500) -> DataFrame:
    """Tokenizer-style vocabulary induction: build the corpus-global
    top-k word vocabulary (count desc, word asc — deterministic ties),
    then measure per-language coverage — the share of token occurrences
    the vocab explains — and the OOV rate.  The curve a tokenizer team
    reads before fixing a vocab size.

    Scale shape: one shuffle for global word counts, top-k via
    TakeOrderedAndProject (distributed, no single-reducer window), the
    tiny vocab broadcast back for the coverage semi-join.  Per-language
    totals are a second partial-agg shuffle over (lang, in_vocab)."""
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    words = (
        docs.select("lang", F.explode(F.split(norm, " ")).alias("word"))
        .where(F.col("word") != "")
    )
    vocab = (
        words.groupBy("word").agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word").limit(k)
        .select("word")
    )
    tagged = words.join(
        broadcast(vocab.withColumn("in_vocab", F.lit(1))), "word", "left")
    return (
        tagged.groupBy("lang")
        .agg(F.count("*").alias("total_tokens"),
             F.sum(F.when(F.col("in_vocab").isNotNull(), 1).otherwise(0))
             .alias("covered_tokens"))
        .withColumn("coverage",
                    F.round(F.col("covered_tokens") / F.col("total_tokens"), 6))
        .withColumn("oov_rate",
                    F.round(1 - F.col("covered_tokens") / F.col("total_tokens"), 6))
        .orderBy("lang")
    )


# --------------------------------------------------- perplexity buckets

PPL_BUCKETS = ("head", "middle", "tail")


def perplexity_buckets(docs: DataFrame) -> DataFrame:
    """CCNet's corpus partitioning step (Wenzek et al. 2020,
    arXiv:1911.00359): split each language's documents into
    head/middle/tail terciles by LM perplexity — head is the most
    in-domain third that trains first, tail is the candidate-discard
    third.  Perplexity comes from the corpus-trained bigram LM
    (`bigram_lm_scores`); ties break on doc_id so the tiling is
    deterministic in any engine.

    Determinism: cross-entropy is a distributed float sum, so its last
    decimals are partial-sum-order dependent; the tile ORDER therefore
    uses a COARSE rounding (3 decimals) with doc_id tiebreak — a
    boundary flip now needs the true value within float-epsilon of a
    0.0005 grid line, ~1000x less likely than at the 6-decimal grid the
    displayed score uses.  Docs with <2 tokens have no bigrams and are
    excluded from the output entirely (no score exists for them) — the
    same exclusion the SQL oracle applies.

    Scale shape: the tercile assignment is an ntile window PARTITIONED
    BY lang — a per-language sort, never a global one.  At extreme
    per-language volumes the exact ntile swaps for approximate
    percentile cutoffs (computed per lang, broadcast, then a map-only
    bucket assign); the exact form is kept here because it is
    bit-replayable by the SQL oracle."""
    scored = bigram_lm_scores(docs).join(
        docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.round(F.col("cross_entropy_bits"), 3), "doc_id")
    tile = F.ntile(3).over(w)
    bucket = F.element_at(
        F.array(*[F.lit(b) for b in PPL_BUCKETS]), tile)
    return (
        scored.select("doc_id", "lang", "cross_entropy_bits", "perplexity",
                      bucket.alias("bucket"))
        .orderBy("doc_id")
    )

def zipf_curve(docs: DataFrame, k: int = 1000, top_n: int = 20) -> DataFrame:
    """Zipf rank-frequency curve of the corpus vocabulary: the top-n
    tokens with their rank and count, plus the least-squares slope of
    ln(freq) on ln(rank) fitted over the top-k — the diagnostic that
    tells a corpus team whether token frequencies follow the natural
    ~1/rank law (slope near -1) or the corpus is template-polluted
    (flatter head) before they burn tokenizer budget on it.

    Scale shape: one shuffle for global word counts, top-k via
    TakeOrderedAndProject (deterministic count-desc/word-asc ties);
    ranking and the regression then run over the BOUNDED k-row table
    (the rank window's single partition holds k rows by construction),
    and the one-row fit broadcasts back as a scalar crossJoin."""
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    words = (
        docs.select(F.explode(F.split(norm, " ")).alias("word"))
        .where(F.col("word") != "")
    )
    ranked = (
        words.groupBy("word").agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word").limit(k)
        .withColumn("rank", F.row_number().over(
            Window.partitionBy(_bwk("word"))
            .orderBy(F.desc("cnt"), "word")))
        .withColumn("lx", F.log("rank"))
        .withColumn("ly", F.log("cnt"))
    )
    fit = ranked.agg(
        F.count("*").alias("n"), F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"), F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"))
    fit = fit.select(
        F.round((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
                4).alias("zipf_slope"),
        F.round((F.col("sy") - (F.col("n") * F.col("sxy")
                                - F.col("sx") * F.col("sy"))
                 / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                 * F.col("sx")) / F.col("n"), 4).alias("intercept"))
    return (
        ranked.where(F.col("rank") <= top_n)
        .crossJoin(broadcast(fit))
        .select("rank", "word", "cnt", "zipf_slope", "intercept")
        .orderBy("rank")
    )


def bpe_merge_candidates(docs: DataFrame, k: int = 50) -> DataFrame:
    """One distributed BPE training step: the k most frequent adjacent
    symbol pairs over the corpus vocabulary — the primitive a
    byte-pair-encoding tokenizer trainer (Sennrich et al. 2016) runs
    per merge round (rank 1 IS the next merge).  Counts are weighted by
    word frequency with within-word multiplicity ("aaa" contributes
    "aa" twice), exactly the classical formulation.

    Scale shape: the corpus collapses to the VOCABULARY first (one
    word-count aggregate with map-side combine — pair math never
    touches corpus volume, only distinct words), pair explode is a
    per-row transform over character offsets, and the top-k is
    TakeOrderedAndProject.  Iterating merges re-runs this on a
    re-symbolized vocab table — each round costs vocab size, not
    corpus size."""
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    vocab = (
        docs.select(F.explode(F.split(norm, " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("freq"))
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.substring(F.col("word"), i, F.lit(2)))
    exploded = (
        vocab.where(F.length("word") >= 2)
        .select("word", "freq", F.explode(pairs).alias("pair"))
    )
    top = (
        exploded.groupBy("pair")
        .agg(F.sum("freq").alias("total_count"),
             F.countDistinct("word").alias("n_words"))
        .orderBy(F.desc("total_count"), "pair")
        .limit(k)
    )
    w = Window.partitionBy(_bwk("pair")).orderBy(F.desc("total_count"), "pair")  # k rows
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "pair", "total_count", "n_words")
        .orderBy("rank")
    )


BPE_MERGES = 8


def _bpe_vocab(docs: DataFrame) -> DataFrame:
    """(word, freq, sym) vocabulary with the boundary-doubled initial
    symbolization ('abc' -> '||a||b||c||')."""
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    chars = F.filter(F.split(F.col("word"), ""), lambda x: x != "")
    return (
        docs.select(F.explode(F.split(norm, " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word").agg(F.count("*").alias("freq"))
        .select("word", "freq",
                F.concat(F.lit("||"), F.array_join(chars, "||"),
                         F.lit("||")).alias("sym"))
    )


def _bpe_loop(docs: DataFrame, n_merges: int):
    """Iterated BPE tokenizer training (Sennrich et al. 2016): run
    `n_merges` merge rounds over the corpus vocabulary and return the
    learned merge table — round, pair, the new symbol, and the pair's
    frequency-weighted count at selection time.  This IS the tokenizer
    artifact a training pipeline ships.

    The classical left-to-right non-overlapping merge is expressed as a
    LITERAL string replace over a boundary-doubled symbol encoding:
    words are kept as '||'-separated symbols ('abc' -> '||a||b||c||'),
    and merging (a, b) is replace('|a||b|' -> '|ab|').  The doubled
    boundary gives each adjacency its own pipe pair, so consecutive
    merges ('abab' -> 'ab','ab') don't starve each other, overlapping
    runs resolve left-to-right ('aaa' -> 'aa','a'), and symbol-prefix
    false matches ('bc' vs 'b') are impossible — verified identical in
    Spark and DuckDB, which is what makes the whole trainer
    oracle-replayable round for round.

    Scale shape: one corpus pass builds the word-frequency vocabulary;
    every merge round after that is vocab-sized (pair explode over
    symbol arrays + one argmax + a broadcast one-row replace) — the
    iterated-state-as-DataFrame pattern shared with kmeans_assign, no
    collect() anywhere.

    Practical merge-count ceiling: rounds are SEQUENTIAL driver-side
    iterations (each ~2 vocab-sized Spark jobs + a localCheckpoint),
    so per-round wall time is flat (pytest-asserted to 24 rounds) but
    total time is linear in rounds — at ~0.5 s/round of fixed job
    latency, a production 32k-merge vocabulary is ~4-5 h of scheduler
    latency alone, regardless of cluster size.  This trainer is the
    right shape up to ~1k merges (domain tokenizers, tokenizer AUDITS
    of an existing vocab); beyond that, train the merge table offline
    on a word-frequency SAMPLE (the vocabulary table this loop builds
    IS that sample, exportable via one collect of ~1e5 rows) and use
    Spark for the corpus-wide ENCODE, which is one join
    (bpe_encode_stats' shape) however many merges the vocab has."""
    from functools import reduce as _reduce
    vocab = _bpe_vocab(docs)
    rounds = []
    # Eager per-round truncation: round r's pair counts hang off round
    # r-1's replace, whose one-row argmax hangs off ITS OWN aggregation
    # — left lazy, every union branch replays its whole prefix and the
    # trainer goes quadratic in rounds (measured 41s -> 12s at the
    # gate fixture).  The vocab table is vocabulary-sized, so the
    # checkpoint is cheap; same loop-state pattern as _cc_loop.
    for r in range(n_merges):
        vocab = vocab.localCheckpoint()
        vs = vocab.select(
            "freq",
            F.filter(F.split(F.col("sym"), r"\|\|"),
                     lambda x: x != "").alias("s"))
        pairs = F.transform(
            F.sequence(F.lit(1), F.size("s") - 1),
            lambda i: F.concat(F.element_at("s", i), F.lit("|"),
                               F.element_at("s", i + 1)))
        best = (
            vs.where(F.size("s") >= 2)
            .select("freq", F.explode(pairs).alias("pair"))
            .groupBy("pair").agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "pair").limit(1)
        )
        a = F.substring_index(F.col("pair"), "|", 1)
        b = F.substring_index(F.col("pair"), "|", -1)
        best = best.select(
            "pair", "cnt",
            F.concat(F.lit("|"), a, F.lit("||"), b, F.lit("|"))
            .alias("srch"),
            F.concat(F.lit("|"), a, b, F.lit("|")).alias("repl"),
            F.concat(a, b).alias("new_symbol"))
        rounds.append(best.select(
            F.lit(r + 1).alias("merge_round"), "pair", "new_symbol",
            F.col("cnt").alias("total_count")))
        vocab = (
            vocab.crossJoin(broadcast(best.select("srch", "repl")))
            .select("word", "freq",
                    F.replace(F.col("sym"), F.col("srch"), F.col("repl"))
                    .alias("sym"))
        )
    return (_reduce(lambda x, y: x.unionByName(y), rounds)
            .orderBy("merge_round"), vocab)


def bpe_train(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """The learned merge table (see _bpe_loop's docstring above for the
    algorithm, determinism and scale notes)."""
    merges, _ = _bpe_loop(docs, n_merges)
    return merges


def bpe_encode_stats(docs: DataFrame,
                     n_merges: int = BPE_MERGES) -> DataFrame:
    """Tokenizer fertility report: train the n-merge BPE, encode the
    corpus with it (the loop's final vocabulary already holds every
    word's post-merge symbolization — encoding is a word join, not a
    re-scan), and report per-language chars/token and tokens/word —
    the numbers that decide whether a tokenizer is fair across the
    corpus's languages before a multilingual training run.

    Scale shape: training is vocab-sized per round (_bpe_loop); the
    encode is one (word)-keyed join of the exploded corpus against the
    vocab's symbol counts, aggregated per language with map-side
    combine.  All counts exact integers."""
    _, vocab = _bpe_loop(docs, n_merges)
    enc = vocab.select(
        "word",
        F.size(F.filter(F.split(F.col("sym"), r"\|\|"),
                        lambda x: x != "")).cast("long").alias("n_sym"))
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    dw = (
        docs.select("doc_id", "lang",
                    F.explode(F.split(norm, " ")).alias("word"))
        .where(F.col("word") != "")
    )
    return (
        dw.join(enc, "word")
        .groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("n_docs"),
             F.count("*").alias("total_words"),
             F.sum(F.length("word")).alias("total_chars"),
             F.sum("n_sym").alias("total_tokens"))
        .select("lang", "n_docs", "total_words", "total_chars",
                "total_tokens",
                F.round(F.col("total_tokens") / F.col("total_words"), 6)
                .alias("fertility"),
                F.round(F.col("total_chars") / F.col("total_tokens"), 6)
                .alias("chars_per_token"))
        .orderBy("lang")
    )
