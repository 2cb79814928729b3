"""Deduplication operators for the training-data pipeline surface
(BASELINE.json north star): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:
  - exact dedup = hash-groupBy on a fingerprint — one shuffle keyed by
    the hash, uniform by construction.
  - n-gram Jaccard = shingle explode -> self-join on shingle -> pair
    aggregation.  Hot shingles explode pair counts quadratically, so the
    shingle->docs buckets are capped (`max_bucket`) exactly like LSH
    implementations drop saturated bands at web scale.
  - MinHash+LSH: ONE md5-derived 28-bit base hash per shingle, then 32
    Carter-Wegman permutations `(a_i*h + b_i) mod 2^31-1` (universal
    hashing — the standard MinHash construction), banded into 8 bands
    of 4; candidate pairs = equi-join on (band, band-signature) — never
    an all-pairs product; verified by estimated Jaccard afterwards.
  - SimHash: 60-bit signature from per-token md5-derived hashes;
    near-dups = pairs sharing a 15-bit block (block permutation trick)
    within Hamming radius.

Everything is built-in-function only (md5/conv/explode/groupBy) —
JVM-side, no Python in the hot path.  All hash math is integer-exact
and engine-portable: the DuckDB oracles replay the identical
`md5 -> hex -> int -> modular arithmetic` pipeline, so every dedup
operator is value-checked against SQL, not just row-counted.
"""

from __future__ import annotations

import weakref

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

N_PERM = 32          # minhash permutations
N_BANDS = 8          # LSH bands (4 rows each)
ROWS_PER_BAND = N_PERM // N_BANDS
MERSENNE31 = (1 << 31) - 1   # Carter-Wegman modulus
SIM_BITS = 60        # simhash width (60 bits = 15 hex digits of md5)


def perm_consts(n: int = N_PERM) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the Carter-Wegman permutations,
    from a seeded LCG — generated at plan-build time and inlined as
    literals in both the Spark plan and the DuckDB oracle."""
    state = 0x2545F4914F6CDD1D
    out: list[tuple[int, int]] = []
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = 1 + (state >> 33) % (MERSENNE31 - 1)
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = (state >> 33) % MERSENNE31
        out.append((a, b))
    return out


def hash28(col: Column) -> Column:
    """28-bit integer hash of a string via md5 hex prefix — bit-exact in
    any engine with md5 (DuckDB: CAST('0x'||substr(md5(s),1,7) AS BIGINT)).
    28 bits keeps a*h+b inside 63 bits for 31-bit multipliers.

    Value-space regime: 2^28 ≈ 2.7e8 distinct base hashes.  Expected
    distinct-shingle collision share for a document with s shingles is
    ~s/2^28, biasing estimated Jaccard upward by roughly that fraction —
    negligible (<0.4%) up to ~1e6 shingles/doc (≈ multi-MB documents).
    Corpora of near-arbitrary SIZE are fine (collisions are per-document,
    not global); only per-document shingle counts beyond ~1e6 warrant
    widening the base hash (e.g. 61-bit Mersenne modulus with bounded
    multipliers keeping a*h+b in the 127-bit headroom of DECIMAL math)."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def hash60(col: Column) -> Column:
    """60-bit integer hash of a string via md5 hex prefix (15 digits)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def bounded_window_key(col: str) -> Column:
    """Pseudo-constant partition key (always 0, but NOT constant-foldable)
    for windows over PROVABLY BOUNDED inputs — post-limit top-k tables,
    calendar/bucket spines, band counts.  Why not Window.orderBy alone or
    partitionBy(lit(0)): Catalyst folds literal partition keys out of the
    window spec, and WindowExec then logs its single-partition warning on
    every execution even over k rows — which buries the REAL warning when
    an unbounded window regresses in.  A column-derived zero keeps the
    spec non-empty (one cheap hash per row of an already-tiny table) so a
    single-partition warning in any log is always a genuine scale bug."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(1))


_NPARTS_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _spread(df: DataFrame) -> DataFrame:
    """Small single-file inputs arrive as one partition; fan out before
    CPU-heavy per-row transforms so all cores work.  (At real scale the
    source has many splits and this is a no-op-cost round-robin.)

    The probe must be the ACTUAL scan partition count: a file-count
    heuristic is wrong in both directions (maxPartitionBytes bin-packs
    many tiny files into few partitions -> UDF runs near-serially; one
    big splittable file scans as many partitions -> needless shuffle).
    df.rdd.getNumPartitions() is a driver-side plan translation (no job
    runs) but NOT free: it runs full physical planning + RDD DAG
    construction, measured at 0.2-0.4 s per call.  The count is a pure
    function of the analyzed plan and the session's split conf, so it is
    memoized per (session, semanticHash, target) — semanticHash needs
    only analysis (~0.5 ms) and is stable across rebuilds of the same
    plan.  The memo stores a partition COUNT, never data or results, and
    lives only for the session (WeakKeyDictionary).

    Key caveat (ADVICE r11): the file-split confs
    (spark.sql.files.maxPartitionBytes / openCostInBytes) are NOT part
    of the key, so mutating them mid-session — or overwriting an input
    file in place — can serve a stale count; semanticHash is also a
    32-bit hash, so distinct plans can collide.  Every failure mode is
    perf-only (a skipped or needless repartition, never wrong values),
    and this engine holds those confs fixed per session (session.py
    sets them once), so the narrow key is the measured win."""
    sess = df.sparkSession
    target = sess.sparkContext.defaultParallelism
    n = None
    memo = None
    key = None
    try:
        memo = _NPARTS_MEMO.setdefault(sess, {})
        key = (df.semanticHash(), target)
        n = memo.get(key)
    except Exception:
        memo = None
    if n is None:
        n = df.rdd.getNumPartitions()
        if memo is not None and len(memo) < 1024:
            memo[key] = n
    return df if n >= target else df.repartition(target)


def _norm_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(text), "[^a-z0-9 ]", "")


# One cache slot per call site: signature/shingle tables feed 2-3
# consumers inside one operator and are persisted to avoid recomputing
# the expensive map stage — but the operator returns a LAZY frame, so
# it cannot unpersist after itself.  Each new invocation evicts the
# previous invocation's table for its slot, bounding resident cache to
# one table per operator per session instead of leaking one per call
# (the ADVICE-r4 fix for payload_chunk_near_dup, applied module-wide:
# a 12-query session over a 10x corpus otherwise accumulates gigabytes
# of dead shingle caches whose eviction pressure bleeds into later
# queries' timings).
_CACHE_SLOTS: dict[str, DataFrame] = {}

# Observability (ADVICE r11): slot hit/miss/evict counters, so a silent
# always-miss regression (e.g. sameSemantics keys diverging run-to-run
# on a closure-embedding plan) is visible instead of silently restoring
# the per-call rebuild cost the cache exists to remove.  Counters only —
# never data; read via slot_stats(), reset at will by tests.
_SLOT_STATS: dict[str, list[int]] = {}  # slot -> [hits, misses]


def slot_stats(slot: str | None = None) -> dict[str, tuple[int, int]]:
    """(hits, misses) per cache slot — misses include first-touch."""
    items = _SLOT_STATS.items() if slot is None else \
        [(slot, _SLOT_STATS.get(slot, [0, 0]))]
    return {s: (c[0], c[1]) for s, c in items}


def _slot_cache(df: DataFrame, slot: str) -> DataFrame:
    """One bounded cache slot per call site, with PLAN-KEYED reuse: if
    the slot already holds a persisted frame with the same analyzed
    plan (`sameSemantics` — a driver-side plan comparison, no job),
    return the existing frame so sibling operators sharing a derived
    table (ngram_jaccard_pairs + containment_pairs on the shingle
    index; the minhash signature table feeding lsh pairs, bucket stats
    and recall) hit one persisted copy instead of each rebuilding and
    re-persisting it — the r5 bench measured that rebuild as a +20%
    regression on dedup_minhash_lsh once the new consumers joined.  A
    different plan (new input, new session) still evicts the previous
    frame, so resident cache stays bounded at one table per slot.

    Staleness hazard (ADVICE r6): sameSemantics compares ANALYZED PLANS,
    not data — if a source file is overwritten IN PLACE mid-session, a
    matching slot keeps serving the previously persisted blocks.  That
    is Spark's own persist() contract (any cached frame goes stale when
    its input mutates underneath it), and this harness's fixtures are
    immutable; sessions with mutable inputs should key the slot on a
    data fingerprint (e.g. max(mtime) of input files) or unpersist
    between loads."""
    stats = _SLOT_STATS.setdefault(slot, [0, 0])
    old = _CACHE_SLOTS.get(slot)
    if old is not None:
        try:
            if df.sameSemantics(old):
                stats[0] += 1
                # External-uncache hazard (ADVICE r10 medium): Spark's
                # CacheManager is PLAN-keyed, so two slots holding
                # sameSemantics twins share ONE cache entry — an
                # unpersist on either frame (release_slots on the twin's
                # slot, or a caller's own) silently de-caches the
                # survivor too.  Re-persist on hit when the matched
                # frame's storage level dropped to NONE; without this
                # the r10 armed scale probe measured its "warm" ngram_sh
                # queries cold AND recomputing the shingle stage per
                # consumer (SCALE100_r10 armed 128.9s vs 27.0s armless
                # at identical rows).
                sl = old.storageLevel
                if not (sl.useMemory or sl.useDisk or sl.useOffHeap):
                    old.persist()
                return old
        except Exception:
            pass  # e.g. old frame's session is gone — fall through
        _CACHE_SLOTS.pop(slot, None)
        try:
            old.unpersist()
        except Exception:
            pass  # dead session — the frame is already gone
    stats[1] += 1
    df.persist()
    _CACHE_SLOTS[slot] = df
    return df


def release_slots(*prefixes: str) -> list:
    """Unpersist and forget every cache slot whose name starts with one
    of `prefixes` (all slots if none given).  For harnesses that run a
    cache-hungry pass before timed work and must return ONLY that
    pass's tables to cold — a blanket catalog.clearCache() also evicts
    slots the timed queries legitimately share (the scale probe's
    stage-rows pass warms ngram_sh exactly like a resident production
    index would), changing what the timings measure."""
    hit = [s for s in _CACHE_SLOTS
           if not prefixes or any(s.startswith(p) for p in prefixes)]
    kept = [f for s, f in _CACHE_SLOTS.items() if s not in set(hit)]
    for s in hit:
        f = _CACHE_SLOTS.pop(s)
        # Plan-keyed twin guard (ADVICE r10 medium): if a RETAINED slot
        # holds a sameSemantics twin, both frames map to the same
        # CacheManager entry and unpersisting the released one would
        # de-cache the survivor (the r10 armed probe's 'probe_rec'
        # release did exactly this to 'ngram_sh', turning the warm-
        # regime measurements cold).  Skip the unpersist — the entry
        # stays owned by the surviving slot.
        twin = False
        for k in kept:
            try:
                if f.sameSemantics(k):
                    twin = True
                    break
            except Exception:
                continue  # a dead kept frame can't be anyone's twin
        if twin:
            continue
        try:
            f.unpersist()
        except Exception:
            pass  # dead session frame (ADVICE r10 low #1): one broken
            # unpersist must not abort the release of the rest
    return hit


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup via normalized-text fingerprint groupBy; returns
    fingerprint groups with >1 member."""
    fp = F.md5(_norm_text(F.col("text")))
    return (
        docs.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper_doc_id"))
        .where(F.col("n_dups") > 1)
        .orderBy("fingerprint")
    )


def dedup_threshold_sweep(docs: DataFrame, n: int = 3,
                          floor: float = 0.05) -> DataFrame:
    """Threshold-tuning curve for near-dup dedup: how many candidate
    pairs (and docs) would a given Jaccard cutoff remove?  One pass of
    pair discovery at a low floor, then a 0.1-wide similarity histogram
    with a descending cumulative count — the curve a curation run reads
    to pick its production threshold instead of re-running dedup per
    candidate value.

    The cumulative window runs over at most 10 bucket rows (bounded by
    construction); everything before it is the standard two-shuffle
    pair pipeline."""
    pairs = ngram_jaccard_pairs(docs, n=n, threshold=floor)
    bucket = (F.floor(F.col("jaccard") * 10) / 10).cast("double")
    hist = (
        pairs.select(bucket.alias("jaccard_floor"))
        .groupBy("jaccard_floor").agg(F.count("*").alias("n_pairs"))
    )
    w = Window.partitionBy(bounded_window_key("jaccard_floor")).orderBy(F.desc("jaccard_floor")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (
        hist.withColumn("n_pairs_at_or_above", F.sum("n_pairs").over(w))
        .select("jaccard_floor", "n_pairs", "n_pairs_at_or_above")
        .orderBy("jaccard_floor")
    )


def _paragraph_fps(docs: DataFrame, para_words: int) -> DataFrame:
    """(doc_id, para_idx, fp) rows: md5 fingerprints of non-overlapping
    `para_words`-word chunks of the normalized text — the shared explode
    stage of paragraph_dedup and boilerplate_paragraphs.  Paragraph text
    is dropped at the source: only 32-char fingerprints ever move."""
    # the word array is projected to a real column before the paragraph
    # transform references it — inlining the regexp+split into the
    # lambda re-evaluates the normalization per paragraph ELEMENT
    # (subexpression elimination does not reach inside HOF lambdas)
    words = F.split(F.trim(_norm_text(F.col("text"))), " +")
    base = (
        # guard on the trimmed TEXT, not size(words): split('') yields
        # [''] (size 1), which would give every wordless doc the same
        # empty paragraph and cross-dedup unrelated docs
        docs.where(F.trim(_norm_text(F.col("text"))) != "")
        .select("doc_id", words.alias("ws"))
    )
    n_paras = F.ceil(F.size("ws") / F.lit(para_words)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_paras - 1),
        lambda i: F.concat_ws(
            " ", F.slice("ws", i * para_words + 1, para_words)))
    return (
        base.select("doc_id", F.posexplode(paras).alias("para_idx", "para"))
        .select("doc_id", "para_idx", F.md5(F.col("para")).alias("fp"))
    )


def paragraph_dedup(docs: DataFrame, para_words: int = 20) -> DataFrame:
    """Paragraph-level exact dedup (the Dolma / RefinedWeb recipe:
    drop every later copy of a repeated paragraph corpus-wide, keep the
    first).  The fixture corpus carries no newline structure, so a
    "paragraph" is a non-overlapping `para_words`-word chunk of the
    normalized text; real corpora would split on '\\n\\n' instead — the
    dedup shape downstream is identical.

    First occurrence = (doc_id, para_idx)-lexicographic minimum per
    fingerprint, decided by a rank-1 window partitioned BY FINGERPRINT
    (bounded groups — no global window), so the whole operator is two
    hash shuffles: one by fingerprint, one by doc for the survival
    stats.  Paragraph text itself never re-shuffles after the explode;
    only (fingerprint, ids) rows move.

    Returns one row per document: paragraph count, kept/dropped counts
    and the kept fraction — the per-doc survival report a curation
    pipeline thresholds on (documents reduced to boilerplate lose most
    paragraphs to earlier copies)."""
    exploded = _paragraph_fps(docs, para_words)
    w = Window.partitionBy("fp").orderBy("doc_id", "para_idx")
    kept = exploded.withColumn(
        "kept", (F.row_number().over(w) == 1).cast("int"))
    return (
        kept.groupBy("doc_id")
        .agg(F.count("*").alias("n_paras"),
             F.sum("kept").alias("n_kept"))
        .select("doc_id", "n_paras", "n_kept",
                (F.col("n_paras") - F.col("n_kept")).alias("n_dropped"),
                F.round(F.col("n_kept") / F.col("n_paras"), 6)
                .alias("frac_kept"))
        .orderBy("doc_id")
    )


def boilerplate_paragraphs(docs: DataFrame, para_words: int = 20,
                           min_df: int = 3) -> DataFrame:
    """Frequency-threshold boilerplate removal (the CCNet / RefinedWeb
    line-dedup rule, distinct from paragraph_dedup's keep-first): a
    paragraph that appears in >= `min_df` DISTINCT documents is
    boilerplate (nav bars, cookie banners, license headers) and EVERY
    occurrence is removed — no keeper, unlike keep-first dedup, because
    a string repeated across unrelated pages carries no signal for any
    of them.

    Returns one row per document: paragraph count, removed count, the
    kept fraction, and `cleaned_fp` — md5 over the kept paragraphs'
    fingerprints in order, a value-checkable proof of exactly which
    paragraphs survived (the fingerprint-of-fingerprints stands in for
    rewriting the text so paragraph TEXT never shuffles; a real rewrite
    joins this verdict back to the exploded paragraphs map-side).

    Scale shape: the explode emits (doc_id, para_idx, 32-char fp) only;
    document frequency is one fp-keyed exchange with map-side partial
    aggregation, the verdict join re-uses the same fp hash partitioning,
    and the per-doc rebuild is the second and final exchange.  Nothing
    in the plan is proportional to pair counts — boilerplate with
    millions of occurrences costs its row count, never its square."""
    exploded = _paragraph_fps(docs, para_words)
    df_per_fp = exploded.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("df"))
    flagged = (
        exploded.join(df_per_fp, "fp")
        .select("doc_id", "para_idx", "fp",
                (F.col("df") >= min_df).alias("boiler"))
    )
    kept_fps = F.array_join(F.transform(
        F.array_sort(F.collect_list(
            F.when(~F.col("boiler"),
                   F.struct("para_idx", "fp")))),
        lambda s: s["fp"]), "")
    return (
        flagged.groupBy("doc_id")
        .agg(F.count("*").alias("n_paras"),
             F.sum(F.col("boiler").cast("long")).alias("n_removed"),
             F.md5(kept_fps).alias("cleaned_fp"))
        .select("doc_id", "n_paras", "n_removed",
                F.round((F.col("n_paras") - F.col("n_removed"))
                        / F.col("n_paras"), 6).alias("frac_kept"),
                "cleaned_fp")
        .orderBy("doc_id")
    )


def word_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) pairs of distinct word n-grams; docs shorter
    than n tokens yield no shingles.

    Computed per-row (sequence/slice/concat over the word array, then
    array_distinct + explode): ZERO shuffles — the lead()-window
    formulation this replaces repartitioned the whole corpus by doc_id
    just to look ahead n-1 words, a full extra exchange at 100 TB for
    the same output."""
    words = F.split(_norm_text(F.col("text")), " ")
    d = _spread(docs).select("doc_id", words.alias("ws")).where(F.size("ws") >= n)
    shingles = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.size("ws") - n),
        lambda i: F.concat_ws(" ", F.slice("ws", i + 1, n))))
    return d.select("doc_id", F.explode(shingles).alias("shingle"))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3,
                        threshold: float = 0.5,
                        max_bucket: int = 200,
                        slot: str = "ngram_sh",
                        recover_saturated: int = 0) -> DataFrame:
    """Near-dup pairs by exact word-n-gram Jaccard similarity.

    Shape: build the shingle->docs inverted index (one shuffle), explode
    each bucket's pair combinations in place, count per pair (second
    shuffle).  Replaces the naive index self-join — same result, two
    fewer shuffles.  The pair blowup is bounded by `max_bucket`:
    stopword-like shingles shared by more docs carry no discriminating
    signal and are dropped, exactly like saturated LSH bands at web
    scale.  CAVEAT: on copy-heavy corpora the cap suppresses exactly
    the buckets where duplication is worst — an empty pair list does
    NOT mean "no near-dups"; run `bucket_cap_report` alongside (it
    rides this operator's cached shingle table) and read
    pairs_dropped_ppm before trusting a zero.

    `recover_saturated` > 0 turns on the production remedy (VERDICT r9
    item 3): `saturated_pair_sample` thins each SATURATED bucket to an
    expected `recover_saturated` survivors and pairs those, yielding a
    bounded candidate set from exactly the buckets the cap silenced.
    PRICE THE KNOB BEFORE CHOOSING IT: candidate volume is
    O(n_saturated_buckets x recover_saturated^2) — run
    `recovery_sample_sweep` (and `bucket_cap_report` for the bucket
    count) first, or let `autosize_recover_saturated(docs,
    budget_pairs)` consume that price for you: it returns the largest
    sample whose measured candidate bill fits the budget (0 = leave
    recovery off), which is how the scale probes size their arm since
    r11 — never hand-pick this knob on an unfamiliar corpus; on a
    corpus where every doc shares stopword shingles
    (30x perturbed probe: 17.8k saturated buckets) sample=50 is ~350M
    raw candidates — a cluster-scale job, not a single-node one —
    while sample=10 prices the same recall curve at ~1/25 the volume;
    the candidates are then re-scored with their TRUE n_common by
    probing the full (uncapped) shingle table — two joins bounded by
    the candidate docs' shingles, never a corpus self-join — and the
    same `threshold` applies to the exact ratio.  Recovered pairs
    REPLACE any capped-path twin (the capped n_common undercounts by
    the saturated shingles); since jaccard is monotone in n_common, no
    capped-green pair can be lost by the swap.

    Deliberately NOT exact-duplicate-contracted (unlike
    `duplicate_clusters`): this operator's contract is the raw member-
    level pair list, whose size is inherently quadratic in copy count —
    contracting the index and re-expanding pairs was measured (r5) to
    save only ~1.6x on a 90%-copies corpus while adding ~2.5x of
    fixed stage latency at ordinary duplication levels.  Copy-heavy
    corpora should run the exact pass first and resolve through
    `duplicate_clusters`, which contracts before the quadratic
    stages."""
    # shingles hashed to int64: 8-byte shuffle keys, negligible collisions
    sh = _slot_cache(
        word_shingles(docs, n)
        .select("doc_id", F.xxhash64("shingle").alias("shingle")),
        slot)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    buckets = (
        sh.groupBy("shingle").agg(F.collect_list("doc_id").alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= max_bucket))
        .select(F.array_sort("ds").alias("ds"))
    )
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"
    )
    common = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common"))
    # threshold applies to the UNROUNDED ratio (rounding is display-
    # only), matching the oracle's WHERE — the same cross-engine cutoff
    # divergence ADVICE r4 flagged on the chunk-dedup path
    capped = (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .where(jac >= threshold)
        .withColumn("jaccard", F.round(jac, 6))
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
    if recover_saturated > 0:
        # slot-cached: referenced three times below (two semi-filters +
        # the pair join) — Spark re-executes unshared lazy subplans per
        # reference (the r8 duplicate_clusters lesson), and this one
        # re-shingles the corpus
        cand = _slot_cache(
            saturated_pair_sample(
                docs, n=n, max_bucket=max_bucket,
                sample=recover_saturated).select("doc_a", "doc_b"),
            slot + "_satcand")
        # exact re-score: true shared-shingle count from the UNCAPPED
        # index, restricted to candidate docs (left-semi prunes the
        # corpus-sized side before the shingle-keyed join).  NO forced
        # broadcast hints anywhere on this path: the candidate pair set
        # grows with the saturated-bucket count (30x perturbed already
        # OOM'd the measured 8g heap under a forced broadcast of it),
        # and AQE picks broadcast on its own whenever a side is
        # actually small — the hint only removes its ability to say no.
        a_sh = sh.join(
            cand.select(F.col("doc_a").alias("doc_id")).distinct(),
            "doc_id", "left_semi") \
            .select(F.col("doc_id").alias("doc_a"), "shingle")
        b_sh = sh.join(
            cand.select(F.col("doc_b").alias("doc_id")).distinct(),
            "doc_id", "left_semi") \
            .select(F.col("doc_id").alias("doc_b"), "shingle")
        exact = (
            cand.join(a_sh, "doc_a")
            .join(b_sh, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_common"))
        )
        # slot-cached for the same reason: the union and the anti-join
        # both reference it
        recovered = _slot_cache(
            exact.join(sa, "doc_a").join(sb, "doc_b")
            .where(jac >= threshold)
            .withColumn("jaccard", F.round(jac, 6))
            .select("doc_a", "doc_b", "n_common", "jaccard"),
            slot + "_recovered")
        capped = recovered.unionByName(
            capped.join(recovered.select("doc_a", "doc_b"),
                        ["doc_a", "doc_b"], "left_anti"))
    return capped.orderBy("doc_a", "doc_b")


def containment_pairs(docs: DataFrame, n: int = 3,
                      threshold: float = 0.8,
                      max_bucket: int = 200) -> DataFrame:
    """Asymmetric near-dup pairs by shingle CONTAINMENT — n_common over
    the SMALLER doc's shingle count (Broder's max-containment).  This
    is what Jaccard structurally misses: a paragraph quoted verbatim
    inside a 100x longer page has containment ~1 but Jaccard ~1%, so a
    Jaccard-thresholded dedup keeps both copies.  Pairs are emitted
    when containment clears `threshold`; the Jaccard score rides along
    so downstream can see exactly which pairs only containment caught.

    Scale shape: identical to ngram_jaccard_pairs (shared cached
    shingle table, same capped inverted-index bucket explode, same two
    shuffles) — only the final ratio differs, so running both costs one
    extra join over the pair list, not a second index build."""
    sh = _slot_cache(
        word_shingles(docs, n)
        .select("doc_id", F.xxhash64("shingle").alias("shingle")),
        "ngram_sh")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    buckets = (
        sh.groupBy("shingle").agg(F.collect_list("doc_id").alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= max_bucket))
        .select(F.array_sort("ds").alias("ds"))
    )
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"
    )
    common = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    cont = F.col("n_common").cast("double") / F.least("n_a", "n_b")
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .where(cont >= threshold)
        .select("doc_a", "doc_b", "n_common",
                F.round(cont, 6).alias("containment"),
                F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def contracted_pair_graph(docs: DataFrame, n: int = 3,
                          threshold: float = 0.5,
                          max_bucket: int = 200,
                          slot: str = "contracted_graph"):
    """Exact-duplicate-CONTRACTED n-gram Jaccard pair graph whose pair
    set, fanned back to members by the algebra below, reproduces
    `ngram_jaccard_pairs(docs)` EXACTLY — cap semantics included
    (VERDICT r7 item 1: the member-grain reports' numbers are derivable
    from the contracted graph without the quadratic-in-copies member
    pair bill).

    The one real subtlety is the saturation cap: member-level buckets
    drop a shingle once MORE THAN `max_bucket` DOCUMENTS carry it, so
    the contracted index applies the cap to the MEMBER count of each
    bucket (sum of copy counts over the distinct texts present), NOT
    the rep count — a shingle carried by 30 distinct texts with 300
    total copies must drop here exactly as it drops at member level.
    With that pinned, for fingerprint groups a, b with copy counts
    n_a, n_b:

      * every member pair across (a, b) shares the same surviving
        buckets as the rep pair (copies have identical shingle sets),
        so it exists at member level iff the rep pair passes the
        Jaccard threshold — n_common and both sizes are rep-level
        values — and then contributes n_a * n_b member pairs;
      * every within-group member pair (copy, copy) has
        n_common = n_self (the group's surviving-bucket count) and
        jaccard = n_self / (2 * n_sh - n_self); when that passes, the
        group contributes C(n_a, 2) member pairs.

    Returns (groups, cross, within):
      groups: (fp, rep, n_members) — one row per distinct normalized
              text, rep = min doc_id;
      cross:  (rep_a, rep_b, n_common) — DISTINCT-text pairs passing
              the threshold, rep_a < rep_b;
      within: (rep, n_self) — groups with n_members >= 2 whose
              copy-pair jaccard passes the threshold.

    Scale shape: one fingerprint groupBy (text hashed before the
    shuffle), one rep-text semi-join, then the standard capped
    inverted-index pair machinery over DISTINCT texts only — the
    quadratic stage never sees copy multiplicity; multiplicities ride
    as integer weights."""
    fp = F.md5(_norm_text(F.col("text")))
    members = docs.select(F.col("doc_id").alias("m_doc"), fp.alias("fp"))
    groups = _slot_cache(
        members.groupBy("fp").agg(F.min("m_doc").alias("rep"),
                                  F.count("*").alias("n_members")),
        slot + "_groups")
    rep_docs = docs.select("doc_id", "text").join(
        groups.select(F.col("rep").alias("r_doc")),
        F.col("doc_id") == F.col("r_doc")).select("doc_id", "text")
    sh = _slot_cache(
        word_shingles(rep_docs, n)
        .select("doc_id", F.xxhash64("shingle").alias("shingle")),
        slot + "_sh")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # weighted index: each bucket row carries (rep, copy count); the
    # cap tests the MEMBER size (sum of weights), matching member-level
    # saturation bit-for-bit
    wsh = sh.join(groups.select(F.col("rep").alias("doc_id"),
                                F.col("n_members").alias("nm")), "doc_id")
    buckets = (
        wsh.groupBy("shingle")
        .agg(F.collect_list(F.struct("doc_id", "nm")).alias("ds"),
             F.sum("nm").alias("msz"))
        .where(F.col("msz") <= max_bucket)
        .select(F.array_sort("ds").alias("ds"))
    )
    buckets = _slot_cache(buckets, slot + "_buckets")
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), "
        "y -> struct(x.doc_id AS a, y.doc_id AS b))))"
    )
    common = (
        buckets.where(F.size("ds") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.a").alias("rep_a"), F.col("p.b").alias("rep_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("rep_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("rep_b"),
                      F.col("n_sh").alias("n_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common"))
    cross = (
        common.join(sa, "rep_a").join(sb, "rep_b")
        .where(jac >= threshold)
        .select("rep_a", "rep_b", "n_common")
    )
    # surviving-bucket count per multi-member group: every bucket
    # containing a rep with nm >= 2 holds >= 2 member copies, so the
    # only cap that matters is the <= max_bucket filter already applied
    selfc = (
        buckets.select(F.explode("ds").alias("d"))
        .where(F.col("d.nm") >= 2)
        .groupBy(F.col("d.doc_id").alias("rep"))
        .agg(F.count("*").alias("n_self"))
    )
    wjac = F.col("n_self").cast("double") / (
        2 * F.col("n_sh") - F.col("n_self"))
    within = (
        selfc.join(sizes.select(F.col("doc_id").alias("rep"), "n_sh"),
                   "rep")
        .where(wjac >= threshold)
        .select("rep", "n_self")
    )
    return groups, cross, within


def ingest_corpus_index(corpus: DataFrame, n: int = 3,
                        max_bucket: int = 200,
                        recover_saturated: int = 0,
                        materialize: bool = False):
    """The resident-corpus probe structures of incremental ingest
    dedup: (distinct fingerprint set, capped shingle inverted index,
    per-doc shingle counts).  In production these are precomputed and
    stored next to the corpus; the streaming drain
    (streaming/windows.py: streaming_ingest_dedup) persists them ONCE
    and probes every micro-batch against the same copy — rebuilding a
    100 TB index per micro-batch would be the classic stream-static
    join mistake.

    `recover_saturated` > 0 (VERDICT r10 item 4) extends the tuple with
    two more resident frames so the ingest probe stops being blind to
    exactly the duplication the cap silences on a copy-heavy corpus —
    the same blindness r9 item 3 fixed for the batch pair path:
      * a thinned SATURATED probe index (h -> expected
        `recover_saturated` surviving corpus docs per saturated
        shingle, the deterministic md5-keyed Bernoulli rule of
        `saturated_pair_sample`), giving batch docs whose only shared
        shingles are cap-dropped a bounded candidate set;
      * the UNCAPPED corpus shingle table, from which recovered
        candidates are re-scored with their TRUE n_common (left-semi
        pruned to candidate docs at probe time — never a corpus join).
    Both are corpus-sized-once structures that in production live next
    to the capped index (the uncapped table IS the pre-cap index).

    `materialize=True` (one-shot multi-probe callers) computes each
    structure NOW and truncates its lineage via localCheckpoint — the
    shared shingle table is checkpointed first so the capped index and
    the per-doc sizes derive from ONE shingle pass instead of
    re-shingling the corpus each, and every returned frame embeds as a
    plain scan in a consumer's plan instead of the whole corpus-shingle
    subtree.  The streaming drain instead slot-caches the LAZY frames
    (plan-keyed residency across drains of the same corpus) and
    checkpoints the cached copies per drain — see
    streaming/windows.py:streaming_ingest_dedup."""
    fp = F.md5(_norm_text(F.col("text")))

    def keep(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True) if materialize else df

    corpus_fps = keep(corpus.select(fp.alias("c_fp")).distinct())
    c_sh = keep(word_shingles(
        corpus.select("doc_id", "text"), n).select(
        F.col("doc_id").alias("c_doc"), F.xxhash64("shingle").alias("sh")))
    c_sizes = keep(c_sh.groupBy("c_doc").agg(F.count("*").alias("n_c")))
    ok = (c_sh.groupBy("sh").agg(F.count("*").alias("df"))
          .where(F.col("df") <= max_bucket).select("sh"))
    c_idx = keep(c_sh.join(ok, "sh"))
    if recover_saturated <= 0:
        return corpus_fps, c_idx, c_sizes
    # raw-string-keyed (hash60/md5) saturated rows, so the thinning
    # replays bit-identically in the DuckDB oracle — same key algebra
    # as _saturated_buckets
    craw = keep(word_shingles(corpus.select("doc_id", "text"), n).select(
        F.col("doc_id").alias("c_doc"),
        hash60(F.col("shingle")).alias("h"),
        hash28(F.concat_ws(":", F.col("shingle"),
                           F.col("doc_id").cast("string"))).alias("skey")))
    sat = (craw.groupBy("h").agg(F.count("*").alias("s"))
           .where(F.col("s") > max_bucket))
    c_sat_probe = keep(
        craw.join(sat, "h")
        .where(F.col("skey") * F.col("s")
               < F.lit(recover_saturated * (1 << 28)).cast("long"))
        .select("h", "c_doc"))
    return corpus_fps, c_idx, c_sizes, c_sat_probe, c_sh


def incremental_ingest_dedup(corpus: DataFrame | None, batch: DataFrame,
                             n: int = 3, threshold: float = 0.5,
                             max_bucket: int = 200,
                             index=None,
                             recover_saturated: int = 0,
                             ordered: bool = True) -> DataFrame:
    """Incremental ingestion dedup: classify each NEW batch document
    against the EXISTING corpus — `exact_dup` (normalized-text
    fingerprint already present), `near_dup` (capped n-gram Jaccard vs
    some corpus doc clears `threshold`), or `new` — with the best
    corpus match and its exact integer-ppm Jaccard.  This is the shape
    production dedup actually runs at 100 TB: the resident corpus is
    deduped ONCE and each day's crawl deduplicates against it — nobody
    re-pairs 100 TB per ingest.

    Scale shape: the corpus side folds to (a) a distinct fingerprint
    set and (b) a shingle inverted index with the standard
    `max_bucket` saturation cap on CORPUS document frequency (a
    stopword-ish shingle carried by >cap corpus docs identifies
    nothing and would fan every batch doc out cap-fold) — in
    production both live precomputed next to the corpus; here they
    build in one pass.  The batch side is map-only shingling plus one
    shuffle join against the capped index and one (batch_doc,
    corpus_doc) aggregate — batch-sized, never corpus-pair-sized.
    Determinism: best match = highest integer-ppm Jaccard, ties to the
    lowest corpus doc_id; docs too short to shingle can still be
    exact dups (the fingerprint path needs no shingles).

    `index` (optional): a prebuilt ingest_corpus_index tuple — pass it
    when the SAME resident corpus is probed repeatedly (the streaming
    micro-batch drain) so the fingerprint set and capped inverted
    index persist once instead of rebuilding per call.

    `recover_saturated` > 0 (VERDICT r10 item 4): candidates are ALSO
    drawn from the thinned saturated probe index (expected that many
    surviving corpus docs per cap-dropped shingle, deterministic
    md5-keyed Bernoulli — `saturated_pair_sample`'s rule), and every
    recovered (batch, corpus) candidate is re-scored with its TRUE
    shingle overlap from the uncapped corpus table, REPLACING the
    capped-path twin (whose n_common undercounts by the saturated
    shingles; jaccard is monotone in n_common, so no capped near-dup
    verdict can be lost by the swap).  Cost: one batch-sized join
    against the (bounded) saturated probe index plus two left-semi-
    pruned joins sized by the candidate docs' shingles — never a
    corpus self-join.  Price the knob with `recovery_sample_sweep` /
    `autosize_recover_saturated` exactly as on the batch pair path."""
    fp = F.md5(_norm_text(F.col("text")))
    if index is None:
        index = ingest_corpus_index(corpus, n, max_bucket,
                                    recover_saturated=recover_saturated)
    corpus_fps, c_idx, c_sizes = index[:3]
    c_sat_probe = index[3] if len(index) > 3 else None
    c_sh_full = index[4] if len(index) > 4 else None
    b_fp = batch.select(F.col("doc_id").alias("b_doc"), fp.alias("b_fp"))
    exact = (
        b_fp.join(corpus_fps, F.col("b_fp") == F.col("c_fp"), "left")
        .select("b_doc", F.col("c_fp").isNotNull().alias("is_exact"))
    )
    b_sh = word_shingles(
        batch.select("doc_id", "text"), n).select(
        F.col("doc_id").alias("b_doc"), F.xxhash64("shingle").alias("sh"))
    b_sizes = b_sh.groupBy("b_doc").agg(F.count("*").alias("n_b"))
    common = (
        b_sh.join(c_idx, "sh")
        .groupBy("b_doc", "c_doc").agg(F.count("*").alias("n_common"))
    )
    if c_sat_probe is not None and recover_saturated > 0:
        # recovered candidates: batch shingles keyed the same raw-
        # string hash60 way as the resident saturated probe index
        b_sat = word_shingles(
            batch.select("doc_id", "text"), n).select(
            F.col("doc_id").alias("b_doc"),
            hash60(F.col("shingle")).alias("h"))
        cand = (b_sat.join(c_sat_probe, "h")
                .select("b_doc", "c_doc").distinct())
        # exact re-score from the UNCAPPED corpus table, both sides
        # left-semi pruned to candidate docs before the shingle join
        b_sub = b_sh.join(cand.select("b_doc").distinct(),
                          "b_doc", "left_semi")
        c_sub = c_sh_full.join(cand.select("c_doc").distinct(),
                               "c_doc", "left_semi")
        rec_common = (
            cand.join(b_sub, "b_doc")
            .join(c_sub, ["c_doc", "sh"])
            .groupBy("b_doc", "c_doc").agg(F.count("*").alias("n_common"))
        )
        # recovered rows REPLACE capped twins (capped n_common
        # undercounts by the saturated shingles)
        common = rec_common.unionByName(
            common.join(rec_common.select("b_doc", "c_doc"),
                        ["b_doc", "c_doc"], "left_anti"))
    ppm = F.expr(
        "(n_common * 1000000) div (n_b + n_c - n_common)")
    scored = (
        common.join(b_sizes, "b_doc").join(c_sizes, "c_doc")
        .select("b_doc", "c_doc", ppm.alias("jac_ppm"))
    )
    rk = F.row_number().over(
        Window.partitionBy("b_doc")
        .orderBy(F.desc("jac_ppm"), F.asc("c_doc")))
    best = (
        scored.withColumn("rk", rk)
        .groupBy("b_doc")
        .agg(F.count("*").alias("n_candidates"),
             F.max(F.when(F.col("rk") == 1, F.col("c_doc")))
             .alias("best_match_id"),
             F.max(F.when(F.col("rk") == 1, F.col("jac_ppm")))
             .alias("best_jaccard_ppm"))
    )
    thr_ppm = int(threshold * 1_000_000)
    verdict = (
        F.when(F.col("is_exact"), "exact_dup")
        .when(F.col("best_jaccard_ppm") >= thr_ppm, "near_dup")
        .otherwise("new"))
    out = (
        exact.join(best, "b_doc", "left")
        .select(F.col("b_doc").alias("doc_id"),
                F.col("is_exact").alias("is_exact_dup"),
                F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
                F.coalesce("best_match_id", F.lit(-1))
                .alias("best_match_id"),
                F.coalesce("best_jaccard_ppm", F.lit(0))
                .alias("best_jaccard_ppm"),
                verdict.alias("verdict"))
    )
    # ordered=False (r12 optimization round): sinks that re-sort after
    # a read-back (the streaming drain writes per-batch parquet whose
    # row order is discarded) skip the global range-exchange + sort —
    # one fewer per-micro-batch stage; row SET is identical.
    return out.orderBy("doc_id") if ordered else out


def frequent_ngrams(docs: DataFrame, n: int = 8, k: int = 50) -> DataFrame:
    """Memorization-risk scan: the k word-n-grams appearing in the most
    DISTINCT documents — long verbatim strings repeated across many
    docs are exactly what a model memorizes and regurgitates (license
    headers, templated disclaimers), and the output is the removal list
    remove_duplicate_spans / boilerplate_paragraphs act on.

    Scale shape: per-doc distinct shingles are the shared zero-shuffle
    map (word_shingles), document frequency is one shingle-keyed
    partial agg, and the top-k is TakeOrderedAndProject (per-partition
    heads merged on one reducer — no global sort)."""
    df_per = (
        word_shingles(docs, n)
        .groupBy("shingle").agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "shingle")
        .limit(k)
    )
    w = Window.partitionBy(bounded_window_key("shingle")).orderBy(F.desc("df"), "shingle")  # k rows
    return (
        df_per.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", F.col("shingle").alias("ngram"), "df")
        .orderBy("rank")
    )


def growth_curve(docs: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Corpus dedup-saturation curve: ingest docs in doc_id order split
    into `n_buckets` equal id-range slices, and per slice count how
    many docs carry a NEVER-SEEN-BEFORE content fingerprint — the
    marginal-utility-of-more-data curve.  A crawl whose late buckets
    add few new fingerprints has saturated its sources: the next 10 TB
    buys storage, not training signal.

    Scale shape: first-occurrence is the same bounded per-fingerprint
    rank window as paragraph_dedup (never a global window); the bucket
    id is exact integer math against one broadcast max-id scalar (the
    sanctioned one-row crossJoin); cumulative stats run over the
    n_buckets-row aggregate only."""
    base = docs.select(
        "doc_id", F.md5(_norm_text(F.col("text"))).alias("fp"))
    mx = base.agg(F.max("doc_id").alias("m"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    flagged = (
        base.withColumn("is_new",
                        (F.row_number().over(w) == 1).cast("long"))
        .crossJoin(F.broadcast(mx))
        .select(F.expr(f"CAST(doc_id * {n_buckets} DIV (m + 1) AS INT)")
                .alias("bucket"), "is_new")
    )
    agg = flagged.groupBy("bucket").agg(
        F.count("*").alias("n_docs"), F.sum("is_new").alias("n_new"))
    cw = Window.partitionBy(bounded_window_key("bucket")) \
        .orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (
        agg.withColumn("cum_docs", F.sum("n_docs").over(cw))
        .withColumn("cum_new", F.sum("n_new").over(cw))
        .select("bucket", "n_docs", "n_new", "cum_docs", "cum_new",
                F.round(F.col("cum_new") / F.col("cum_docs"), 6)
                .alias("distinct_frac"))
        .orderBy("bucket")
    )


def winnowing_fingerprints(docs: DataFrame, n: int = 3,
                           window: int = 8) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing): hash every
    positional word n-gram, slide a `window` over the hash sequence,
    keep each window's minimum — a deterministic, position-robust
    fingerprint set per document.

    Computed entirely per-row (positional gram hashes, then a sliding
    array_min over the hash array): ZERO shuffles — the previous
    lead()+window formulation repartitioned the whole token stream by
    doc_id just to look ahead, a full corpus exchange at 100 TB for
    the same fingerprint values.  Trailing windows truncate exactly
    like ROWS BETWEEN CURRENT ROW AND window-1 FOLLOWING (F.slice past
    the array end returns the remaining elements), so the per-doc
    fingerprint SET is bit-identical to the window formulation and the
    DuckDB oracle is unchanged.  The gram-hash array is projected to a
    real column before the sliding lambda slices it (HOF lambdas
    re-evaluate captured expressions per element)."""
    words = F.split(_norm_text(F.col("text")), " ")
    d = _spread(docs).select("doc_id", words.alias("ws")).where(
        F.size("ws") >= n)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("ws") - n + 1),
        lambda i: hash60(F.concat_ws(" ", F.slice("ws", i, n))))
    fps = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size("hs")),
        lambda j: F.array_min(F.slice("hs", j, window))))
    return (
        d.select("doc_id", grams.alias("hs"))
        .select("doc_id", F.explode(fps).alias("fp"))
    )


def winnowing_pairs(docs: DataFrame, min_shared: int = 2) -> DataFrame:
    """Near-dup candidates: documents sharing >= min_shared winnowing
    fingerprints (the MOSS-style detector as a groupBy join)."""
    fp = _slot_cache(winnowing_fingerprints(docs), "winnow_fp")
    buckets = (
        fp.groupBy("fp").agg(F.collect_list("doc_id").alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= 200))
        .select(F.array_sort("ds").alias("ds"))
    )
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"
    )
    return (
        buckets.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count("*").alias("shared_fingerprints"))
        .where(F.col("shared_fingerprints") >= min_shared)
        .orderBy("doc_a", "doc_b")
    )


def minhash_signatures(docs: DataFrame, n: int = 3) -> DataFrame:
    """doc_id -> array<long> of N_PERM minhash values.  One md5-derived
    28-bit base hash per shingle, then permutation i is the universal
    hash (a_i*h + b_i) mod 2^31-1 with literal (a_i, b_i) constants.

    Computed entirely per-row (shingle array + array_min over an
    arithmetic transform): ZERO shuffles — unlike the explode+groupBy
    formulation this needs no repartition by doc_id and no aggregation
    exchange, so at 100 TB the signature stage is a pure map over the
    corpus.  One hash call per shingle (not N_PERM of them) keeps the
    map cheap; the 32 permutations are 3-op integer arithmetic."""
    words = F.split(_norm_text(F.col("text")), " ")
    d = _spread(docs).select("doc_id", words.alias("ws")).where(F.size("ws") >= n)
    shingles = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.size("ws") - n),
        lambda i: F.concat_ws(" ", F.slice("ws", i + 1, n))))
    d = d.select("doc_id", F.transform(shingles, hash28).alias("hs"))

    # ONE F.expr parse for the 32-permutation array (r11 optimization
    # round): the Column-builder form issued py4j calls per permutation
    # lambda, a measurable slice of per-invocation build time; the SQL
    # string is the identical integer arithmetic ((h*a+b) mod M31 on
    # BIGINTs, array_min over the transform), so signatures are
    # bit-identical.
    sig = F.expr("array(" + ",".join(
        f"array_min(transform(hs, h -> (h * {a}L + {b}L) % {MERSENNE31}L))"
        for a, b in perm_consts()) + ")")
    return d.select("doc_id", sig.alias("signature"))


def _minhash_bands(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) rows: the signature banded into N_BANDS
    md5 band-buckets — the shared banding stage of minhash_lsh_pairs
    and lsh_bucket_stats."""
    # one F.expr parse (same shape/typing as the former Column builder:
    # band stays INT, bucket the md5 of the comma-joined row casts)
    bands_sql = "array(" + ",".join(
        "named_struct('band', {b}, 'bucket', md5(concat_ws(',', {rows})))"
        .format(b=b, rows=",".join(
            f"CAST(signature[{b * ROWS_PER_BAND + r}] AS STRING)"
            for r in range(ROWS_PER_BAND)))
        for b in range(N_BANDS)) + ")"
    return sig.select(
        "doc_id", F.explode(F.expr(bands_sql)).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def lsh_bucket_stats(docs: DataFrame, n: int = 3,
                     max_bucket: int = 200) -> DataFrame:
    """Bucket-size skew report for the MinHash-LSH banded join — the
    diagnostic behind the `max_bucket` saturation cap: per band, how
    many buckets are singletons (no pairs), pairable (2..cap), or
    saturated (> cap, dropped), how many docs the drop forfeits, and
    the candidate-pair volume the pairable buckets will explode into
    (sum of C(sz, 2)).  Run this BEFORE the pair pass at a new scale:
    pair_candidates is the shuffle bill, and a fat n_saturated says the
    banding is too coarse (fewer rows per band -> more selective
    buckets).

    Scale shape: the signature map is the shared zero-shuffle stage,
    sizes are one (band, bucket)-keyed partial agg, and the report
    collapses to N_BANDS rows — the whole diagnostic is strictly
    cheaper than the pair pass it sizes."""
    sig = _slot_cache(minhash_signatures(docs, n), "minhash_sig")
    sz = F.col("sz")
    pairable = (sz >= 2) & (sz <= max_bucket)
    return (
        _minhash_bands(sig)
        .groupBy("band", "bucket").agg(F.count("*").alias("sz"))
        .groupBy("band")
        .agg(F.count("*").alias("n_buckets"),
             F.sum((sz == 1).cast("long")).alias("n_singleton"),
             F.sum(pairable.cast("long")).alias("n_pairable"),
             F.sum((sz > max_bucket).cast("long")).alias("n_saturated"),
             F.sum(F.when(sz > max_bucket, sz).otherwise(0))
             .alias("docs_in_saturated"),
             F.max(sz).alias("max_bucket_sz"),
             F.sum(F.when(pairable, (sz * (sz - 1) / 2).cast("long"))
                   .otherwise(0)).alias("pair_candidates"))
        .orderBy("band")
    )


def _affinity_report(cells: DataFrame) -> DataFrame:
    """Shared tail of the two affinity formulations: aggregate weighted
    (sa, sb) cells to the unordered matrix with integer-ppm shares."""
    agg = (
        cells.groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"))
        .agg(F.sum("w").alias("n_pairs"))
    )
    tw = Window.partitionBy(  # over the |sources|^2-bounded matrix only
        bounded_window_key("source_a"))
    return (
        agg.withColumn("_t", F.sum("n_pairs").over(tw))
        .select("source_a", "source_b", "n_pairs",
                F.expr("(n_pairs * 1000000) div greatest(_t, 1)")
                .alias("share_ppm"),
                (F.col("source_a") != F.col("source_b"))
                .alias("is_cross_source"))
        .orderBy("source_a", "source_b")
    )


def dedup_source_affinity(docs: DataFrame,
                          threshold: float = 0.1) -> DataFrame:
    """Cross-source duplication affinity matrix: near-dup MEMBER pairs
    (exact n-gram Jaccard, capped inverted index) rolled up to the
    UNORDERED (source, source) grain with each cell's share of all
    pairs in exact integer ppm — the curation report that says which
    crawls copy from which (news mirrors syndicating wire text, a crawl
    re-ingesting wikipedia), i.e. where cross-corpus dedup budget
    actually goes.  Within-source cells (the diagonal) measure internal
    redundancy; off-diagonal cells are flagged is_cross_source.

    Member-pair counts are computed ALGEBRAICALLY from the contracted
    pair graph (VERDICT r7 item 1) — the quadratic-in-copies member
    pair list is never materialized:

      * a cross-text rep pair (a, b) contributes
        cnt_a(s) * cnt_b(s') member pairs to cell (s, s') for every
        source combination, where cnt_x is x's per-source copy count;
      * a multi-copy group passing the within-group jaccard contributes
        C(cnt(s), 2) to the diagonal and cnt(s) * cnt(s') off it.

    `tests/test_invariants.py` reconciles this against the
    member-level formulation (`dedup_source_affinity_member`) at gate
    scale; `contracted_pair_graph`'s docstring carries the cap-
    semantics proof.

    Scale shape: contraction before any quadratic stage; the pair list
    is distinct-text-sized; source multiplicities join as
    |sources|-bounded weights per group, and the share window runs
    over the tiny matrix."""
    groups, cross, within = contracted_pair_graph(docs,
                                                  threshold=threshold)
    srccnt = (
        docs.select(F.md5(_norm_text(F.col("text"))).alias("fp"), "source")
        .groupBy("fp", "source").agg(F.count("*").alias("cnt"))
        .join(groups.select("fp", "rep"), "fp")
        .select("rep", "source", "cnt")
    )
    srccnt = _slot_cache(srccnt, "affinity_srccnt")
    ca = srccnt.select(F.col("rep").alias("rep_a"),
                       F.col("source").alias("sa"),
                       F.col("cnt").alias("cnt_a"))
    cb = srccnt.select(F.col("rep").alias("rep_b"),
                       F.col("source").alias("sb"),
                       F.col("cnt").alias("cnt_b"))
    cross_cells = (
        cross.join(ca, "rep_a").join(cb, "rep_b")
        .select("sa", "sb", (F.col("cnt_a") * F.col("cnt_b")).alias("w"))
    )
    wa = srccnt.select(F.col("rep").alias("w_rep"),
                       F.col("source").alias("sa"),
                       F.col("cnt").alias("cnt_a"))
    wb = srccnt.select(F.col("rep").alias("w_rep"),
                       F.col("source").alias("sb"),
                       F.col("cnt").alias("cnt_b"))
    within_cells = (
        within.select(F.col("rep").alias("w_rep"))
        .join(wa, "w_rep").join(wb, "w_rep")
        .where(F.col("sa") <= F.col("sb"))
        .select("sa", "sb",
                F.when(F.col("sa") == F.col("sb"),
                       F.expr("cnt_a * (cnt_a - 1) div 2"))
                .otherwise(F.col("cnt_a") * F.col("cnt_b")).alias("w"))
        # a lone copy in a source yields ZERO diagonal pairs — drop the
        # cell entirely, or the matrix grows rows member level never has
        .where(F.col("w") > 0)
    )
    return _affinity_report(cross_cells.unionByName(within_cells))


def dedup_source_affinity_member(docs: DataFrame,
                                 threshold: float = 0.1) -> DataFrame:
    """Member-level reference formulation of `dedup_source_affinity`
    (the pre-r8 implementation): materializes the member pair list and
    rolls it up directly.  Kept as the reconciliation oracle for the
    contracted algebra — quadratic in copy count, so not the production
    path."""
    pairs = ngram_jaccard_pairs(docs, threshold=threshold) \
        .select("doc_a", "doc_b")
    src = docs.select("doc_id", "source")
    joined = (
        pairs.join(src.select(F.col("doc_id").alias("doc_a"),
                              F.col("source").alias("sa")), "doc_a")
        .join(src.select(F.col("doc_id").alias("doc_b"),
                         F.col("source").alias("sb")), "doc_b")
    )
    return _affinity_report(joined.select("sa", "sb", F.lit(1).alias("w")))


def lsh_band_yield(docs: DataFrame, n: int = 3,
                   max_bucket: int = 200) -> DataFrame:
    """Band-count tuning curve for the MinHash-LSH join: per band, how
    many candidate pairs are FIRST discovered at that band (min band
    index over the pair's matching bands), cumulative pairs, and the
    cumulative share of all candidates in exact integer ppm — the curve
    that says how many of the N_BANDS bands actually pay for their
    shuffle (a flat tail means fewer bands catch the same candidates at
    a fraction of the banding cost; a rising tail says the banding is
    load-bearing).  Completes the LSH sizing family next to
    lsh_bucket_stats (bucket skew) and minhash_recall (quality).

    Scale shape: same shared signature slot and capped in-bucket pair
    explode as the pair pass (id-only rows, saturated buckets dropped),
    then one (pair)-keyed min aggregation and an N_BANDS-row report —
    the cumulative window runs over at most N_BANDS rows."""
    sig = _slot_cache(minhash_signatures(docs, n), "minhash_sig")
    bands = _minhash_bands(sig)
    buckets = (
        bands.groupBy("band", "bucket").agg(F.collect_list("doc_id").alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= max_bucket))
        .select("band", F.array_sort("ds").alias("ds"))
    )
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"
    )
    first = (
        buckets.select("band", F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.min("band").alias("band"))
    )
    per = first.groupBy("band").agg(F.count("*").alias("n_new_pairs"))
    spine = (
        docs.sparkSession.range(N_BANDS)
        .select(F.col("id").cast("int").alias("band"))
    )
    cw = Window.partitionBy(bounded_window_key("band")) \
        .orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    tw = Window.partitionBy(bounded_window_key("band")) \
        .orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        spine.join(per, "band", "left")
        .withColumn("n_new_pairs",
                    F.coalesce("n_new_pairs", F.lit(0)).cast("long"))
        .withColumn("cum_pairs", F.sum("n_new_pairs").over(cw))
        .withColumn("_total", F.sum("n_new_pairs").over(tw))
        .select("band", "n_new_pairs", "cum_pairs",
                F.expr("(cum_pairs * 1000000) div greatest(_total, 1)")
                .alias("cum_share_ppm"))
        .orderBy("band")
    )


def bucket_cap_report(docs: DataFrame, n: int = 3,
                      max_bucket: int = 200,
                      slot: str = "ngram_sh") -> DataFrame:
    """Cap-saturation audit for the capped-bucket pair generators
    (VERDICT r8 items 3/4): the `max_bucket` cap that bounds the
    quadratic in-bucket pair explode SILENTLY drops every shingle
    bucket larger than the cap — and on a copy-heavy corpus (every
    bucket holding >= cap verbatim copies) the near-dup pair queries
    return "no duplicates" precisely where duplication is worst (the
    100x replica probe recorded 0 pairs for exactly this reason).
    This report makes the suppression visible and gated: run it next
    to any capped pair pass; a large `pairs_dropped_ppm` means the
    pair list is NOT "the corpus has no near-dups" but "the cap ate
    them — contract exact copies first (duplicate_clusters) or raise
    the cap".

    One row: multi-doc bucket counts (total / dropped / ppm), the
    algebraic pair mass C(s,2) per bucket (total / dropped / ppm —
    never materialized, same counting trick as shard_dedup_leakage),
    doc reach (docs with shingles / docs touching a dropped bucket /
    ppm), and the cap-survivor pair share.

    Scale shape: rides the SAME slot-cached hashed-shingle table as
    ngram_jaccard_pairs / containment_pairs (zero extra map work in a
    dedup session); one groupBy(shingle) for bucket sizes, integer
    aggregates over the bucket-size table, one shingle-keyed semi-join
    for dropped-doc reach; the one-row frames fold in as broadcast
    scalar crossJoins (the sanctioned class)."""
    sh = _slot_cache(
        word_shingles(docs, n)
        .select("doc_id", F.xxhash64("shingle").alias("shingle")),
        slot)
    bs = sh.groupBy("shingle").agg(F.count("*").alias("s")) \
        .where(F.col("s") >= 2)
    agg = bs.agg(
        F.coalesce(F.count("*"), F.lit(0)).alias("n_buckets"),
        F.coalesce(F.sum(F.expr(
            f"CASE WHEN s > {max_bucket} THEN 1 ELSE 0 END")), F.lit(0))
        .cast("long").alias("n_dropped_buckets"),
        F.coalesce(F.sum(F.expr("s * (s - 1) div 2")), F.lit(0))
        .cast("long").alias("pairs_total"),
        F.coalesce(F.sum(F.expr(
            f"CASE WHEN s > {max_bucket} THEN s * (s - 1) div 2 "
            f"ELSE 0 END")), F.lit(0)).cast("long").alias("pairs_dropped"))
    dropped_docs = (
        sh.join(bs.where(F.col("s") > max_bucket).select("shingle"),
                "shingle")
        .agg(F.countDistinct("doc_id").alias("n_docs_in_dropped"))
    )
    all_docs = sh.agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        agg.crossJoin(F.broadcast(dropped_docs))
        .crossJoin(F.broadcast(all_docs))
        .select(
            "n_buckets", "n_dropped_buckets",
            F.expr("(n_dropped_buckets * 1000000) div greatest(n_buckets, 1)")
            .alias("dropped_bucket_ppm"),
            "pairs_total", "pairs_dropped",
            F.expr("(pairs_dropped * 1000000) div greatest(pairs_total, 1)")
            .alias("pairs_dropped_ppm"),
            "n_docs", "n_docs_in_dropped",
            F.expr("(n_docs_in_dropped * 1000000) div greatest(n_docs, 1)")
            .alias("docs_in_dropped_ppm"),
            F.expr("((pairs_total - pairs_dropped) * 1000000) "
                   "div greatest(pairs_total, 1)")
            .alias("survivor_pair_ppm"))
    )


BUCKET_CAP_SWEEP = (5, 10, 25, 50, 100, 200)


def bucket_cap_sweep(docs: DataFrame, n: int = 3,
                     caps: tuple = BUCKET_CAP_SWEEP) -> DataFrame:
    """Cap-TUNING curve, the sizing table behind bucket_cap_report's
    single-cap audit: for each candidate `max_bucket` value, how many
    multi-doc shingle buckets survive and what share of the algebraic
    C(s,2) pair mass the cap would drop — what a corpus team reads to
    pick the cap BEFORE running the pair pass (too low: near-dup recall
    silently collapses on copy-heavy corpora; too high: the in-bucket
    explode goes quadratic on stopword shingles).

    Scale shape: the per-bucket table collapses to the BUCKET-SIZE
    HISTOGRAM first (groupBy(s): rows bounded by distinct bucket sizes,
    a few hundred at any corpus scale), and the |caps| x |sizes| sweep
    joins two bounded tables — the corpus-sized work is exactly one
    groupBy(shingle) on the slot-cached hashed-shingle table that the
    pair generators already built."""
    sh = _slot_cache(
        word_shingles(docs, n)
        .select("doc_id", F.xxhash64("shingle").alias("shingle")),
        "ngram_sh")
    hist = (
        sh.groupBy("shingle").agg(F.count("*").alias("s"))
        .where(F.col("s") >= 2)
        .groupBy("s").agg(F.count("*").alias("n_b"))
        .select("s", "n_b",
                F.expr("n_b * (s * (s - 1) div 2)").alias("pair_mass"))
    )
    spine = docs.sparkSession.createDataFrame(
        [(int(c),) for c in caps], "cap int")
    per = (
        F.broadcast(spine).crossJoin(hist)
        .groupBy("cap")
        .agg(F.coalesce(F.sum("n_b"), F.lit(0)).alias("n_buckets"),
             F.coalesce(F.sum(F.when(F.col("s") > F.col("cap"),
                                     F.col("n_b"))), F.lit(0))
             .cast("long").alias("n_dropped_buckets"),
             F.coalesce(F.sum("pair_mass"), F.lit(0)).alias("pairs_total"),
             F.coalesce(F.sum(F.when(F.col("s") > F.col("cap"),
                                     F.col("pair_mass"))), F.lit(0))
             .cast("long").alias("pairs_dropped"))
    )
    return (
        per.select(
            "cap", "n_buckets", "n_dropped_buckets",
            "pairs_total", "pairs_dropped",
            F.expr("(pairs_dropped * 1000000) div greatest(pairs_total, 1)")
            .alias("pairs_dropped_ppm"),
            F.expr("((pairs_total - pairs_dropped) * 1000000) "
                   "div greatest(pairs_total, 1)").alias("survivor_pair_ppm"))
        .orderBy("cap")
    )


def saturated_pair_sample(docs: DataFrame, n: int = 3,
                          max_bucket: int = 200, sample: int = 50,
                          min_shared: int = 1) -> DataFrame:
    """Deterministic sampled RECOVERY of cap-saturated shingle buckets —
    the operator-level remedy to what bucket_cap_report only measures:
    the capped pair generators drop every bucket larger than
    `max_bucket`, so on copy-heavy corpora the heaviest duplication
    yields zero signal.  This pass keeps an expected `sample` docs per
    SATURATED bucket via deterministic Bernoulli thinning — keep a row
    iff skey * s < sample * 2^28, where skey is the engine-portable
    28-bit md5 key of (shingle, doc_id) and s the bucket size — and
    pairs up only the survivors, so the heavy-duplication neighborhoods
    surface (which docs, how strongly connected) at O(sample^2) bounded
    cost per bucket.  Output: (doc_a, doc_b, n_shared_saturated) for
    pairs sharing >= `min_shared` sampled saturated shingles.

    Thinning beats per-bucket top-`sample` ranking at scale ON PURPOSE:
    an exact rank needs a window over the bucket, and a web-scale
    stopword bucket puts 1e9 rows in one task — the very shape VERDICT
    r8 item 1 outlawed; the Bernoulli filter is a map-side predicate
    after one bucket-size join.  Survivor counts are Binomial(s,
    sample/s) — expected `sample`, concentrated; a 4x safety cap still
    bounds the explode if a bucket lands far in the tail.  Everything
    is md5-derived, so the DuckDB oracle replays bit-identically.

    Scale shape: one groupBy(h) for sizes, one equi-join of the shingle
    table against the (small) saturated-bucket list, the same in-bucket
    pair explode as ngram_jaccard_pairs over <= 4*sample-doc buckets,
    one pair-keyed count.  Text is hashed once and never shuffled."""
    sh, sat = _saturated_buckets(docs, n, max_bucket)
    kept = (
        sh.join(sat, "h")
        .where(F.col("skey") * F.col("s")
               < F.lit(sample * (1 << 28)).cast("long"))
    )
    buckets = (
        kept.groupBy("h").agg(F.collect_list("doc_id").alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= 4 * sample))
        .select(F.array_sort("ds").alias("ds"))
    )
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"
    )
    return (
        buckets.select(F.explode(pair_expr).alias("p"))
        # strict guard: if two DISTINCT shingles of one doc hash60-
        # collide into a single bucket, the sorted ds holds that doc
        # twice and positional pairing would emit a self-pair; the
        # string-keyed oracle can never produce one (ADVICE r9 low #1)
        .where(F.col("p.a") < F.col("p.b"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_saturated"))
        .where(F.col("n_shared_saturated") >= min_shared)
        .orderBy("doc_a", "doc_b")
    )


RECOVERY_SWEEP_SAMPLES = (1, 2, 3, 5, 8, 12)


def _saturated_buckets(docs: DataFrame, n: int,
                       max_bucket: int) -> tuple:
    """Shared front half of the saturated-bucket recovery family
    (`saturated_pair_sample` / `recovery_sample_sweep` /
    `recovery_yield_by_size`): the full shingle-key table (lazy — one
    corpus pass per consumer; consumers slot-cache their bounded
    derivations, not this) and the SMALL saturated (h, s) bucket list,
    slot-cached because every consumer joins or aggregates it and it is
    |saturated buckets| rows regardless of corpus size."""
    sh = word_shingles(docs, n).select(
        "doc_id", hash60(F.col("shingle")).alias("h"),
        hash28(F.concat_ws(
            ":", F.col("shingle"),
            F.col("doc_id").cast("string"))).alias("skey"))
    sat = _slot_cache(
        sh.groupBy("h").agg(F.count("*").alias("s"))
        .where(F.col("s") > max_bucket),
        f"satbk_{n}_{max_bucket}")
    return sh, sat


def _sat_pair_expr() -> Column:
    # built lazily: F.expr needs an active SparkContext, and this module
    # imports before any session exists
    return F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"
    )


def recovery_sample_sweep(docs: DataFrame, n: int = 3,
                          max_bucket: int = 200,
                          samples: tuple = RECOVERY_SWEEP_SAMPLES,
                          ) -> DataFrame:
    """Tuning curve for the `recover_saturated` knob — the sample-axis
    twin of `bucket_cap_sweep`'s cap axis (round 9 gave the cap its
    curve; the recovery sample deserves the same first-class
    observability instead of a hidden constant).  One row per candidate
    `sample` value: surviving thinned rows, buckets in the pairable
    2..4*sample range, distinct candidate pairs, and distinct docs
    reached — the numbers RECALL_r10.json prices in seconds/recall,
    here as a single bounded query an operator can run before choosing
    the knob.

    Scale shape: the corpus-sized work is ONE groupBy(shingle) + one
    join against the (small) saturated-bucket list, thinned ONCE at
    max(samples) — the keep rule `skey * s < sample * 2^28` is monotone
    in `sample`, so the per-sample survivor sets are nested and the
    6-row spine fans out over only ~max(samples) expected rows per
    saturated bucket, never the corpus.  Pair counting reuses the same
    bounded in-bucket explode as `saturated_pair_sample` (O(sample^2)
    per bucket).  All keys are md5-derived: the DuckDB oracle replays
    the sweep bit-identically."""
    spark = docs.sparkSession
    smax = max(samples)
    sh, sat = _saturated_buckets(docs, n, max_bucket)
    # thinned ONCE at the largest sample: one corpus pass, survivor set
    # ~smax expected rows per saturated bucket — the bounded table the
    # 6-row spine fans out over
    # slot names carry the knobs (ADVICE r10 low #2): alternating calls
    # with different (n, max_bucket, samples) must not thrash one slot,
    # and prefix-based release_slots can target a single configuration
    sweep_key = f"{n}_{max_bucket}_{'-'.join(str(s) for s in sorted(samples))}"
    kept_max = _slot_cache(
        sh.join(sat, "h")
        .where(F.col("skey") * F.col("s")
               < F.lit(smax * (1 << 28)).cast("long")),
        f"recsweep_kept_{sweep_key}")
    spine = spark.createDataFrame(
        [(int(x),) for x in sorted(samples)], "sample int")
    sat_count = sat.agg(F.count("*").alias("n_saturated_buckets"))
    kept = (
        F.broadcast(spine).crossJoin(kept_max)
        .where(F.col("skey") * F.col("s")
               < F.col("sample").cast("long") * F.lit(1 << 28).cast("long"))
    )
    per_bucket = (kept.groupBy("sample", "h")
                  .agg(F.collect_list("doc_id").alias("ds")))
    buckets_ok = (per_bucket
                  .where((F.size("ds") >= 2)
                         & (F.size("ds") <= 4 * F.col("sample")))
                  .select("sample", F.array_sort("ds").alias("ds")))
    pairs = _slot_cache(
        buckets_ok.select("sample", F.explode(_sat_pair_expr()).alias("p"))
        .where(F.col("p.a") < F.col("p.b"))
        .select("sample", F.col("p.a").alias("doc_a"),
                F.col("p.b").alias("doc_b"))
        .distinct(),
        f"recsweep_pairs_{sweep_key}")
    agg_rows = kept.groupBy("sample").agg(
        F.count("*").alias("n_kept_rows"))
    agg_ok = buckets_ok.groupBy("sample").agg(
        F.count("*").alias("n_ok_buckets"))
    agg_pairs = pairs.groupBy("sample").agg(
        F.count("*").alias("n_candidate_pairs"))
    agg_docs = (pairs.select(
        "sample", F.explode(F.array("doc_a", "doc_b")).alias("d"))
        .groupBy("sample").agg(
            F.countDistinct("d").alias("n_candidate_docs")))
    return (
        spine.crossJoin(F.broadcast(sat_count))  # one-row scalar attach
        .join(agg_rows, "sample", "left")
        .join(agg_ok, "sample", "left")
        .join(agg_pairs, "sample", "left")
        .join(agg_docs, "sample", "left")
        .select(
            "sample",
            F.col("n_saturated_buckets").cast("long")
            .alias("n_saturated_buckets"),
            F.coalesce("n_kept_rows", F.lit(0)).cast("long")
            .alias("n_kept_rows"),
            F.coalesce("n_ok_buckets", F.lit(0)).cast("long")
            .alias("n_ok_buckets"),
            F.coalesce("n_candidate_pairs", F.lit(0)).cast("long")
            .alias("n_candidate_pairs"),
            F.coalesce("n_candidate_docs", F.lit(0)).cast("long")
            .alias("n_candidate_docs"))
        .orderBy("sample")
    )


def autosize_recover_saturated(docs: DataFrame, budget_pairs: int,
                               n: int = 3, max_bucket: int = 200,
                               samples: tuple = RECOVERY_SWEEP_SAMPLES,
                               max_sample: int = 100) -> int:
    """Pick the `recover_saturated` sample whose PRICED candidate-pair
    bill fits `budget_pairs` — the knob-closing consumer of
    `recovery_sample_sweep` (VERDICT r10 item 2): round 10 priced the
    quadratic bill but nothing consumed the price, so the footgun that
    OOM'd the hand-picked sample=50 on the 30x perturbed corpus
    (17.8k saturated buckets x C(200,2) ~ 350M raw candidates against
    an 8g heap) survived.  This helper is what probes and production
    configs call instead of guessing.

    Mechanics: run the sweep once (a bounded query; the |samples|-row
    result is collected — a config decision, not data movement), take
    the largest swept sample whose MEASURED n_candidate_pairs fits the
    budget, then — only when even the largest swept sample fits —
    extrapolate along the quadratic bill(s) ~ bill(s_top) *
    (s / s_top)^2 (candidates per saturated bucket are C(survivors, 2)
    with survivors ~ s), floored and capped at `max_sample`.  Returns 0
    when even min(samples) exceeds the budget: recovery on this corpus
    is a cluster-scale job at any setting — raise the budget
    deliberately, don't let a default do it."""
    import math
    rows = {r["sample"]: r["n_candidate_pairs"]
            for r in recovery_sample_sweep(
                docs, n=n, max_bucket=max_bucket,
                samples=samples).collect()}
    fits = [s for s in sorted(rows) if rows[s] <= budget_pairs]
    if not fits:
        return 0
    best = fits[-1]
    top = max(rows)
    if best == top and rows[top] > 0:
        best = min(max_sample,
                   int(top * math.sqrt(budget_pairs / rows[top])))
        best = max(best, top)
    return best


def recovery_autosize_curve(docs: DataFrame, budgets: tuple,
                            n: int = 3, max_bucket: int = 200,
                            samples: tuple = RECOVERY_SWEEP_SAMPLES
                            ) -> DataFrame:
    """The gated, declarative view of `autosize_recover_saturated`:
    one row per candidate pair budget with the largest SWEPT sample
    whose measured candidate bill fits it (0 = recovery off at this
    budget) and that choice's bill.  Confined to the swept samples so
    the DuckDB oracle replays the selection exactly; the scalar helper
    adds the quadratic extrapolation beyond the swept range for
    production sizing.

    Scale shape: everything corpus-sized is inside the (bounded) sweep;
    the budget spine is a broadcast literal and the argmax runs over
    |budgets| x |samples| rows."""
    spark = docs.sparkSession
    sweep = recovery_sample_sweep(docs, n=n, max_bucket=max_bucket,
                                  samples=samples)
    spine = spark.createDataFrame(
        [(int(b),) for b in sorted(budgets)], "budget_pairs long")
    fits = (
        F.broadcast(spine)
        .join(sweep, F.col("n_candidate_pairs") <= F.col("budget_pairs"))
        .groupBy("budget_pairs")
        .agg(F.max("sample").alias("chosen_sample"))
    )
    bill = sweep.select(F.col("sample").alias("chosen_sample"),
                        F.col("n_candidate_pairs").alias("bill_pairs"))
    return (
        spine.join(fits, "budget_pairs", "left")
        .join(bill, "chosen_sample", "left")
        .select("budget_pairs",
                F.coalesce("chosen_sample", F.lit(0)).cast("int")
                .alias("chosen_sample"),
                F.coalesce("bill_pairs", F.lit(0)).cast("long")
                .alias("bill_pairs"))
        .orderBy("budget_pairs")
    )


def recovery_yield_by_size(docs: DataFrame, n: int = 3,
                           max_bucket: int = 200,
                           sample: int = 50) -> DataFrame:
    """WHERE the sampled recovery's yield lives along the saturation
    spectrum: per power-of-two bucket-size bin (the exact A1/A2 bin
    math — smallest i with 2^i >= s), the saturated-bucket count, the
    algebraic pair mass the cap dropped there (sum C(s,2)), and what
    the Bernoulli thinning harvests back — surviving rows, pairable
    buckets, distinct candidate pairs (within-bin distinct; a pair can
    recur across bins through different shingles, so the bin column is
    part of the key, same convention as `lsh_band_yield` per band).
    Together with `recovery_sample_sweep` (how much per sample) and
    `bucket_cap_report` (how much was lost), this answers the operator
    question the r9 artifacts left open: is the dropped mass in a few
    mega-buckets (raise `sample`) or a long tail just over the cap
    (raise the cap)?

    Scale shape: identical to `saturated_pair_sample` — the histogram
    side collapses to |distinct bins| rows, the explode is bounded at
    O(sample^2) per bucket; the thinned survivor table is slot-cached
    because three aggregates below consume it."""
    from . import bins as _bins
    sh, sat = _saturated_buckets(docs, n, max_bucket)
    binned = sat.withColumn(
        "size_bin", _bins.size_bin_index(F.col("s"), 0, 40))
    per_bucket_mass = binned.groupBy("size_bin").agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.expr("s * (s - 1) div 2")).alias("pair_mass_dropped"))
    kept = _slot_cache(
        sh.join(binned.select("h", "s", "size_bin"), "h")
        .where(F.col("skey") * F.col("s")
               < F.lit(sample * (1 << 28)).cast("long")),
        f"recyield_kept_{n}_{max_bucket}_{sample}")
    agg_rows = kept.groupBy("size_bin").agg(
        F.count("*").alias("n_kept_rows"))
    buckets_ok = (
        kept.groupBy("size_bin", "h")
        .agg(F.collect_list("doc_id").alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= 4 * sample))
        .select("size_bin", F.array_sort("ds").alias("ds")))
    agg_ok = buckets_ok.groupBy("size_bin").agg(
        F.count("*").alias("n_ok_buckets"))
    agg_pairs = (
        buckets_ok.select("size_bin", F.explode(_sat_pair_expr()).alias("p"))
        .where(F.col("p.a") < F.col("p.b"))
        .select("size_bin", F.col("p.a").alias("doc_a"),
                F.col("p.b").alias("doc_b"))
        .distinct()
        .groupBy("size_bin").agg(F.count("*").alias("n_candidate_pairs")))
    return (
        per_bucket_mass
        .join(agg_rows, "size_bin", "left")
        .join(agg_ok, "size_bin", "left")
        .join(agg_pairs, "size_bin", "left")
        .select(
            F.col("size_bin").cast("int").alias("size_bin"),
            F.expr("cast(pow(2, size_bin) as bigint)").alias("bin_max_size"),
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("pair_mass_dropped").cast("long")
            .alias("pair_mass_dropped"),
            F.coalesce("n_kept_rows", F.lit(0)).cast("long")
            .alias("n_kept_rows"),
            F.coalesce("n_ok_buckets", F.lit(0)).cast("long")
            .alias("n_ok_buckets"),
            F.coalesce("n_candidate_pairs", F.lit(0)).cast("long")
            .alias("n_candidate_pairs"))
        .orderBy("size_bin")
    )


def minhash_lsh_pairs(docs: DataFrame, n: int = 3,
                      threshold: float = 0.5,
                      max_bucket: int = 200) -> DataFrame:
    """MinHash+LSH near-dup candidates: band the signature, bucket by
    (band, md5(band-slice)), pair up within buckets, then verify
    candidates with estimated Jaccard = fraction of agreeing minhash
    components.

    Shape (scale-chosen): the signature stage — the expensive map — is
    computed ONCE and persisted; a band-bucket self-join would compute
    it once per join side (the physical plan had two parquet scans and
    zero ReusedExchange).  Candidate pairs are generated in-bucket from
    id-only rows (groupBy + pair explode, one shuffle of 8-byte ids)
    instead of equi-joining rows that each carry the full 32-long
    signature 8× (once per band).  Signatures are re-attached to the
    (distinct, so much smaller) pair set afterwards.  Saturated buckets
    (> `max_bucket` docs) carry no discriminating signal and explode
    quadratically, so they are dropped — same policy as
    `ngram_jaccard_pairs` and standard practice for web-scale LSH."""
    sig = _slot_cache(minhash_signatures(docs, n), "minhash_sig")
    bands = _minhash_bands(sig)
    buckets = (
        bands.groupBy("band", "bucket").agg(F.collect_list("doc_id").alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= max_bucket))
        .select(F.array_sort("ds").alias("ds"))
    )
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"
    )
    cands = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
        .join(sig.select(F.col("doc_id").alias("doc_a"),
                         F.col("signature").alias("sig_a")), "doc_a")
        .join(sig.select(F.col("doc_id").alias("doc_b"),
                         F.col("signature").alias("sig_b")), "doc_b")
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq)).cast("double") / N_PERM
    )
    return (
        cands.withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
        .orderBy("doc_a", "doc_b")
    )


# Single-executor CC bound, in edge rows entering the one-partition
# fold.  Raised 1M -> 64M in r10 (VERDICT r9 item 4) on a memory
# argument: the numpy label-propagation pass below holds two int64 edge
# columns plus two label arrays — 64M edges is ~1 GB of arrays plus the
# np.unique temps, comfortably inside one executor's Python worker.
# r11 (VERDICT r10 item 1): the bound now applies to the PARTIAL star
# edges reaching the final fold, not the raw edge list — the per-
# partition union-find reduce below shrinks each partition's edges to
# one star edge per node BEFORE anything moves, so graphs whose raw
# edge count dwarfs this bound still fold locally as long as their
# NODE count (x partition coverage) fits; only >64M-node graphs fall
# through to the distributed pointer-jumping loop.
LOCAL_CC_MAX_EDGES = 64_000_000

# Below this many raw symmetrized edges the single coalesce(1) fold's
# funnel is already trivial and a partials pre-reduce would only add a
# stage of scheduler latency — board-scale pair graphs (1e3-1e6 edges)
# stay on the one-stage shape; the probe decades (1e7+) take the
# reduce-first shape, whose funnel carries O(nodes) instead of
# O(edges).  The r10 stage breakdown that motivated this: 112s of the
# 100x dedup_clusters' 289s was pure movement of the 47.4M-edge list
# into the one fold task.
CC_DIRECT_FOLD_EDGES = 2_000_000


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iters: int = 25,
                         local_max_edges: int = LOCAL_CC_MAX_EDGES,
                         direct_fold_edges: int | None = None
                         ) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: connected
    components of the pair graph, labeling every member with the
    component's minimum doc_id (`cluster_id`).

    This is the step every dedup pipeline needs after candidate
    generation — pairs (a,b),(b,c) are ONE duplicate group {a,b,c}, and
    the keeper is chosen per group, not per pair.

    ADAPTIVE algorithm choice (same spirit as AQE's single-partition
    re-plans), three tiers by edge/node volume:

    1. Direct fold (raw edges <= direct_fold_edges): the whole
       symmetrized edge list coalesces to one partition and ONE
       executor-side vectorized union-find pass labels it
       (`_cc_single_pass`) — at board scale the distributed loop's ~6
       shuffle rounds are pure scheduler latency (the r7 profile
       measured 43 jobs ≈ 5 s at sf0.1, BENCH_NOTES.md).  No driver
       collect: the fold runs where the data is.

    2. Partials tree-reduce (VERDICT r10 item 1; raw edges above the
       direct bound): each PARTITION first reduces its own edges with
       the same vectorized union-find, emitting one (node -> local
       component min) star edge per distinct node — a connectivity-
       preserving spanning reduction, so the funnel into the final
       one-partition fold moves O(nodes x partition coverage) star
       edges instead of the raw edge list (the r10 stage breakdown
       measured 112s of the 100x dedup_clusters' 289s as pure movement
       of 47.4M edges into that one task).  If even the star list
       exceeds `local_max_edges`, re-reduce at geometrically fewer
       hash(node) partitions (tree reduce) until it fits.

    3. Distributed loop (star edges still beyond the bound — a >64M-
       NODE graph): iterative min-label propagation over the REDUCED
       star graph — each round takes the min label across neighbors
       (join + groupBy), then pointer-jumps (label := label's label) so
       long chains collapse in O(log diameter) rounds.  Each round is a
       bounded number of hash-partition shuffles of (id, label) pairs,
       `localCheckpoint`ed to truncate lineage — without that, round k
       re-executes rounds 1..k-1 and the plan grows without bound.

    LSH pair graphs are sparse (bucket-capped upstream), so the edge
    list is O(pairs), never O(n^2).  All paths produce identical labels
    (pytest asserts equality on the same graph; the reduce preserves
    component minima exactly because star targets are always original
    node ids)."""
    spark = pairs.sparkSession
    # Symmetrize with a MAP-SIDE explode, not union(e, e.swap): the
    # union's two branches each hold the caller's full (usually
    # un-persisted) pair lineage, and Spark executes common subplans
    # per reference — at the 100x probe the pair-generation pipeline
    # ran TWICE inside the one distinct job (r11 cc_breakdown: the
    # whole CC resolution is ~16s on a materialized pair list, while
    # the operator measured ~150s more than one pipeline pass).  The
    # explode fans each pair to both directions inside the same task:
    # one pass over the input, one distinct shuffle, nothing to cache.
    edges = (
        pairs.select(F.explode(F.array(
            F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
            F.struct(F.col(dst).alias("a"), F.col(src).alias("b"))))
            .alias("p"))
        .select("p.a", "p.b")
        .distinct().persist()
    )
    n_edges = edges.count()
    direct = (CC_DIRECT_FOLD_EDGES if direct_fold_edges is None
              else direct_fold_edges)
    if n_edges <= min(direct, local_max_edges):
        labels = _cc_single_pass(edges.coalesce(1))
        # labels is lazy — localCheckpoint(eager) materializes it so the
        # edge cache can be dropped now instead of leaking
        labels = labels.localCheckpoint()
        edges.unpersist()
        return labels
    if local_max_edges > 0:
        # tier 2: per-partition union-find partials, tree-reduced.
        # The reduce runs where each cached edge partition already is;
        # only star edges ever move.
        frontier = _cc_partial_fold(edges).persist()
        n_star = frontier.count()
        edges.unpersist()
        nparts = frontier.rdd.getNumPartitions()
        while n_star > local_max_edges and nparts > 1:
            nparts = max(1, nparts // 8)
            nxt = _cc_partial_fold(
                frontier.repartition(nparts, "a")).persist()
            n_nxt = nxt.count()
            frontier.unpersist()
            frontier = nxt
            if n_nxt >= n_star:
                break  # no shrink — stars are at their node floor
            n_star = n_nxt
        if n_star <= local_max_edges:
            labels = _cc_single_pass(frontier.coalesce(1)).localCheckpoint()
            frontier.unpersist()
            return labels
        # tier 3 on the REDUCED graph: star edges are directed, and the
        # loop's neighbor-min step needs both directions present
        st = frontier.where(F.col("a") != F.col("b"))
        edges = (
            frontier.select("a", "b")
            .union(st.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .distinct().persist()
        )
        n_edges = edges.count()
        frontier.unpersist()
    # Size the loop's parallelism to the GRAPH, not the session default:
    # each round is a couple of shuffles over (id, label) pairs, which is
    # latency-bound (per-task overhead) when the pair graph is sparse
    # and throughput-bound when it is huge.  ~200k edges per partition
    # serves both; the session conf is restored afterwards.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions", "200")
    loop_parts = max(1, min(int(old_parts), n_edges // 200_000 + 1))
    # Keep the handle on the PERSISTED plan: unpersist on the coalesced
    # wrapper would be a no-op (plan mismatch) and leak the cache.
    cached_edges = edges
    edges = edges.coalesce(loop_parts)
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        labels = _cc_loop(edges, max_iters)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    cached_edges.unpersist()
    return labels


def _cc_partial_fold(edges: DataFrame) -> DataFrame:
    """Per-partition union-find REDUCE over an (a, b) edge list: each
    partition's edges collapse to one (a=node, b=partition-local
    component minimum) star edge per distinct node — a connectivity-
    preserving spanning reduction (the union of per-partition spanning
    stars has exactly the same components as the union of the
    partition subgraphs).  On ONE partition this IS exact connected
    components; on many it is the reduce stage of the tree-reduce, and
    its output is O(nodes in partition) rows regardless of edge count.

    r10 made the fold vectorized (VECTORIZED min-label propagation:
    dense-index the nodes with np.unique, then alternate scatter-min
    over the edge arrays — np.minimum.at — with pointer jumps
    label[label] until fixpoint; every pass is O(E) numpy kernels,
    O(log n) passes).  r11 moved it from mapInPandas to mapInArrow
    (VERDICT r10 item 1): int64 Arrow columns view as numpy zero-copy,
    so the per-partition reduce skips the pandas materialization both
    ways.  Labels only ever decrease to a component member's index, so
    the fixpoint is the component minimum — the same labels union-find
    by min produces (the loop-vs-local pytest asserts equality)."""

    # NOTE: self-contained closure (locals + builtins only) — workers on
    # a real cluster do not have ozone_spark importable.
    def fold(batches):
        import numpy as _np
        import pyarrow as _pa
        chunks_a, chunks_b = [], []
        for rb in batches:
            chunks_a.append(rb.column(0).to_numpy(zero_copy_only=False))
            chunks_b.append(rb.column(1).to_numpy(zero_copy_only=False))
        if not chunks_a:
            return
        a = _np.concatenate(chunks_a).astype("int64", copy=False)
        b = _np.concatenate(chunks_b).astype("int64", copy=False)
        nodes, inv = _np.unique(_np.concatenate([a, b]),
                                return_inverse=True)
        ai, bi = inv[: len(a)], inv[len(a):]
        del a, b, inv, chunks_a, chunks_b
        label = _np.arange(len(nodes), dtype="int64")
        while True:
            prev = label.copy()
            m = _np.minimum(label[ai], label[bi])
            _np.minimum.at(label, ai, m)
            _np.minimum.at(label, bi, m)
            # two pointer jumps per round: long chains collapse in
            # O(log diameter) rounds, same as the distributed loop
            label = _np.minimum(label, label[label])
            label = _np.minimum(label, label[label])
            if _np.array_equal(label, prev):
                break
        yield _pa.RecordBatch.from_arrays(
            [_pa.array(nodes), _pa.array(nodes[label])], ["a", "b"])

    return edges.select("a", "b").mapInArrow(fold, schema="a long, b long")


def _cc_single_pass(edges: DataFrame) -> DataFrame:
    """Exact connected components of a single-partition edge list in one
    executor-side pass (`_cc_partial_fold` on one partition), components
    labeled with their minimum node id — bit-identical to the
    pointer-jumping fixpoint.  Bounded by connected_components'
    local_max_edges guard."""
    return _cc_partial_fold(edges).select(
        F.col("a").alias("doc_id"), F.col("b").alias("cluster_id"))


def _cc_loop(edges: DataFrame, max_iters: int) -> DataFrame:
    # Seed labels with min(self, min neighbor) — the exact state after
    # round 1's nbr_min step, for the same shuffle the identity init
    # (distinct over edge endpoints) would have cost anyway.  Same
    # fixpoint, one fewer O(log d) round at every scale.
    labels = (
        edges.groupBy(F.col("a").alias("doc_id"))
        .agg(F.min("b").alias("nb"))
        .select("doc_id",
                F.least(F.col("doc_id"), F.col("nb")).alias("cluster_id"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels.withColumnRenamed("doc_id", "a"), "a")
            .groupBy(F.col("b").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr_min, "doc_id", "left")
            .select("doc_id", F.col("cluster_id").alias("prev"),
                    F.least(F.col("cluster_id"),
                            F.coalesce("nbr_min", F.col("cluster_id")))
                    .alias("cluster_id"))
        )
        # pointer jump: label := label's current label (path halving).
        # The previous label rides along so the convergence check below
        # is a map-side filter over the already-checkpointed rows, not
        # an extra shuffle join back against `labels` every round.
        jump = (
            stepped.alias("s")
            .join(stepped.select(F.col("doc_id").alias("cluster_id"),
                                 F.col("cluster_id").alias("root"))
                  .alias("r"), "cluster_id", "left")
            .select("doc_id", "prev",
                    F.coalesce("root", F.col("cluster_id")).alias("cluster_id"))
            # lazy: the convergence aggregate below is the action that
            # materializes the checkpoint — one job per round, not two.
            # (A full agg, not limit(1): it must touch EVERY partition
            # so the lazy checkpoint is completely materialized.)
            .localCheckpoint(eager=False)
        )
        changed = jump.agg(F.sum(
            (F.col("cluster_id") != F.col("prev")).cast("int"))
        ).collect()[0][0] or 0
        labels = jump.drop("prev")
        if changed == 0:
            break
    return labels


def dedup_graph_summary(docs: DataFrame, threshold: float = 0.1,
                        n: int = 3, max_bucket: int = 200) -> DataFrame:
    """One-row observability of the member-level near-dup pair graph
    and the adaptive connected-components tier it would take (r11):
    pair count, node count, component count, largest component, and
    the tier — 'direct' (one coalesce(1) vectorized fold), 'partials'
    (per-partition union-find stars tree-reduced), or 'loop'
    (distributed pointer jumping) — decided by the same symmetrized-
    edge thresholds `connected_components` uses, so an operator can
    read WHICH execution shape a corpus's graph lands in before
    running the full cluster resolution.

    Scale shape: the pair graph is the standard capped two-shuffle
    pipeline; everything after is aggregates over the (sparse) pair
    list and its labels — three scalar aggregates cross-joined into
    one row, no collect."""
    # slot-cached: the pair list is referenced three times below (the
    # pair count, the CC edge build, and nothing else shares it) and
    # Spark re-executes unshared lazy subplans per reference
    p = _slot_cache(
        ngram_jaccard_pairs(docs, n=n, threshold=threshold,
                            max_bucket=max_bucket)
        .select("doc_a", "doc_b"),
        "graph_summary_pairs")
    labels = connected_components(p)
    s1 = p.agg(F.count("*").alias("n_pairs"))
    s2 = labels.agg(
        F.count("*").alias("n_nodes"),
        F.countDistinct("cluster_id").alias("n_components"))
    s3 = (labels.groupBy("cluster_id").agg(F.count("*").alias("sz"))
          .agg(F.coalesce(F.max("sz"), F.lit(0))
               .alias("largest_component")))
    sym = F.col("n_pairs") * 2
    tier = (
        F.when(sym <= CC_DIRECT_FOLD_EDGES, "direct")
        .when(sym <= LOCAL_CC_MAX_EDGES, "partials")
        .otherwise("loop"))
    return (
        s1.crossJoin(s2).crossJoin(s3)
        .select(F.col("n_pairs").cast("long").alias("n_pairs"),
                F.col("n_nodes").cast("long").alias("n_nodes"),
                F.col("n_components").cast("long").alias("n_components"),
                F.col("largest_component").cast("long")
                .alias("largest_component"),
                tier.alias("cc_tier"))
    )


def duplicate_clusters(docs: DataFrame, threshold: float = 0.1,
                       n: int = 3, max_bucket: int = 200) -> DataFrame:
    """End-to-end dedup resolution: exact-duplicate CONTRACTION ->
    n-gram Jaccard pairs between distinct contents -> connected
    components -> per-doc cluster assignment with the keeper flagged
    (minimum doc_id per cluster, the same keeper rule as
    `exact_duplicates`).

    The contraction is the standard production shape (exact pass before
    near-dup): all k members of an exact-fingerprint group collapse to
    one node keyed by the fingerprint, so the inverted-index buckets,
    the pair explode, and the CC edge list are sized by DISTINCT
    content, not raw volume — a corpus that is 90% verbatim copies (the
    10x scale-stress corpus; common-crawl reality) pays the quadratic-
    ish pair machinery only on the 10% distinct residue.  It also makes
    the bucket cap MORE selective, not less: duplicate-inflated bucket
    heat disappears, so a shingle is dropped only when many DISTINCT
    documents share it (boilerplate), never because one document was
    copied many times.  Exact-dup families are clusters by definition
    (Jaccard 1), including families too short to shingle.

    Measured trade-off (r5 3-rep medians — do NOT "optimize" the
    contraction away on low-duplication evidence alone): at sf0.1,
    where the corpus is mostly distinct, the contraction's extra
    membership aggregation + re-key costs ~+27% wall (4.07 -> 5.17 s)
    because the pair stage barely shrinks; at the 10x stress corpus
    (90% verbatim copies — the realistic crawl regime this operator is
    built for) the same change wins 6.7 -> 5.0 s and keeps the pair
    machinery sized by distinct content.  The low-duplication overhead
    is a bounded constant (one narrow int aggregation); the
    high-duplication blowup it prevents is quadratic.

    Shuffle ledger: text is NEVER shuffled — the fingerprint and the
    shingle set are computed map-side per row; identical texts emit
    identical (fp, shingle-hash) rows that the index shuffle dedups in
    the same exchange it needed anyway; group membership/rep is one
    (fp, doc_id) aggregation; group-level pairs re-key to representative
    doc_ids through the tiny group table; the CC expansion is one
    int-only join."""
    fp = F.md5(_norm_text(F.col("text")))
    words = F.split(_norm_text(F.col("text")), " ")
    base = _spread(docs).select("doc_id", fp.alias("g"), words.alias("ws"))
    # The narrow (doc_id, g) membership is read twice — once for the
    # group table, once for the final expansion — and recomputing it
    # means a second full text scan + md5 pass; cache the two-column
    # projection (~tens of bytes/doc, MEMORY_AND_DISK at scale), not
    # the word arrays.
    membership = _slot_cache(base.select("doc_id", "g"), "clusters_base")
    groups = _slot_cache(
        membership.groupBy("g").agg(F.min("doc_id").alias("rep"),
                                    F.count("*").alias("sz")),
        "clusters_groups")
    shingles = F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.size("ws") - n),
        lambda i: F.concat_ws(" ", F.slice("ws", i + 1, n))))
    # ONE corpus text scan feeds both shingle consumers (r11
    # cc_breakdown: sizes and buckets each re-ran the split+shingle
    # build, 34.7s + 36.5s of the 100x probe's budget): the hashed
    # exploded stream persists once — the same corpus-shingle-sized
    # cache the member-level path already holds in its ngram_sh slot,
    # MEMORY_AND_DISK so at real scale it spills rather than evicts —
    # and sizes/buckets are then two aggregations over the cache.
    # k exact copies emit identical (g, shingle-hash) rows;
    # collect_set / count(DISTINCT) dedup them INSIDE each
    # aggregation's own exchange (no dedicated distinct exchange).
    sh_raw = _slot_cache(
        base.where(F.size("ws") >= n)
        .select("g", F.explode(shingles).alias("shingle"))
        .select("g", F.xxhash64("shingle").alias("shingle")),
        "clusters_shraw")
    # The post-aggregation tables are DISTINCT-CONTENT-sized (thousands
    # of rows), not corpus-sized — slot-caching them means a SECOND
    # duplicate_clusters call in the same session (keeper_policy_audit,
    # cluster stats, keep-best all ride this function) skips the
    # corpus-sized shingle explode + collect_set exchange entirely.
    # Measured at the 30x probe order (clusters -> reps -> ngram ->
    # keeper): the keeper's inner re-run cost 80 s without these slots
    # and the tables themselves are < 1 MB.  n_sh = per-content
    # distinct-shingle count via count(DISTINCT hash) — the documented
    # xxhash64 collision-equivalence class, same as the bucket keys.
    sizes = _slot_cache(
        sh_raw.groupBy("g").agg(
            F.countDistinct("shingle").alias("n_sh")),
        "clusters_sizes")
    buckets = _slot_cache(
        sh_raw.groupBy("shingle").agg(F.collect_set("g").alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= max_bucket))
        .select(F.array_sort("ds").alias("ds")),
        "clusters_buckets")
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"
    )
    common = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.a").alias("g_a"), F.col("p.b").alias("g_b"))
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common"))
    # sizes and reps attach in ONE pre-joined map per side instead of
    # four separate joins (r11 cc_breakdown: the pair stream is 23.7M
    # rows at the 100x probe, and each extra equi-join is another full
    # shuffle of it; meta is distinct-content-sized, so AQE broadcasts
    # it when it is genuinely small and hash-joins when it is not — no
    # forced hint, the meta table GROWS with distinct content).
    meta = _slot_cache(
        groups.join(sizes, "g").select("g", "rep", "n_sh"),
        "clusters_meta")
    gpairs = (
        common
        .join(meta.select(F.col("g").alias("g_a"),
                          F.col("rep").alias("doc_a"),
                          F.col("n_sh").alias("n_a")), "g_a")
        .join(meta.select(F.col("g").alias("g_b"),
                          F.col("rep").alias("doc_b"),
                          F.col("n_sh").alias("n_b")), "g_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b")
    )
    cc = connected_components(gpairs)
    out = (
        membership.join(groups, "g")
        .join(cc.withColumnRenamed("doc_id", "rep"), "rep", "left")
        .where((F.col("sz") >= 2) | F.col("cluster_id").isNotNull())
        .select("doc_id",
                F.coalesce("cluster_id", F.col("rep")).alias("cluster_id"))
        .withColumn("is_keeper", F.col("doc_id") == F.col("cluster_id"))
        .orderBy("doc_id")
    )
    return out


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """SIM_BITS-wide SimHash over word unigrams: for each bit, sum +-1
    weighted by token hash bits; sign -> bit.  Expressed with explode +
    groupBy (bit-parallel via SIM_BITS conditional sums).  Token hash is
    md5-derived so the whole signature is replayable in the DuckDB
    oracle."""
    words = (
        _spread(docs)
        .select("doc_id", F.explode(F.split(_norm_text(F.col("text")), " "))
                .alias("w"))
        .where(F.col("w") != "")
        .select("doc_id", hash60("w").alias("h"))
    )
    sums = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
              .otherwise(-1)).alias(f"b{i}")
        for i in range(SIM_BITS)
    ]
    agg = words.groupBy("doc_id").agg(*sums)
    sim = None
    for i in range(SIM_BITS):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseXOR(term)
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 8,
                  max_bucket: int = 200) -> DataFrame:
    """SimHash near-dups: block-permutation LSH — pairs sharing any of
    the four 15-bit blocks are candidates, verified by exact Hamming
    distance (bit_count of xor).

    Same scale shape as `minhash_lsh_pairs`: the signature (an explode
    + 60-conditional-sum groupBy — the expensive stage) is computed ONCE
    and persisted instead of once per self-join side; candidates come
    from an in-bucket pair explode over id-only rows with saturated
    buckets dropped; signatures are re-attached to the distinct pairs."""
    sig = _slot_cache(simhash_signatures(docs), "simhash_sig")
    blocks = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"),
                     F.shiftright(F.col("simhash"), i * 15)
                     .bitwiseAND(F.lit(0x7FFF)).alias("val"))
            for i in range(4)])).alias("bb"),
    ).select("doc_id", "bb.blk", "bb.val")
    buckets = (
        blocks.groupBy("blk", "val").agg(F.collect_list("doc_id").alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= max_bucket))
        .select(F.array_sort("ds").alias("ds"))
    )
    pair_expr = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))"
    )
    cands = (
        buckets.select(F.explode(pair_expr).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
        .join(sig.select(F.col("doc_id").alias("doc_a"),
                         F.col("simhash").alias("sim_a")), "doc_a")
        .join(sig.select(F.col("doc_id").alias("doc_b"),
                         F.col("simhash").alias("sim_b")), "doc_b")
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cands.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )

MINRECALL_SALT = "minrecall-v1"
MINRECALL_SAMPLE_N = 2000   # fixed-COUNT eval slice (not a fraction)


def _fixed_count_sample(docs: DataFrame, n: int, salt: str) -> DataFrame:
    """Deterministic fixed-COUNT doc sample: the n lowest md5-ranked
    doc_ids.  Eval harnesses must bound their truth side by COUNT, not
    by fraction — a 20% sample is 400x the pair volume at 100x the
    corpus, while a fixed-count slice keeps the all-pairs/exact truth
    stage corpus-size-independent (VERDICT r5 item 5).  The rank-limit
    is TakeOrderedAndProject (per-partition heads merged on one
    reducer, no global sort); ties are impossible (doc_id tiebreak)."""
    key = hash28(F.concat_ws(
        ":", F.lit(salt), F.col("doc_id").cast("string")))
    return (docs.withColumn("_sk", key)
            .orderBy(F.asc("_sk"), F.asc("doc_id")).limit(n).drop("_sk"))


def minhash_recall(docs: DataFrame, truth_threshold: float = 0.5,
                   est_threshold: float = 0.35,
                   sample_n: int = MINRECALL_SAMPLE_N) -> DataFrame:
    """Dedup-quality evaluation harness: how well does the banded
    MinHash-LSH candidate set recover the EXACT n-gram-Jaccard truth
    pairs?  One row: truth/candidate/hit counts plus recall (share of
    true pairs the sketch surfaces) and precision-vs-truth (share of
    candidates that are truly above the truth cutoff) — the
    numbers a pipeline team reads before trusting the sketch path at a
    scale where the exact pass is unaffordable.

    Scale shape: the audit runs on a deterministic fixed-COUNT doc
    slice (`sample_n`, md5-ranked — the whole corpus when it is smaller,
    as at the gate fixtures), so the exact truth pass is corpus-size-
    independent: this was the slowest query on the r5 10x stress board
    precisely because its truth side scaled with the corpus.  Within
    the slice both sides are the existing capped-bucket pair generators
    (never all-pairs); the comparison is a full-outer join on the
    (doc_a, doc_b) key and a one-row aggregate.  At 100 TB this is
    exactly the sampled-audit one runs on a slice to pick
    band/threshold settings (`suggest_band_bits`)."""
    samp = _fixed_count_sample(docs, sample_n, MINRECALL_SALT)
    truth = ngram_jaccard_pairs(samp, threshold=truth_threshold) \
        .select("doc_a", "doc_b", F.lit(1).alias("in_truth"))
    cand = minhash_lsh_pairs(samp, threshold=est_threshold) \
        .select("doc_a", "doc_b", F.lit(1).alias("in_cand"))
    joined = truth.join(cand, ["doc_a", "doc_b"], "full_outer")
    # ratios as exact integer parts-per-million (BIGINT floor division,
    # bit-identical in any engine) — a rounded double here is the r5
    # driver-red class: last-ulp float representation is hash-fragile
    return joined.agg(
        F.sum("in_truth").alias("n_truth"),
        F.sum("in_cand").alias("n_cand"),
        F.sum(F.when(F.col("in_truth").isNotNull()
                     & F.col("in_cand").isNotNull(), 1).otherwise(0))
        .alias("n_hit"),
    ).select(
        "n_truth", "n_cand", "n_hit",
        F.expr("(n_hit * 1000000) div n_truth").alias("recall_ppm"),
        F.expr("(n_hit * 1000000) div n_cand").alias("precision_ppm"),
    )

def saturation_recall(docs: DataFrame, n: int = 3,
                      threshold: float = 0.1, cap: int = 5,
                      sample: int = 3,
                      sample_n: int = MINRECALL_SAMPLE_N) -> DataFrame:
    """Prices the bucket cap (VERDICT r9 item 3b): on a deterministic
    fixed-COUNT doc slice, compare the capped near-dup pair set and the
    capped+saturated-recovery set against the UNCAPPED exact truth.
    One row: truth size, each arm's pair count and hit count, and
    recall in exact integer ppm — the number that says how much of the
    silently-dropped pair mass (`bucket_cap_report`) the sampled
    recovery actually buys back at a given (cap, sample).

    Scale shape: like `minhash_recall`, the truth pass runs only on the
    fixed-count slice (corpus-size-independent — at the gate fixtures
    the slice IS the corpus); within the slice all three arms are the
    existing bounded generators.  The arms share one slot-cached
    shingle table (the slot key is arm-invariant), so the corpus is
    shingled once."""
    samp = _fixed_count_sample(docs, sample_n, "satrec")
    key = ["doc_a", "doc_b"]
    truth = ngram_jaccard_pairs(
        samp, n=n, threshold=threshold, max_bucket=1 << 40,
        slot="satrec_sh").select(*key, F.lit(1).alias("in_truth"))
    capped = ngram_jaccard_pairs(
        samp, n=n, threshold=threshold, max_bucket=cap,
        slot="satrec_sh").select(*key, F.lit(1).alias("in_capped"))
    rec = ngram_jaccard_pairs(
        samp, n=n, threshold=threshold, max_bucket=cap,
        slot="satrec_sh",
        recover_saturated=sample).select(*key, F.lit(1).alias("in_rec"))
    joined = truth.join(capped, key, "full_outer").join(rec, key, "full_outer")
    return joined.agg(
        F.sum("in_truth").alias("n_truth"),
        F.sum("in_capped").alias("n_capped"),
        F.sum(F.when(F.col("in_truth").isNotNull()
                     & F.col("in_capped").isNotNull(), 1).otherwise(0))
        .alias("n_capped_hit"),
        F.sum("in_rec").alias("n_recovered"),
        F.sum(F.when(F.col("in_truth").isNotNull()
                     & F.col("in_rec").isNotNull(), 1).otherwise(0))
        .alias("n_recovered_hit"),
    ).select(
        "n_truth", "n_capped", "n_capped_hit", "n_recovered",
        "n_recovered_hit",
        F.expr("(n_capped_hit * 1000000) div greatest(n_truth, 1)")
        .alias("capped_recall_ppm"),
        F.expr("(n_recovered_hit * 1000000) div greatest(n_truth, 1)")
        .alias("recovered_recall_ppm"),
    )


def dedup_savings(docs: DataFrame) -> DataFrame:
    """Per-source exact-dedup savings forecast: how many documents and
    how many characters each source would shed if every non-keeper
    member of an exact-fingerprint family (keeper = lowest doc_id
    CORPUS-WIDE, the exact_duplicates rule) were dropped — the
    capacity/cost number that decides which crawl source pays for its
    storage, in exact integer ppm.

    Scale shape: one fingerprint-keyed aggregate for the keeper table
    (narrow fp/doc_id rows — text never shuffles; n_chars rides the
    existing column), one fp join back, one source-keyed aggregate."""
    fp = F.md5(_norm_text(F.col("text")))
    base = docs.select("doc_id", "source", "n_chars", fp.alias("fp"))
    keepers = base.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    flagged = base.join(keepers, "fp").select(
        "source", "n_chars",
        (F.col("doc_id") != F.col("keeper")).cast("long").alias("red"))
    return (
        flagged.groupBy("source")
        .agg(F.count("*").alias("n_docs"),
             F.sum("red").alias("n_redundant"),
             F.sum("n_chars").alias("total_chars"),
             F.sum(F.col("red") * F.col("n_chars")).alias("redundant_chars"))
        .select("source", "n_docs", "n_redundant", "total_chars",
                "redundant_chars",
                F.expr("(redundant_chars * 1000000) div total_chars")
                .alias("savings_ppm"))
        .orderBy("source")
    )


def ngram_novelty_curve(docs: DataFrame, n: int = 3,
                        n_buckets: int = 10) -> DataFrame:
    """Shingle-level novelty curve: ingest docs in doc_id order split
    into `n_buckets` equal id-range slices, and per slice count the
    DISTINCT word n-grams appearing there vs those NEVER seen in an
    earlier slice — the finer-grained companion to `growth_curve`
    (whole-document fingerprints): a crawl can keep yielding "new"
    documents whose n-grams are all recombinations of content already
    held, and this is the curve that shows it.

    All counts are exact integers; the novelty ratio is BIGINT floor
    division to ppm.  Shingles travel as 60-bit md5-derived ints
    (engine-portable, 8-byte shuffle keys).

    Scale shape: shingles are the zero-shuffle per-row map
    (word_shingles); the bucket id is exact integer math against one
    broadcast max-id scalar (the sanctioned one-row crossJoin); then
    one (bucket, h) dedup exchange, a per-h min-bucket aggregate, and
    two n_buckets-row aggregates — never a corpus-wide window."""
    sh = word_shingles(docs, n).select(
        "doc_id", hash60(F.col("shingle")).alias("h"))
    mx = docs.agg(F.max("doc_id").alias("m"))
    bucketed = (
        sh.crossJoin(F.broadcast(mx))
        .select(F.expr(f"CAST(doc_id * {n_buckets} DIV (m + 1) AS INT)")
                .alias("bucket"), "h")
        .distinct()
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_distinct"))
    first_seen = bucketed.groupBy("h").agg(F.min("bucket").alias("bucket"))
    new_per = first_seen.groupBy("bucket").agg(F.count("*").alias("n_new"))
    cw = Window.partitionBy(bounded_window_key("bucket")) \
        .orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (
        per_bucket.join(new_per, "bucket", "left")
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)))
        .withColumn("cum_new", F.sum("n_new").over(cw))
        .select("bucket", "n_distinct", "n_new", "cum_new",
                F.expr("(n_new * 1000000) div n_distinct")
                .alias("novelty_ppm"))
        .orderBy("bucket")
    )


CENTRALITY_ITERS = 3
CENTRALITY_DAMP_PPM = 850_000   # 0.85 damping, in ppm
CENTRALITY_K = 20


def dup_graph_centrality(docs: DataFrame, threshold: float = 0.1,
                         iters: int = CENTRALITY_ITERS,
                         k: int = CENTRALITY_K) -> DataFrame:
    """Template-hub detection: damped degree-normalized score
    propagation (PageRank-shaped) over the near-duplicate pair graph,
    surfacing the documents most CENTRAL to duplication structure —
    boilerplate templates and license-header carriers sit at hub
    positions that raw pair counts under-rank (a hub connected to
    other hubs outranks one connected to leaves).  Top-k rows with
    degree and final score.

    Every step is EXACT integer arithmetic in ppm scale: scores start
    at 1e6, each iteration sends score DIV degree along every edge and
    applies damping as (150000 + 850000 * inflow DIV 1e6) — floor
    division both engines, so three unrolled iterations replay
    bit-identically in the DuckDB oracle with no float anywhere (the
    same determinism scheme as kmeans_assign/BPE).  Score mass bounded
    by nodes x 1e6: BIGINT products stay inside 2^63 up to ~1e7 graph
    nodes; beyond that rescale to per-node thousandths.

    Scale shape (r12, VERDICT r11 item 5): the member-level edge list
    is NEVER materialized.  `contracted_pair_graph` reproduces the
    member pair relation exactly (cap semantics included — its r7
    contract, gated by test + the member-level oracle here) as
    (groups, cross, within); member edges factor into rep-level edges
    carrying copy-multiplicity weights, and the propagation runs over
    DISTINCT texts only (`_centrality_propagate_weighted` — the
    member-level loop reproduced bit-for-bit because every member of a
    group provably shares one score).  On the 10x 90%-copies stress
    corpus (every doc in a 10-clique at threshold 0.1 —
    ngram_jaccard_pairs' documented quadratic worst case) the old
    member-grain loop was 61.9 s, dominated by the quadratic member
    pair list; the contracted loop never pays it.  Scores fan back to
    members by the fingerprint membership join (corpus-sized, never
    quadratic), and the top-k is orderBy+limit's distributed
    TakeOrderedAndProject over that fan-out, ranked only after the
    k-row cut."""
    # default slot: the cached frames (groups/shingles/buckets) are
    # threshold-independent, so this SHARES the resident contracted
    # index with the member-grain report family instead of holding a
    # second copy
    groups, cross, within = contracted_pair_graph(docs, threshold=threshold)
    nm_src = groups.select(F.col("rep").alias("src"),
                           F.col("n_members").alias("nm_src"))
    nm_dst = groups.select(F.col("rep").alias("dst"),
                           F.col("n_members").alias("nm_dst"))
    sym = (
        cross.select(F.col("rep_a").alias("src"), F.col("rep_b").alias("dst"))
        .unionByName(cross.select(F.col("rep_b").alias("src"),
                                  F.col("rep_a").alias("dst")))
        .unionByName(within.select(F.col("rep").alias("src"),
                                   F.col("rep").alias("dst")))
    )
    self_flag = (F.col("src") == F.col("dst")).cast("long")
    wedges = _slot_cache(
        sym.join(nm_dst, "dst").join(nm_src, "src")
        .select("src", "dst",
                (F.col("nm_dst") - self_flag).alias("wt"),
                (F.col("nm_src") - self_flag).alias("wr")),
        "centrality_wedges")
    deg, scores = _centrality_propagate_weighted(wedges, iters)
    rep_scores = (
        scores.join(deg, scores.node == deg.src)
        .select(F.col("node").alias("rep_id"), "deg", "score")
    )
    fp = F.md5(_norm_text(F.col("text")))
    members = docs.select(F.col("doc_id").alias("m_doc"), fp.alias("fp"))
    fanned = (
        groups.join(rep_scores, F.col("rep") == F.col("rep_id"))
        .join(members, "fp")
        .select(F.col("m_doc").alias("doc_id"), "deg", "score")
    )
    # top-k via orderBy+limit (Spark's distributed TakeOrderedAndProject)
    # over the corpus-sized fan-out, and only THEN a rank window over
    # the k-row result — never a row_number window over the unbounded
    # score table, which Spark executes in a single partition (VERDICT
    # r8 item 1; the pattern at mining.zipf_curve)
    topk = fanned.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.partitionBy(bounded_window_key("doc_id")) \
        .orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "deg", "score")
        .orderBy("rank")
    )


def _centrality_propagate(edges: DataFrame,
                          iters: int) -> tuple[DataFrame, DataFrame]:
    """The shared damped integer-ppm propagation loop of the two
    centrality variants: returns (deg, scores) over the given directed
    edge list.  Scores start at 1e6 per node; each iteration sends
    score DIV degree along every edge, then applies damping as
    base + damp * inflow DIV 1e6 — floor division throughout, so the
    loop replays bit-identically in the DuckDB oracle.

    Shape (r11 optimization round): (node, deg, score) travel as ONE
    state frame, so each iteration is a single edges⋈state join plus
    the inflow aggregate — the previous form joined edges⋈deg⋈scores
    and rebuilt deg's lineage per round, which unrolled to a ~200-
    Exchange / 68-SortMergeJoin physical plan at iters=3 (3-8 s of
    driver-side analysis per invocation before any task ran, measured
    at sf0.1).  The state frame is localCheckpoint'ed each round: the
    per-node table is tiny (one (long,long,long) row per graph node)
    while the lineage it would otherwise accumulate grows by the whole
    edge subtree per iteration, so truncating is the same
    plan-size-bounding move the CC pointer-jumping loop already uses.
    The integer arithmetic is unchanged — same join keys, same floor
    divisions — so both engines still replay bit-identically."""
    state = (
        edges.groupBy("src").agg(F.count("*").alias("deg"))
        .select(F.col("src").alias("node"), "deg",
                F.lit(1_000_000).cast("long").alias("score"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        contrib = (
            edges.join(state, edges.src == state.node)
            .select("dst", F.expr("score div deg").alias("c"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        state = (
            state.select("node", "deg")
            .join(inflow, F.col("node") == F.col("dst"), "left")
            .select("node", "deg", F.expr(
                f"{1_000_000 - CENTRALITY_DAMP_PPM} + "
                f"({CENTRALITY_DAMP_PPM} * coalesce(inflow, 0))"
                f" div 1000000").cast("long").alias("score"))
            .localCheckpoint(eager=True)
        )
    deg = state.select(F.col("node").alias("src"), "deg")
    scores = state.select("node", "score")
    return deg, scores


def _centrality_propagate_weighted(wedges: DataFrame,
                                   iters: int) -> tuple[DataFrame, DataFrame]:
    """Copy-multiplicity-weighted form of _centrality_propagate (r12,
    VERDICT r11 item 5): propagate over the CONTRACTED rep graph and
    reproduce the member-level loop bit-for-bit.

    `wedges` is the symmetric directed rep-level edge list with two
    integer weights per edge (src, dst, wt, wr):
      wt = member targets per source member  = n_members(dst) - [src=dst]
      wr = member contributors per target member
                                             = n_members(src) - [src=dst]
    (self-loops encode within-group copy cliques; both weights collapse
    to n_members-1 there).  Every member of a group has the same degree
    and, by induction from the uniform 1e6 start, the same score at
    every iteration, so the member-level quantities factor exactly:
      deg(member of g)    = sum of wt over edges src=g
      inflow(member of g) = sum of wr * (score div deg) over edges dst=g
    — the integer `score div deg` per contributing member is IDENTICAL
    across a group's members, so multiplying by the contributor count
    equals summing the member-level contributions term-for-term; the
    damping floor-division is unchanged.  Bit-exactness is gated by the
    member-level DuckDB oracle (which never sees the contraction)."""
    state = (
        wedges.groupBy("src").agg(F.sum("wt").alias("deg"))
        .select(F.col("src").alias("node"), "deg",
                F.lit(1_000_000).cast("long").alias("score"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        contrib = (
            wedges.join(state, wedges.src == state.node)
            .select("dst", F.expr("wr * (score div deg)").alias("c"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        state = (
            state.select("node", "deg")
            .join(inflow, F.col("node") == F.col("dst"), "left")
            .select("node", "deg", F.expr(
                f"{1_000_000 - CENTRALITY_DAMP_PPM} + "
                f"({CENTRALITY_DAMP_PPM} * coalesce(inflow, 0))"
                f" div 1000000").cast("long").alias("score"))
            .localCheckpoint(eager=True)
        )
    deg = state.select(F.col("node").alias("src"), "deg")
    scores = state.select("node", "score")
    return deg, scores


def dup_graph_centrality_reps(docs: DataFrame, threshold: float = 0.1,
                              iters: int = CENTRALITY_ITERS,
                              k: int = CENTRALITY_K) -> DataFrame:
    """Representative-level centrality — the scale-safe route the
    member-level docstring prescribes for copy-heavy corpora (VERDICT
    r6 item 4): contract exact duplicates FIRST (normalized-text md5
    fingerprint, representative = min doc_id per group), run the pair
    graph and the damped integer-ppm propagation over REPRESENTATIVES
    only, then fan scores back to every member of each representative's
    fingerprint group.  On a 90%-copies corpus the member-level pair
    list is quadratic in copy count (10-cliques per template — 70 s at
    10x, SCALE_r06); contraction collapses each clique to one node
    before any quadratic stage, so the pair pass sees only DISTINCT
    texts.

    Semantics note: exact-copy multiplicity is reported (n_members),
    not folded into the score — representative-level centrality ranks
    CROSS-TEXT duplication structure.  Verbatim-copy cliques carry no
    edges here (they are one node); when copies themselves are the
    hubs being hunted, use the member-level default.

    Scale shape: one fingerprint groupBy (text never shuffled — the
    md5 projects first), the capped-bucket pair generator over the
    contracted corpus, `iters` edge-keyed integer shuffles, and a
    members-sized broadcast-joinable fan-out; the top-k is
    TakeOrderedAndProject over the corpus-sized fan-out, ranked only
    after the k-row cut."""
    fp = F.md5(_norm_text(F.col("text")))
    # distinct column names end-to-end: members/groups/rep_docs all
    # derive from `docs`, and same-name joins across shared lineage are
    # ambiguous to the analyzer
    members = docs.select(F.col("doc_id").alias("m_doc"), fp.alias("fp"))
    groups = members.groupBy("fp").agg(
        F.min("m_doc").alias("rep"), F.count("*").alias("n_members"))
    rep_docs = docs.select("doc_id", "text").join(
        groups.select(F.col("rep").alias("r_doc")),
        F.col("doc_id") == F.col("r_doc")).select("doc_id", "text")
    pairs = ngram_jaccard_pairs(rep_docs, threshold=threshold,
                                slot="ngram_sh_reps") \
        .select("doc_a", "doc_b")
    edges = _slot_cache(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"),
                                  F.col("doc_a").alias("dst"))),
        "centrality_edges_reps")
    deg, scores = _centrality_propagate(edges, iters)
    rep_scores = (
        scores.join(deg, scores.node == deg.src)
        .select(F.col("node").alias("rep_id"), "deg", "score")
    )
    fanned = (
        groups.join(rep_scores, F.col("rep") == F.col("rep_id"))
        .join(members, "fp")
        .select(F.col("m_doc").alias("doc_id"), "rep_id", "deg",
                "score", "n_members")
    )
    # the fan-out is corpus-sized (every doc belongs to a fingerprint
    # group), so the top-k MUST be orderBy+limit's distributed
    # TakeOrderedAndProject — a partition-less row_number window here
    # moved the whole corpus through one task (VERDICT r8 item 1; the
    # driver bench logged WindowExec's single-partition warning)
    topk = fanned.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.partitionBy(bounded_window_key("doc_id")) \
        .orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", "rep_id", "deg", "score", "n_members")
        .orderBy("rank")
    )


def cluster_size_stats(docs: DataFrame, threshold: float = 0.1) -> DataFrame:
    """Duplicate-cluster size distribution: for each cluster size, how
    many clusters and how many member documents — the dedup report a
    corpus team reads to decide whether duplication is a long tail of
    pairs or a few mega-clusters (which is what decides keeper policy
    and LSH band settings).

    Scale shape: rides duplicate_clusters unchanged (exact contraction
    before the quadratic stages), then two tiny aggregates over the
    membership table — cluster sizes, then the size histogram; both
    exchanges are cluster-count sized, not corpus sized."""
    cl = duplicate_clusters(docs, threshold=threshold)
    sizes = cl.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select("cluster_size", "n_clusters",
                (F.col("cluster_size") * F.col("n_clusters"))
                .alias("n_docs"))
        .orderBy("cluster_size")
    )


SIMRECALL_SALT = "simrecall-v1"
SIMRECALL_SAMPLE_N = 100  # fixed-COUNT truth sample (not a fraction)


def simhash_recall(docs: DataFrame, max_hamming: int = 8,
                   sample_n: int = SIMRECALL_SAMPLE_N) -> DataFrame:
    """SimHash index-quality eval, completing the recall-eval family
    (minhash_recall / ann_recall / ivf_recall): how many true
    near-duplicate pairs (exact Hamming <= max_hamming) does the
    block-permutation LSH actually surface?  A 60-bit signature split
    into four 15-bit blocks GUARANTEES recall 1.0 only up to Hamming 3
    (pigeonhole: 4 blocks, <= 3 flipped bits leave one block intact);
    at the shipped max_hamming=8 the blocking can miss pairs whose
    errors spread across all four blocks — this is the query that
    measures whether that miss rate is real on YOUR corpus.

    Scale shape: the exact truth set is all-pairs BY DESIGN, so it runs
    on a deterministic fixed-COUNT md5-ranked doc sample (`sample_n`
    rows, the standard eval-on-a-slice pattern): a fixed FRACTION would
    make the all-pairs truth side quadratic in corpus size — 400x the
    pair volume at 100x the corpus — while a fixed count keeps it
    corpus-size-independent (VERDICT r5 item 5).  Candidates reuse the
    full banded pipeline; the comparison joins two bounded pair sets."""
    sig = _slot_cache(simhash_signatures(docs), "simhash_sig")
    key = hash28(F.concat_ws(
        ":", F.lit(SIMRECALL_SALT), F.col("doc_id").cast("string")))
    samp = (sig.withColumn("_sk", key)
            .orderBy(F.asc("_sk"), F.asc("doc_id")).limit(sample_n)
            .select("doc_id", "simhash"))
    a = samp.select(F.col("doc_id").alias("doc_a"),
                    F.col("simhash").alias("ha"))
    b = samp.select(F.col("doc_id").alias("doc_b"),
                    F.col("simhash").alias("hb"))
    truth = (
        a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
        .where(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
               <= max_hamming)
        .select("doc_a", "doc_b")
    )
    cand = simhash_pairs(docs, max_hamming=max_hamming) \
        .select("doc_a", "doc_b", F.lit(1).alias("hit"))
    joined = truth.join(cand, ["doc_a", "doc_b"], "left")
    # integer-ppm recall: same hash-robustness rule as minhash_recall
    return joined.agg(
        F.count("*").alias("n_truth"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_found")
    ).select(
        "n_truth", "n_found",
        F.expr("(n_found * 1000000) div n_truth").alias("recall_ppm"))
