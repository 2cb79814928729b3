"""Property-based tests (hypothesis) for contract-critical scalar logic —
the reference's unit-test layer analog (SURVEY.md §5)."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from ozone_spark import tables
from ozone_spark.functions.bins import FILE_BIN_BASE_EXP, FILE_BIN_MAX_IDX, size_bin_index
from ozone_spark.operators import listing


def ref_bin_index(size: int, base_exp: int = 10, max_idx: int = 40) -> int:
    """Pure-python rendering of ReconUtils.nextClosestPowerIndexOfTwo
    (ReconUtils.java:592-597): smallest i with 2^(base+i) >= size."""
    i = 0
    while (1 << (base_exp + i)) < size and i < max_idx:
        i += 1
    return i


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_bin_index_matches_reference_math(spark, data):
    sizes = data.draw(st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=1 << 62),
            # adversarial: exact powers and off-by-one neighbors
            st.integers(min_value=0, max_value=52).map(lambda e: 1 << e),
            st.integers(min_value=1, max_value=52).map(lambda e: (1 << e) + 1),
            st.integers(min_value=1, max_value=52).map(lambda e: (1 << e) - 1),
        ),
        min_size=50, max_size=200))
    df = spark.createDataFrame([(s,) for s in sizes], "size long")
    got = {r.size: r.bin for r in df.select(
        "size", size_bin_index(F.col("size"), FILE_BIN_BASE_EXP,
                               FILE_BIN_MAX_IDX).alias("bin")).collect()}
    for s in sizes:
        assert got[s] == ref_bin_index(s), f"size={s}"


@settings(max_examples=4, deadline=None)
@given(page=st.integers(min_value=1, max_value=23))
def test_pagination_contract_any_page_size(spark, sf_dir, page):
    """Page-concat == full scan for arbitrary maxKeys (the maxKeys+1 /
    isTruncated / resume-token contract)."""
    keys = tables.namespace_views(spark, sf_dir)["keys"]
    prefix = "/vol3/b0/"
    full = [r.db_key for r in
            keys.where(F.col("db_key").startswith(prefix))
            .orderBy("db_key").select("db_key").collect()]
    got, start = [], ""
    while True:
        rows = listing.list_keys(keys, prefix=prefix, start_key=start,
                                 max_keys=page).collect()
        if not rows:
            break
        got.extend(r.db_key for r in rows)
        if not rows[0].is_truncated:
            break
        start = rows[-1].db_key
    assert got == full


@settings(max_examples=4, deadline=None)
@given(data=st.data())
def test_list_parts_contract_under_arbitrary_ties(spark, data):
    """ListParts yields dense unique part numbers and a lossless
    marker resume for ANY multiset of block_seqs (ties included) and
    any page size."""
    seqs = data.draw(st.lists(st.integers(min_value=1, max_value=6),
                              min_size=1, max_size=18))
    page_size = data.draw(st.integers(min_value=1, max_value=7))
    rows = [(1, s, i, 100 + i, 0) for i, s in enumerate(seqs)]
    locs = spark.createDataFrame(
        rows, "object_id long, block_seq long, local_id long, "
              "block_len long, block_offset long")
    full = listing.list_parts(locs, 1, max_parts=1000).collect()
    assert [r.part_number for r in full] == list(range(1, len(seqs) + 1))
    got, marker = [], 0
    for _ in range(50):
        p = listing.list_parts(locs, 1, part_marker=marker,
                               max_parts=page_size).collect()
        if not p:
            break
        got.extend((r.part_number, r.etag) for r in p)
        if not p[0].is_truncated:
            break
        marker = p[-1].part_number
    assert got == [(r.part_number, r.etag) for r in full]


def ref_tree_distance(pa: str, pb: str) -> int:
    """Pure-python rendering of NetworkTopologyImpl.getDistanceCost
    (NetworkTopologyImpl.java:717) with unit inner-node costs."""
    if pa == pb:
        return 0
    a, b = pa.strip("/").split("/"), pb.strip("/").split("/")
    c = 0
    for x, y in zip(a, b):
        if x != y:
            break
        c += 1
    return (len(a) - c) + (len(b) - c)


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_tree_distance_matches_reference_walk(spark, data):
    """tree_distance == the reference's level-equalising climb for
    arbitrary topology paths (depths 1-4, shared and unshared
    prefixes), and is symmetric with identity 0."""
    from ozone_spark.operators.datapath import tree_distance

    comp = st.sampled_from(["dc0", "dc1", "rack0", "rack1", "n1", "n2"])
    path = st.lists(comp, min_size=1, max_size=4).map(
        lambda cs: "/" + "/".join(cs))
    cases = data.draw(st.lists(st.tuples(path, path), min_size=1,
                               max_size=25))
    df = spark.createDataFrame(cases, "pa string, pb string")
    got = df.select(
        "pa", "pb",
        tree_distance(F.col("pa"), F.col("pb")).alias("d"),
        tree_distance(F.col("pb"), F.col("pa")).alias("d_rev")).collect()
    for r in got:
        assert r.d == r.d_rev == ref_tree_distance(r.pa, r.pb)
        assert (r.d == 0) == (r.pa == r.pb)


@settings(max_examples=1, deadline=None)
@given(st.data())
def test_name_uuid_layout_any_input(spark, data):
    """name_uuid emits a valid v3-layout UUID for arbitrary text and is
    injective on the md5 level (distinct inputs -> distinct ids unless
    md5 collides)."""
    import re

    from ozone_spark.operators.snapshot import name_uuid

    texts = data.draw(st.lists(
        st.text(min_size=0, max_size=40), min_size=1, max_size=20,
        unique=True))
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    rows = df.select("s", name_uuid(F.col("s")).alias("u")).collect()
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-"
        r"[0-9a-f]{12}$")
    assert all(pat.match(r.u) for r in rows)
    assert len({r.u for r in rows}) == len(rows)


@settings(max_examples=2, deadline=None)
@given(data=st.data())
def test_boilerplate_vs_pure_python_model(spark, data):
    """boilerplate_paragraphs matches a pure-python rendering of the
    frequency rule on arbitrary small corpora: paragraphs are 20-word
    chunks of the normalized text; every occurrence of a chunk seen in
    >= min_df distinct docs is removed."""
    import hashlib
    import re
    from ozone_spark.functions.dedup import boilerplate_paragraphs
    word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x1"])
    texts = data.draw(st.lists(
        st.lists(word, min_size=0, max_size=65).map(" ".join),
        min_size=1, max_size=12))
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r for r in
           boilerplate_paragraphs(docs, min_df=2).collect()}

    def paras(t):
        t = re.sub(r"[^a-z0-9 ]", "", t.lower()).strip()
        if not t:
            return []
        ws = re.split(r" +", t)
        return [" ".join(ws[i:i + 20]) for i in range(0, len(ws), 20)]

    from collections import defaultdict
    df_count = defaultdict(set)
    for i, t in enumerate(texts):
        for p in paras(t):
            df_count[hashlib.md5(p.encode()).hexdigest()].add(i)
    for i, t in enumerate(texts):
        ps = [hashlib.md5(p.encode()).hexdigest() for p in paras(t)]
        if not ps:
            assert i not in got
            continue
        removed = [p for p in ps if len(df_count[p]) >= 2]
        kept = [p for p in ps if len(df_count[p]) < 2]
        assert got[i].n_paras == len(ps)
        assert got[i].n_removed == len(removed)
        assert got[i].cleaned_fp == hashlib.md5(
            "".join(kept).encode()).hexdigest()


@settings(max_examples=2, deadline=None)
@given(data=st.data())
def test_growth_curve_model_any_corpus(spark, data):
    """growth_curve matches a pure-python first-occurrence model for
    arbitrary doc_id gaps and duplicate patterns."""
    import hashlib
    import re
    from ozone_spark.functions.dedup import growth_curve
    texts = data.draw(st.lists(
        st.sampled_from(["a b c", "d e f", "a b c", "zz yy", "d e f"]),
        min_size=2, max_size=30))
    ids = data.draw(st.lists(
        st.integers(min_value=0, max_value=500),
        min_size=len(texts), max_size=len(texts), unique=True))
    rows = list(zip(ids, texts))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.bucket: r for r in growth_curve(docs).collect()}
    m = max(ids)
    seen, model = set(), {}
    for i, t in sorted(rows):
        fp = hashlib.md5(
            re.sub(r"[^a-z0-9 ]", "", t.lower()).encode()).hexdigest()
        b = i * 10 // (m + 1)
        d = model.setdefault(b, [0, 0])
        d[0] += 1
        if fp not in seen:
            seen.add(fp)
            d[1] += 1
    assert {b: (r.n_docs, r.n_new) for b, r in got.items()} == {
        b: tuple(v) for b, v in model.items()}


@settings(max_examples=20, deadline=None)
@given(nbytes=st.integers(min_value=0, max_value=1 << 50))
def test_suggest_shuffle_partitions_law(nbytes):
    """Sizing law invariants: within clamps, ceil semantics (every
    partition <= target unless clamped), monotone in input size."""
    from ozone_spark.session import suggest_shuffle_partitions as ssp
    target = 128 << 20
    p = ssp(nbytes)
    assert 8 <= p <= 200_000
    if 8 * target <= nbytes <= 200_000 * target:
        assert (p - 1) * target < nbytes <= p * target
    assert ssp(nbytes) <= ssp(nbytes + target)


def waterfill_closed_form(caps: list[int], budget: int) -> list[int]:
    """Pure-python rendering of mixture_waterfill's prefix rule
    (functions/pipeline.py): sort by capacity, cell r is saturated iff
    cap_r * (n - r) <= B - C_r; unsaturated cells share the remainder
    by floor division.  Returned in the input order."""
    n = len(caps)
    order = sorted(range(n), key=lambda i: caps[i])
    c = 0
    saturated = []
    for r, i in enumerate(order, start=1):
        c += caps[i]
        saturated.append(caps[i] * (n - r) <= budget - c)
    # prefix property: monotone along the sort (asserted, not assumed)
    assert saturated == sorted(saturated, reverse=True)
    rstar = sum(saturated)
    csat = sum(caps[i] for i in order[:rstar])
    share = (budget - csat) // max(n - rstar, 1)
    out = [0] * n
    for r, i in enumerate(order):
        out[i] = caps[i] if r < rstar else share
    return out


def waterfill_iterative(caps: list[int], budget: int) -> list[int]:
    """Textbook redistribution to fixpoint (the formulation the closed
    form replaces)."""
    alloc = [0] * len(caps)
    active = set(range(len(caps)))
    remaining = budget
    while active and remaining > 0:
        share = remaining // len(active)
        if share == 0:
            break
        overflow = {i for i in active if caps[i] <= share}
        if not overflow:
            for i in active:
                alloc[i] = share
            break
        for i in overflow:
            alloc[i] = caps[i]
            remaining -= caps[i]
        active -= overflow
    return alloc


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10_000),
                min_size=1, max_size=12),
       st.integers(min_value=0, max_value=200_000))
def test_waterfill_prefix_rule_matches_iterative(caps, budget):
    """The closed-form prefix waterfill equals iterative redistribution
    for ANY capacities/budget (not just the fixture's shape), conserves
    the budget up to floor remainder, and never exceeds a cap."""
    closed = waterfill_closed_form(caps, budget)
    iterative = waterfill_iterative(caps, budget)
    assert closed == iterative
    assert sum(closed) <= budget or all(
        a == c for a, c in zip(closed, caps))
    for a, c in zip(closed, caps):
        assert 0 <= a <= c


def hdr_bucket(x: int, sub: int = 16) -> int:
    """Pure-python rendering of sketch.hdr_histogram's bucket rule:
    octave = floor(log2(x)) via bit_length, then linear sub-bucket."""
    i = x.bit_length() - 1
    p = 1 << i
    return i * sub + ((x - p) * sub) // p


def hdr_mid(bucket: int, sub: int = 16) -> int:
    p = 1 << (bucket // sub)
    j = bucket % sub
    lo = p + (j * p) // sub
    hi = p + ((j + 1) * p) // sub
    return (lo + hi) // 2


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=1 << 62))
def test_hdr_bucket_rule_is_sound(x):
    """Every positive value lands in a bucket whose [lo, hi) range
    contains it, the midpoint honors the 1/(2*sub) relative-error
    bound (plus the integer-width floor of narrow low-octave buckets),
    and the bucket index is monotone (checked against x+1)."""
    sub = 16
    b = hdr_bucket(x)
    p = 1 << (b // sub)
    j = b % sub
    lo = p + (j * p) // sub
    hi = p + ((j + 1) * p) // sub
    assert lo <= x < max(hi, lo + 1), (x, b, lo, hi)
    mid = hdr_mid(b)
    # abs error <= half the bucket width (+1 for integer mid rounding)
    assert abs(mid - x) <= (hi - lo) // 2 + 1
    assert hdr_bucket(x + 1) >= b


def deletion_variants(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="ab0#", min_size=1, max_size=9),
       st.data())
def test_symspell_blocking_catches_every_one_edit_pair(s, data):
    """The recall guarantee record_linkage relies on: ANY string within
    edit distance 1 of s (delete / insert / substitute) shares at
    least one deletion variant with s, so the variant-equality join
    can never miss a 1-edit pair."""
    alphabet = "ab0#"
    edit_kind = data.draw(st.sampled_from(["delete", "insert", "sub"]))
    if edit_kind == "delete" and len(s) >= 2:
        i = data.draw(st.integers(0, len(s) - 1))
        t = s[:i] + s[i + 1:]
    elif edit_kind == "insert":
        i = data.draw(st.integers(0, len(s)))
        c = data.draw(st.sampled_from(alphabet))
        t = s[:i] + c + s[i:]
    else:
        i = data.draw(st.integers(0, len(s) - 1))
        c = data.draw(st.sampled_from(alphabet))
        t = s[:i] + c + s[i + 1:]
    assert deletion_variants(s) & deletion_variants(t), (s, t)
