#!/usr/bin/env python
"""Next-decade scale probe (VERDICT r7 item 3): run the heavy five at
~30x sf0.1 (effective sf ~3) in the 128 GiB sandbox and record, next to
wall-clock, the PER-STAGE ROW COUNTS of the shared dedup machinery —
corpus rows, distinct fingerprints, contracted reps, surviving capped
buckets, contracted pair edges, member-level pair volume — so data
costs separate from round latency, plus the 10x->30x scaling exponent
per query (exponent = log(t30/t10) / log 3; 1.0 = linear).

The 30x corpus construction is scale_stress's replicated-parquet build
(payloads byte-identical across replicas: every doc sits in a 30-way
exact-duplicate family — the copy-heaviest realistic shape), reused via
import so the two probes can never drift.

Usage: python tools/scale_probe30.py [--out SCALE30_r08.json]
"""
from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SCALE_REPLICAS", "30")

from tools import scale_stress  # noqa: E402
from ozone_spark.registry import queries  # noqa: E402
from ozone_spark.session import get_spark  # noqa: E402

HEAVY_FIVE = [
    "dedup_clusters",
    "dup_graph_centrality_reps",
    "dedup_ngram_jaccard",
    "keeper_policy_audit",
    "streaming_session_stats",
    # r8 second session: the prefix-sum interval join — 30x denser
    # timeline is where the pair-materializing alternative would blow
    # up quadratically per bucket; this one must stay sort-bound
    "session_concurrency",
]

# The two queries whose 100x single-shot timings swung with sandbox
# weather across r9/r10 (streaming micro-batch drain + a sort-bound
# scan, both latency- not throughput-bound at this scale): median-of-3
# at the top decade so exponent rows stand on their own
SWING_MEDIAN = {"streaming_session_stats", "session_concurrency"}

# 10x medians from the committed SCALE artifact of the matching round —
# the denominator of the scaling exponent (re-read at runtime so the
# probe never hardcodes a stale number)
SCALE10_GLOB = "SCALE_r"


def latest_scale10(root: str) -> dict:
    import glob
    import re
    best, best_n = None, -1
    for p in glob.glob(os.path.join(root, "SCALE_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(p))
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    if best is None:
        return {}
    with open(best) as fh:
        return json.load(fh).get("queries", {})


def stage_rows(spark, sf_dir: str) -> dict:
    """Row counts of the shared dedup-machinery stages at this scale —
    the numbers that explain WHERE a super-linear query spends its
    growth (pair volume vs corpus volume)."""
    from ozone_spark import tables
    from ozone_spark.functions import dedup as D

    docs = tables.load_table(spark, sf_dir, "documents")
    groups, cross, within = D.contracted_pair_graph(docs, threshold=0.1)
    sh = D.word_shingles(docs, 3)
    out = {
        "docs": docs.count(),
        "shingle_rows": sh.count(),
        "distinct_fingerprints": groups.count(),
        "contracted_pair_edges": cross.count(),
        "within_pass_groups": within.count(),
        "member_pairs": D.ngram_jaccard_pairs(docs, threshold=0.1).count(),
    }
    # the gated cap-saturation audit (VERDICT r8 item 4): records how
    # much pair mass the 200-cap suppressed at this scale, so a zero
    # member_pairs row above is attributable instead of silent
    cap = D.bucket_cap_report(docs).collect()[0].asDict()
    out["bucket_cap"] = {k: int(v) for k, v in cap.items()}
    return out


def main() -> int:
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    replicas = int(os.environ["SPARK_GRAFT_SCALE_REPLICAS"])
    spark = get_spark("ozone-spark-scale30",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or
                      (os.cpu_count() or 8))
    from ozone_spark.session import jvm_calibrate
    calib_start = jvm_calibrate(spark)
    print(f"# calibration probe (start): {calib_start}s", file=sys.stderr)
    work = tempfile.mkdtemp(prefix="ozs_sf30_")
    t0 = time.perf_counter()
    scale_stress.REPLICAS = replicas
    scale_stress.build_scaled_dir(spark, work)
    build_sec = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    stages = stage_rows(spark, work)
    stages_sec = round(time.perf_counter() - t0, 1)

    # exponent baseline: by default the newest committed 10x artifact;
    # --baseline <probe.json> overrides it (needed in perturbed mode,
    # where comparing against an UNPERTURBED 10x run would mix corpus
    # shapes into the exponent)
    base_replicas = 10.0
    if "--baseline" in sys.argv:
        baseline_desc = sys.argv[sys.argv.index("--baseline") + 1]
        with open(baseline_desc) as fh:
            bdoc = json.load(fh)
        t10 = bdoc.get("queries", {})
        base_replicas = float(bdoc.get("replicas", 10))
    else:
        baseline_desc = "latest committed SCALE_r*.json (10x armless)"
        t10 = latest_scale10(root)
    qs = queries()
    results: dict[str, dict] = {}
    failed = []
    # r10 recovery arm (VERDICT r9 item 3a): price the production
    # saturated-bucket recovery next to the capped default — same
    # query, recover_saturated=<env> survivors per saturated bucket at
    # the production cap.  Where nothing saturates (e.g. 30x perturbed:
    # families of 30 x multiplicity 2-6 stay under the 200 cap) the arm
    # shows the no-op overhead; at 100x (26.5k saturated buckets,
    # 96.5% of pair mass cap-dropped in r9) it shows what the bounded
    # remedy costs and yields.
    recover_env = os.environ.get("SPARK_GRAFT_SCALE_RECOVER", "0")
    autosize_sec = None
    if recover_env == "auto":
        # VERDICT r10 item 2: size the arm from the PRICED sweep
        # instead of a hand-picked constant (the hand-picked 50 OOM'd
        # the 8g heap at 30x; 10 was picked by eye).  Budget default
        # 5M DISTINCT candidate pairs — NOT 20M: the first r11 armed
        # 100x run chose sample 38 under a 20M budget and OOM'd the
        # probe JVM, because the budget prices the distinct pair list
        # while the heap also carries (a) the pre-distinct in-bucket
        # explode (sum over saturated buckets of C(survivors, 2) SLOTS,
        # ~4-20x the distinct count on shared-shingle pairs) and (b)
        # the stage-warmed resident indexes, which grow with the
        # decade.  5M keeps the whole re-score comfortably spillable
        # next to those; the same 30x arm ran green at sample 47 /
        # ~20M bill only because the 30x residents are 3x smaller.
        from ozone_spark.functions import dedup as D
        from ozone_spark import tables as T
        budget = int(os.environ.get(
            "SPARK_GRAFT_SCALE_RECOVER_BUDGET", "5000000"))
        t0 = time.perf_counter()
        recover = D.autosize_recover_saturated(
            T.load_table(spark, work, "documents"), budget)
        autosize_sec = round(time.perf_counter() - t0, 1)
        D.release_slots("recsweep_", "satbk_")
        print(f"# autosized recover_saturated={recover} "
              f"(budget {budget} pairs, {autosize_sec}s)", file=sys.stderr)
    else:
        recover = int(recover_env)
    if recover:
        from ozone_spark.functions import dedup as D
        from ozone_spark import tables as T
        t0 = time.perf_counter()
        try:
            docs = T.load_table(spark, work, "documents")
            n = D.ngram_jaccard_pairs(
                docs, threshold=0.1, recover_saturated=recover,
                slot="probe_rec").count()
            results["dedup_ngram_jaccard_recovered"] = {
                "sec": round(time.perf_counter() - t0, 1), "rows": n,
                "recover_saturated": recover}
            print(f"# dedup_ngram_jaccard_recovered: "
                  f"{results['dedup_ngram_jaccard_recovered']}",
                  file=sys.stderr)
        except Exception as ex:  # noqa: BLE001
            results["dedup_ngram_jaccard_recovered"] = {
                "sec": round(time.perf_counter() - t0, 1),
                "rows": None, "err": str(ex)[:300]}
            failed.append("dedup_ngram_jaccard_recovered")
        # the arm slot-caches several probe-scale tables (its private
        # shingle index, candidate pairs, recovered pairs); left
        # resident they squeeze execution memory for every query below
        # and the round-over-round comparison stops measuring the
        # queries (first 100x run with the arm: centrality_reps
        # 149.7 -> 256.9s, streaming_session_stats 58.6 -> 119.5s,
        # both code-untouched).  Release ONLY the arm's slots.
        # CAVEAT (ADVICE r10 medium): through r10 this release did NOT
        # keep ngram_sh warm as intended — the arm's 'probe_rec' slot is
        # a sameSemantics twin of the stage-rows-warmed 'ngram_sh'
        # frame, Spark's CacheManager is plan-keyed, and unpersisting
        # the twin de-cached the shared entry, so the armed r10 series'
        # "warm-regime" numbers (dedup_ngram_jaccard 128.9s armed vs
        # 27.0s armless at identical rows) were mismeasured-cold.
        # Fixed in r11 inside release_slots (skip unpersist when a
        # retained slot holds a sameSemantics twin) and _slot_cache
        # (re-persist on hit when externally uncached), so the
        # selective release now actually reproduces the warm regime.
        D.release_slots("probe_rec", "satbk_")
    for name in HEAVY_FIVE:
        t0 = time.perf_counter()
        try:
            n = qs[name](spark, work).count()
            sec = round(time.perf_counter() - t0, 1)
            row = {"sec": sec, "rows": n}
            # VERDICT r10 item 3: single-shot timings of the two
            # weather-sensitive queries can't support exponent claims at
            # the top decade — record median-of-3 there (the extra runs
            # are seconds; the probe's build dominates wall-clock)
            if name in SWING_MEDIAN and replicas >= 100:
                runs = [sec]
                for _ in range(2):
                    t1 = time.perf_counter()
                    qs[name](spark, work).count()
                    runs.append(round(time.perf_counter() - t1, 1))
                row["runs"] = runs
                row["sec"] = sec = sorted(runs)[1]
            base = t10.get(name, {}).get("sec")
            if base and base > 0 and replicas > base_replicas:
                # exponent vs the baseline run: t ~ scale^e
                row["sec_base"] = base
                row["base_replicas"] = base_replicas
                row["exponent_vs_base"] = round(
                    math.log(sec / base)
                    / math.log(replicas / base_replicas), 2)
            results[name] = row
            print(f"# {name}: {sec}s ({n} rows) "
                  f"exp={row.get('exponent_vs_base')}", file=sys.stderr)
        except Exception as ex:  # noqa: BLE001 — record, keep going
            results[name] = {"sec": round(time.perf_counter() - t0, 1),
                             "rows": None, "err": str(ex)[:300]}
            failed.append(name)
            print(f"# FAIL {name}: {str(ex)[:200]}", file=sys.stderr)

    doc = {
        "base_sf_dir": scale_stress.BASE, "replicas": replicas,
        "perturb": scale_stress.PERTURB,
        # self-describing arms (VERDICT r10 item 3): which arm this
        # artifact ran, and which artifact its exponents divide by —
        # an armed run is only comparable to another armed run
        "arm": "recovered" if recover else "armless",
        "recover_saturated": recover,
        "recover_autosized": recover_env == "auto",
        "autosize_sec": autosize_sec,
        "exponent_baseline": baseline_desc,
        "base_replicas": base_replicas,
        "effective_sf": replicas * 0.1, "build_sec": build_sec,
        "stage_rows": stages, "stage_rows_sec": stages_sec,
        "queries": results, "failed": failed,
        "calib": [calib_start, jvm_calibrate(spark)],
    }
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=2)
    import shutil
    shutil.rmtree(work, ignore_errors=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
