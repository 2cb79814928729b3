#!/usr/bin/env python
"""Recall pricing for the bucket cap (VERDICT r9 item 3b): on the 10x
PERTURBED corpus — small enough that the UNCAPPED exact n-gram-Jaccard
truth is affordable — measure how many true near-dup pairs the capped
default drops and how many the saturated-bucket sampled recovery buys
back, at a cap that actually saturates at this scale.

Knobs: at 10x perturbed the production cap (200) saturates nothing
(replica families of 10 x base multiplicity 2-6 = buckets of 20-60),
so the priced cap is 20 — the same *relative* saturation the 200 cap
hits at 100x — with recovery samples 5 and 10.  Truth is the uncapped
pair set (sum C(s,2) ~ tens of millions of exploded candidates at this
scale: affordable here, NOT at production — which is the whole point
of the capped+recovery design).

Emits RECALL_r10-style JSON: truth size, per-arm pair counts, hits,
recall ppm, and wall seconds per arm.

Usage: python tools/recall_price.py [--out RECALL_r10.json]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SCALE_REPLICAS", "10")
os.environ.setdefault("SPARK_GRAFT_SCALE_PERTURB", "1")

import pyspark.sql.functions as F  # noqa: E402

from tools import scale_stress  # noqa: E402
from ozone_spark import tables  # noqa: E402
from ozone_spark.functions import dedup as D  # noqa: E402
from ozone_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.1
CAP = 20
SAMPLES = [5, 10]


def main() -> int:
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    replicas = int(os.environ["SPARK_GRAFT_SCALE_REPLICAS"])
    spark = get_spark("ozone-spark-recall",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or
                      (os.cpu_count() or 8))
    from ozone_spark.session import jvm_calibrate
    calib_start = jvm_calibrate(spark)
    print(f"# calibration probe (start): {calib_start}s", file=sys.stderr)
    work = tempfile.mkdtemp(prefix="ozs_recall_")
    t0 = time.perf_counter()
    scale_stress.REPLICAS = replicas
    scale_stress.build_scaled_dir(spark, work)
    build_sec = round(time.perf_counter() - t0, 1)
    docs = tables.load_table(spark, work, "documents")

    def keys(df):
        return df.select("doc_a", "doc_b")

    t0 = time.perf_counter()
    truth = keys(D.ngram_jaccard_pairs(
        docs, threshold=THRESHOLD, max_bucket=1 << 40,
        slot="recall_sh")).persist()
    n_truth = truth.count()
    truth_sec = round(time.perf_counter() - t0, 1)
    print(f"# truth: {n_truth} pairs in {truth_sec}s", file=sys.stderr)

    arms: dict[str, dict] = {}

    def arm(name: str, df) -> None:
        t0 = time.perf_counter()
        got = keys(df).persist()
        n = got.count()
        hit = got.join(truth, ["doc_a", "doc_b"], "left_semi").count()
        arms[name] = {
            "pairs": n, "hits": hit,
            "recall_ppm": hit * 1_000_000 // max(n_truth, 1),
            "sec": round(time.perf_counter() - t0, 1),
        }
        got.unpersist()
        print(f"# {name}: {arms[name]}", file=sys.stderr)

    arm("capped", D.ngram_jaccard_pairs(
        docs, threshold=THRESHOLD, max_bucket=CAP, slot="recall_sh"))
    for s in SAMPLES:
        arm(f"capped_recover_{s}", D.ngram_jaccard_pairs(
            docs, threshold=THRESHOLD, max_bucket=CAP,
            recover_saturated=s, slot="recall_sh"))
    # r11 (VERDICT r10 item 2 closed-loop): the AUTOSIZED arm — the
    # sample the production sizing helper actually picks under the
    # probe-default 5M candidate-pair budget, so the recall curve
    # prices the knob setting operators will really run, not only the
    # hand-swept points
    budget = int(os.environ.get("SPARK_GRAFT_SCALE_RECOVER_BUDGET",
                                "5000000"))
    t0 = time.perf_counter()
    auto_s = D.autosize_recover_saturated(docs, budget, max_bucket=CAP)
    autosize_sec = round(time.perf_counter() - t0, 1)
    print(f"# autosized sample={auto_s} (budget {budget}, "
          f"{autosize_sec}s)", file=sys.stderr)
    if auto_s > 0:
        arm(f"capped_recover_auto_{auto_s}", D.ngram_jaccard_pairs(
            docs, threshold=THRESHOLD, max_bucket=CAP,
            recover_saturated=auto_s, slot="recall_sh"))

    doc = {
        "base_sf_dir": scale_stress.BASE, "replicas": replicas,
        "perturb": scale_stress.PERTURB, "threshold": THRESHOLD,
        "cap": CAP, "build_sec": build_sec,
        "recover_budget": budget, "autosized_sample": auto_s,
        "autosize_sec": autosize_sec,
        "n_truth": n_truth, "truth_sec": truth_sec, "arms": arms,
        "calib": [calib_start, jvm_calibrate(spark)],
    }
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=2)
    truth.unpersist()
    import shutil
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
