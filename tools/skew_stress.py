#!/usr/bin/env python
"""Hot-key skew stress: the user-keyed event plans at 10x volume with a
pathological user distribution.

scale_stress.py replicates uniformly — every user stays the same size.
Real event streams are Zipfian with a monster head (a bot, a load
balancer's synthetic probe user), and the failure mode it triggers is
different: one straggler task holding the whole stage, not total volume.
This harness rebuilds the 10x events table with ~30% of ALL events
remapped to a single hot user_id, then runs the user-keyed queries
unchanged.  Survival criteria: no error, no super-linear blowup vs the
uniform 10x timings in SCALE_r{N}.json (the hot user's sessions/windows
are big but still one group's worth of rows — the plans aggregate or
window per user, never pair users).

AQE (enabled in ozone_spark.session) handles the shuffle-side skew by
splitting oversized partitions; `skewed_event_totals` additionally
demonstrates explicit salting for the aggregate path.

Usage: python tools/skew_stress.py [--out SKEW_r05.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ozone_spark.registry import queries  # noqa: E402
from ozone_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
HOT_USER = 1_000_000_007  # far outside the fixture id range
HOT_FRACTION_MOD = 10     # user_id % 10 < 3  ->  ~30% of events

SKEW_QUERIES = [
    "events_sessionize",      # per-user sort windows: the hot user's
                              # stream is one giant ordered partition
    "events_top_users",       # hot user dominates the top-k
    "events_stickiness",      # sliding distinct with one ever-present user
    "cohort_retention",       # hot user in every week's cohort matrix
    "path_transitions",       # one user's lag window carries 30% of rows
    "rolling_user_1h",        # trailing RANGE frame over the hot stream
    "skewed_event_totals",    # the explicit salted-aggregate demo
    "events_daily_anomalies", # volume stats are user-agnostic: control
    "events_type_cooccurrence",  # hot user holds every type: the max
                                 # per-user pair fan-out C(|types|, 2)
    "events_ewma_forecast",   # per-type day arrays unchanged by skew
    "events_interarrival",    # r6: the hot user's per-type gap stream
                              # is one giant lag-window partition
    "events_power_users",     # r6: hot user is rank 1 with ~30% share
    "events_funnel_latency",  # r6: hot user's min-ts cascade + the
                              # order-statistic rank windows under skew
    "events_disorder",        # r7: per-type running-max window over 10x
                              # events; the rank windows see every late
                              # row of the hot user's dense stream
    "events_watermark_drop",  # r7: same lateness histogram + horizon
                              # spine under the skewed stream
    "events_disorder_partitioned",  # r8: production-grain disorder —
                              # the hot user hashes to ONE ingest
                              # partition, the worst case for the
                              # per-partition running-max sort
    "session_concurrency",    # r8: the hot user's own-correction window
                              # is one giant per-user partition, and its
                              # merged mega-sessions span many buckets
]


def build_skewed_events(spark, out_dir: str) -> None:
    for t in ["region", "nation", "customer", "supplier", "part",
              "documents", "embeddings", "orders", "lineitem"]:
        shutil.copyfile(f"{BASE}/{t}.parquet", f"{out_dir}/{t}.parquet")
    df = spark.read.parquet(f"{BASE}/events.parquet")
    hi = df.agg(F.max("event_id")).collect()[0][0] + 1
    rep = (
        df.crossJoin(spark.range(REPLICAS).withColumnRenamed("id", "_r"))
        .withColumn("event_id", F.col("event_id") + F.col("_r") * F.lit(hi))
        .withColumn("user_id",
                    F.when(F.col("user_id") % HOT_FRACTION_MOD < 3,
                           F.lit(HOT_USER)).otherwise(F.col("user_id")))
        .drop("_r")
    )
    rep.repartition(32).write.mode("overwrite") \
        .parquet(f"{out_dir}/events.parquet")


def main() -> int:
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    spark = get_spark("ozone-spark-skew-stress",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or
                      (os.cpu_count() or 8))
    work = tempfile.mkdtemp(prefix="ozs_skew_")
    t0 = time.perf_counter()
    build_skewed_events(spark, work)
    build_sec = round(time.perf_counter() - t0, 1)

    from ozone_spark.session import jvm_calibrate
    calib_start = jvm_calibrate(spark)
    print(f"# calibration probe (start): {calib_start}s", file=sys.stderr)
    qs = queries()
    results: dict[str, dict] = {}
    failed = []
    for name in SKEW_QUERIES:
        t0 = time.perf_counter()
        try:
            n = qs[name](spark, work).count()
            results[name] = {"sec": round(time.perf_counter() - t0, 1),
                             "rows": n}
            print(f"# {name}: {results[name]['sec']}s ({n} rows)",
                  file=sys.stderr)
        except Exception as ex:  # noqa: BLE001 — record, keep going
            results[name] = {"sec": round(time.perf_counter() - t0, 1),
                             "rows": None, "err": str(ex)[:300]}
            failed.append(name)
            print(f"# FAIL {name}: {str(ex)[:200]}", file=sys.stderr)

    calib_end = jvm_calibrate(spark)
    print(f"# calibration probe (end): {calib_end}s", file=sys.stderr)
    doc = {
        "base_sf_dir": BASE, "replicas": REPLICAS,
        "hot_user_fraction": 0.3, "build_sec": build_sec,
        "queries": results, "failed": failed,
        "calib": [calib_start, calib_end],
    }
    print(json.dumps(doc))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(doc, fh, indent=2)
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
