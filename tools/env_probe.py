#!/usr/bin/env python
"""Cross-engine determinism fingerprint (round-6 insurance).

The r5 driver gate produced three hash-red rows no local replica could
reproduce; the root cause (uncast HUGEINT sums) is fixed, but if a red
row ever appears again the FIRST question is "did the two environments
even compute the same primitives?".  This probe evaluates a fixed set
of the numerically tricky expressions the registry leans on — float
division + round(x, 6) repr, floor(log2) at power-of-two boundaries,
md5-hex-to-int, integer floor division, timestamp floor-second diffs,
regexp match counts — in BOTH engines and emits one JSON object with
library versions and a per-category digest.  Commit the output per
round (ENV_r{N}.json); diffing two rounds' files (or a local file vs
one produced in the driver's container) pinpoints which primitive
diverged without re-running any gate query.

Usage: python tools/env_probe.py [--out ENV_r06.json]
"""
from __future__ import annotations

import hashlib
import json
import platform
import os
import sys

import duckdb
import pandas as pd
import pyarrow
import pyspark
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def digest(rows) -> str:
    return hashlib.md5(
        "|".join(repr(r) for r in rows).encode()).hexdigest()


def main() -> int:
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()

    probes = {
        # category -> (spark SQL, duckdb SQL) producing comparable rows
        # NOTE: explicit DOUBLE casts — a bare 7.0 literal is DECIMAL in
        # Spark SQL (the registry's DataFrame-API math is all double)
        "round6_repr": (
            "SELECT round(CAST(x AS DOUBLE) / CAST(7.0 AS DOUBLE), 6) AS r"
            " FROM (SELECT explode(sequence(1, 200)) AS x) ORDER BY r",
            "SELECT round(CAST(x AS DOUBLE) / CAST(7.0 AS DOUBLE), 6) AS r"
            " FROM (SELECT unnest(range(1, 201)) AS x) ORDER BY r",
        ),
        "floor_log2": (
            "SELECT CAST(floor(log2(x)) AS BIGINT) AS b FROM (SELECT "
            "explode(flatten(transform(sequence(1, 40), k -> "
            "array(pow(2, k) - 1, pow(2, k), pow(2, k) + 1)))) AS x) "
            "ORDER BY b, x",
            "SELECT CAST(floor(log2(x)) AS BIGINT) AS b FROM (SELECT "
            "unnest(flatten(list_transform(range(1, 41), k -> "
            "[2**k - 1, 2**k, 2**k + 1]))) AS x) ORDER BY b, x",
        ),
        # r9: temperature_mixture rests on floor(sqrt(BIGINT)) being
        # engine-identical (IEEE sqrt is correctly rounded); probe the
        # perfect-square boundaries k^2-1 / k^2 / k^2+1 across the long
        # range including near-2^52 magnitudes
        "floor_sqrt": (
            "SELECT CAST(floor(sqrt(x)) AS BIGINT) AS s FROM (SELECT "
            "explode(flatten(transform(sequence(1, 26), k -> "
            "array(pow(4, k) - 1, pow(4, k), pow(4, k) + 1)))) AS x) "
            "ORDER BY s, x",
            "SELECT CAST(floor(sqrt(x)) AS BIGINT) AS s FROM (SELECT "
            "unnest(flatten(list_transform(range(1, 27), k -> "
            "[4**k - 1, 4**k, 4**k + 1]))) AS x) ORDER BY s, x",
        ),
        "md5_int": (
            "SELECT conv(substring(md5(CAST(x AS STRING)), 1, 15), 16, 10)"
            " AS h FROM (SELECT explode(sequence(1, 100)) AS x) ORDER BY h",
            "SELECT CAST(CAST(('0x' || substr(md5(CAST(x AS VARCHAR)), 1,"
            " 15)) AS BIGINT) AS VARCHAR) AS h FROM "
            "(SELECT unnest(range(1, 101)) AS x) ORDER BY h",
        ),
        "int_floor_div": (
            "SELECT (x * 1000000) div (x + 7) AS d FROM "
            "(SELECT explode(sequence(1, 500)) AS x) ORDER BY d",
            "SELECT (x * 1000000) // (x + 7) AS d FROM "
            "(SELECT unnest(range(1, 501)) AS x) ORDER BY d",
        ),
        "ts_floor_seconds": (
            "SELECT CAST(to_timestamp('2024-02-01 00:00:01.900') AS LONG)"
            " - CAST(to_timestamp('2024-02-01 00:00:00.100') AS LONG) AS d",
            "SELECT date_diff('second', TIMESTAMP '2024-02-01 00:00:00.1',"
            " TIMESTAMP '2024-02-01 00:00:01.9') AS d",
        ),
        "regexp_counts": (
            "SELECT size(regexp_extract_all(s, '[aeiou]+', 0)) AS n FROM "
            "(SELECT explode(array('the quick brown fox!', 'aa.eE?iI',"
            " '', 'zzz', 'a!e?i.o,u')) AS s) ORDER BY n",
            "SELECT len(regexp_extract_all(s, '[aeiou]+')) AS n FROM "
            "(SELECT unnest(['the quick brown fox!', 'aa.eE?iI', '',"
            " 'zzz', 'a!e?i.o,u']) AS s) ORDER BY n",
        ),
    }
    report: dict = {
        "python": platform.python_version(),
        "pyspark": pyspark.__version__,
        "duckdb": duckdb.__version__,
        "pandas": pd.__version__,
        "pyarrow": pyarrow.__version__,
        "platform": platform.platform(),
        "java": spark.sparkContext._jvm.java.lang.System.getProperty(
            "java.version"),
        "probes": {},
    }
    ok = True
    for cat, (ssql, dsql) in probes.items():
        srows = [tuple(r) for r in spark.sql(ssql).collect()]
        drows = con.execute(dsql).fetchall()
        sd, dd = digest(srows), digest(drows)
        report["probes"][cat] = {
            "spark": sd, "duckdb": dd, "match": sd == dd}
        if sd != dd:
            ok = False
            print(f"MISMATCH {cat}: spark={sd} duckdb={dd}")
            print("  spark head:", srows[:3], "duckdb head:", drows[:3])
        else:
            print(f"OK {cat}: {sd}")
    line = json.dumps(report, separators=(",", ":"))
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=1)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
