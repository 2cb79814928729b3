"""Targeted driver-gate simulator: run named queries() entries against
their oracle_sql() twins at sf0.01 (same canonicalization contract as
tests/drive_contract.py, including the driver's stricter behavior of
sorting the pandas frame — which dies on array cells, so array-typed
outputs fail here exactly as they fail in the real gate).

Usage: python tools/gate_check.py [name ...]   (no names = first 50
in gate order, i.e. what the driver will actually verify this round)
"""
import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    # mimic the driver: sort_values over every column first (this is
    # what raises TypeError on ndarray cells)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return sorted(tuple(norm(v) for v in r)
                  for r in pdf.itertuples(index=False))


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    qs, os_ = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or list(qs)[:50]
    fails = []
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered")
            continue
        t0 = time.time()
        try:
            sp = qs[name](spark, SF).toPandas()
            sp_c = canon(sp)
        except Exception as ex:
            fails.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: {str(ex)[:200]}")
            continue
        if name not in os_:
            print(f"ROWS-ONLY {name}: {len(sp)} rows "
                  f"({time.time() - t0:.1f}s)")
            continue
        try:
            du = con.execute(os_[name]).fetchdf()
        except Exception as ex:
            fails.append((name, f"oracle error: {ex}"))
            print(f"FAIL {name}: oracle: {str(ex)[:200]}")
            continue
        if sorted(sp.columns) != sorted(du.columns):
            fails.append((name, f"schema {sorted(sp.columns)} vs "
                                f"{sorted(du.columns)}"))
        elif len(sp) != len(du):
            fails.append((name, f"rows {len(sp)} vs {len(du)}"))
        elif sp_c != canon(du):
            fails.append((name, "value hash mismatch"))
        ok = not fails or fails[-1][0] != name
        print(f"{'OK' if ok else 'FAIL'} {name}: {len(sp)} rows "
              f"({time.time() - t0:.1f}s)")
    print(f"\n{len(names) - len(fails)}/{len(names)} pass")
    for name, why in fails:
        print("  FAIL", name, why[:300])
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
