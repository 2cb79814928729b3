"""Simulate the driver's verify gate against __spark_entry__.py:
vanilla SparkSession -> entry smoke -> every queries()[name] at sf0.01
compared to oracle_sql()[name] via DuckDB (count + schema + value hash)."""
import sys, math, time
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e

SF = "/root/testdata/sf0.01"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
df = e.entry(spark)
n = len(df.collect())
print(f"SMOKE entry(): {n} rows, schema={df.schema.simpleString()[:100]} ({time.time()-t0:.1f}s)")
assert n > 0

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if isinstance(v, float):
        # repr = shortest round-trip: strictER than any plausible driver
        # canonicalization, so a pass here implies a pass there (the r6
        # upgrade after %.9g hid the HUGEINT->float64 driver reds)
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def dtype_mismatch(sp, du):
    """Columns whose pandas dtype KIND differs (int64 vs float64 —
    e.g. an uncast DuckDB sum() coming back HUGEINT): the r5
    driver-red class that value-normalized compares can hide."""
    bad = []
    for c in sorted(set(sp.columns) & set(du.columns)):
        ks, kd = sp[c].dtype.kind, du[c].dtype.kind
        if ks != kd and not (ks in "iu" and kd in "iu"):
            bad.append(f"{c}:{sp[c].dtype}!={du[c].dtype}")
    return bad

def canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return sorted(tuple(norm(v) for v in r) for r in pdf.itertuples(index=False))

qs, os_ = e.queries(), e.oracle_sql()
fails = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        sp = fn(spark, SF).toPandas()
    except Exception as ex:
        fails.append((name, f"spark error: {ex}")); print(f"FAIL {name}: {ex}"); continue
    if name not in os_:
        print(f"ROWS-ONLY {name}: {len(sp)} rows ({time.time()-t0:.1f}s)")
        continue
    du = con.execute(os_[name]).fetchdf()
    if sorted(sp.columns) != sorted(du.columns):
        fails.append((name, f"schema {sorted(sp.columns)} vs {sorted(du.columns)}"))
    elif len(sp) != len(du):
        fails.append((name, f"rows {len(sp)} vs {len(du)}"))
    elif dtype_mismatch(sp, du):
        fails.append((name, f"dtype mismatch: {dtype_mismatch(sp, du)}"))
    elif canon(sp) != canon(du):
        fails.append((name, "value hash mismatch"))
    status = "OK" if not fails or fails[-1][0] != name else "FAIL"
    print(f"{status} {name}: {len(sp)} rows ({time.time()-t0:.1f}s)")

print(f"\n{len(qs)-len(fails)}/{len(qs)} queries pass the gate")
for name, why in fails:
    print("  FAIL", name, why)
sys.exit(1 if fails else 0)
