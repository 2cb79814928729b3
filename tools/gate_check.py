"""Targeted driver-gate simulator: run named queries() entries against
their oracle_sql() twins at sf0.01 (same canonicalization contract as
tests/drive_contract.py, including the driver's stricter behavior of
sorting the pandas frame — which dies on array cells, so array-typed
outputs fail here exactly as they fail in the real gate).

Usage: python tools/gate_check.py [--out FILE] [--all] [--sf DIR] [name ...]
(no names = first 50 in gate order, i.e. what the driver will actually
verify this round; --all = every registered query; --sf points both
engines at another fixture dir, e.g. /root/testdata/sf0.1 for a
10x-the-gate-scale correctness sweep).

--out FILE writes a driver-format JSON artifact (per-query rows_match /
schema_match / hash_match / row counts / err) — the round's insurance
against a driver-gate gap (VERDICT r4 item 3: round 3 ended with no
CORRECTNESS_r03.json; a self-recorded artifact committed from within the
round makes the verification record un-skippable regardless of what the
driver does).  Exit is non-zero on any failure either way.
"""
import json
import math
import os
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as e  # noqa: E402

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


STRICT = False  # --strict: floats compare by shortest-roundtrip repr


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v) if STRICT else f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def dtype_mismatch(sp, du):
    """Columns whose pandas dtype KIND differs between the Spark result
    and the DuckDB oracle result (e.g. int64 vs float64).  This is the
    r5 driver-red class: an uncast DuckDB sum() returns HUGEINT, which
    fetchdf() materializes as float64, so a driver that canonicalizes
    with str() sees '14.0' vs Spark's '14' — while the local %.9g norm
    formats both as '14' and hides it.  Kind 'O' (object: strings,
    arrays, decimals) is compared as-is; i-vs-f and i/f-vs-O are
    flagged."""
    bad = []
    for c in sorted(set(sp.columns) & set(du.columns)):
        ks, kd = sp[c].dtype.kind, du[c].dtype.kind
        if ks in "iu" and kd in "iu":
            continue
        if ks != kd:
            bad.append(f"{c}:{sp[c].dtype}!={du[c].dtype}")
    return bad


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
    qs, os_ = e.queries(), e.oracle_sql()
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    global SF, STRICT
    if "--sf" in argv:
        i = argv.index("--sf")
        SF = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--strict" in argv:
        STRICT = True
        argv.remove("--strict")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    # _lsh_sig_adaptive_sql enumerates exactly the two shipped corpus
    # sizes; a drifted embeddings fixture must fail loudly here, not
    # silently gate-compare mismatched index geometries (ADVICE r5)
    from ozone_spark import registry as _reg
    n_emb = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    if n_emb not in (_reg._GATE_EMB_N, _reg._SF01_EMB_N):
        sys.exit(f"FATAL: embeddings fixture at {SF} has {n_emb} vectors; "
                 f"the adaptive ANN oracles enumerate only "
                 f"{_reg._GATE_EMB_N} and {_reg._SF01_EMB_N} — update "
                 f"_lsh_sig_adaptive_sql before gating")
    _specs = {q.name: q for q in _reg._REGISTRY_ORDER}
    if "--all" in argv:
        names = list(qs)
    else:
        names = argv or list(qs)[:50]
    fails = []
    record: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered")
            continue
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        # content hash of (fn bytecode, oracle text): the rotation's
        # pure-oracle-edit staleness signal (VERDICT r7 item 2)
        if name in _specs:
            row["spec_hash"] = _reg.spec_hash(_specs[name])
        record[name] = row
        t0 = time.time()
        try:
            sp = qs[name](spark, SF).toPandas()
            sp_c = canon(sp)
            row["spark_rows"] = len(sp)
        except Exception as ex:
            row["err"] = f"spark error: {str(ex)[:300]}"
            fails.append((name, row["err"]))
            print(f"FAIL {name}: {str(ex)[:200]}")
            continue
        if name not in os_:
            # rows_match=None, not True: a rows-only run is NOT a green
            # verification, and _gate_priority_order must not
            # deprioritize never-value-verified queries (ADVICE r5)
            row.update(rows_match=None, schema_match=None,
                       hash_match=None, rows_only=True,
                       err="rows-only (no oracle)")
            print(f"ROWS-ONLY {name}: {len(sp)} rows "
                  f"({time.time() - t0:.1f}s)")
            continue
        try:
            du = con.execute(os_[name]).fetchdf()
            row["oracle_rows"] = len(du)
        except Exception as ex:
            row["err"] = f"oracle error: {str(ex)[:300]}"
            fails.append((name, row["err"]))
            print(f"FAIL {name}: oracle: {str(ex)[:200]}")
            continue
        row["schema_match"] = sorted(sp.columns) == sorted(du.columns)
        row["rows_match"] = len(sp) == len(du)
        row["hash_match"] = (row["schema_match"] and row["rows_match"]
                             and sp_c == canon(du))
        dt = dtype_mismatch(sp, du)
        if dt:
            row["dtype_mismatch"] = dt
            row["hash_match"] = False
        if not row["schema_match"]:
            fails.append((name, f"schema {sorted(sp.columns)} vs "
                                f"{sorted(du.columns)}"))
        elif not row["rows_match"]:
            fails.append((name, f"rows {len(sp)} vs {len(du)}"))
        elif dt:
            fails.append((name, f"dtype mismatch: {dt}"))
        elif not row["hash_match"]:
            fails.append((name, "value hash mismatch"))
        ok = not fails or fails[-1][0] != name
        print(f"{'OK' if ok else 'FAIL'} {name}: {len(sp)} rows "
              f"({time.time() - t0:.1f}s)")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(record, fh, indent=2)
        print(f"wrote {out_path} ({len(record)} rows)")
    print(f"\n{len(names) - len(fails)}/{len(names)} pass")
    for name, why in fails:
        print("  FAIL", name, why[:300])
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
