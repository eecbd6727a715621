#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py [sfDir] [verifyOutDir]
Reads oracle_sql.json written by graft.Verify, runs each SQL in DuckDB
over the testdata parquet, loads the Spark-written result parquet, sorts
columns by name (as the driver does), and compares cell-by-cell.
"""
import sys, json, glob, math
import datetime as _dt
import duckdb
import numpy as np

# Types where a string-render fallback is legitimate: the same instant can
# surface as pandas.Timestamp vs datetime vs numpy.datetime64 depending on
# which engine materialized it. Everything else must compare type-strictly
# — '1.5' (str) silently matching 1.5 (float) would hide a real schema
# divergence the driver's hash compare would catch.
_TEMPORAL = (_dt.datetime, _dt.date, np.datetime64)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(v):
    if isinstance(v, np.ndarray):
        return tuple(canon(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, np.generic):
        return canon(v.item())
    return v

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        files = sorted(glob.glob(f"{OUT}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        n_fail += 1
        continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
        n_fail += 1
        continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
        n_fail += 1
        continue
    sdf, odf = sdf[scols], odf[scols]
    bad = None
    for c in scols:
        sv = [canon(v) for v in sdf[c]]
        ov = [canon(v) for v in odf[c]]
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a != b and not (isinstance(a, _TEMPORAL)
                               and isinstance(b, _TEMPORAL)
                               and str(a) == str(b)):
                bad = (c, i, a, b)
                break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col={c} row={i} spark={a!r} oracle={b!r}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(sdf)} rows)")
        n_pass += 1
print(f"== {n_pass} pass, {n_fail} fail, {len(oracle)} checked ==")
sys.exit(1 if n_fail else 0)
