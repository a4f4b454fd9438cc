#!/usr/bin/env python3
"""Local correctness loop: compare Verify output against DuckDB oracles.

Usage: python3 scripts/check.py [sfdir] [outdir]
Run `sbt "runMain graft.Verify <sfdir> <outdir>"` first (or let this script do it).
Mimics the driver's t2 gate: per query, run oracle SQL in DuckDB over the
same parquet tables, sort columns by name, compare row-by-row.
"""
import sys, os, json, glob, subprocess
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if not os.path.exists(os.path.join(OUT, "oracle_sql.json")) or "--run" in sys.argv:
    subprocess.run(["sbt", f'runMain graft.Verify {SF} {OUT}'], check=True, cwd="/root/repo")

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracles = json.load(open(os.path.join(OUT, "oracle_sql.json")))
spark_results = sorted(d for d in glob.glob(os.path.join(OUT, "*")) if os.path.isdir(d))

def canon(df):
    df = df[sorted(df.columns)]
    # normalize ints
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
    return df.reset_index(drop=True)

fails, passes = [], []
for d in spark_results:
    name = os.path.basename(d)
    try:
        sdf = canon(pd.read_parquet(d))
    except Exception as e:
        fails.append((name, f"spark read fail: {e}")); continue
    if name not in oracles:
        passes.append((name, f"rows-only: {len(sdf)} rows" + (" (EMPTY!)" if len(sdf)==0 else "")))
        continue
    try:
        odf = canon(con.sql(oracles[name]).df())
    except Exception as e:
        fails.append((name, f"oracle SQL fail: {str(e)[:200]}")); continue
    if list(sdf.columns) != list(odf.columns):
        fails.append((name, f"columns differ: spark={list(sdf.columns)} oracle={list(odf.columns)}")); continue
    if len(sdf) != len(odf):
        fails.append((name, f"row count differ: spark={len(sdf)} oracle={len(odf)}")); continue
    try:
        pd.testing.assert_frame_equal(sdf, odf, check_dtype=True, check_exact=True)
        passes.append((name, f"EXACT match ({len(sdf)} rows)" + (" (EMPTY!)" if len(sdf)==0 else "")))
    except AssertionError as e:
        # find first differing cell for diagnostics
        msg = str(e).split("\n")[0]
        detail = ""
        for c in sdf.columns:
            neq = ~((sdf[c] == odf[c]) | (sdf[c].isna() & odf[c].isna()))
            if neq.any():
                i = neq.idxmax()
                detail = f" col={c} row={i} spark={sdf[c][i]!r} oracle={odf[c][i]!r}"
                break
        fails.append((name, msg + detail))

for n, m in passes: print(f"PASS {n}: {m}")
for n, m in fails: print(f"FAIL {n}: {m}")
# missing-detection covers rows-only queries too (a failed query writes no
# output dir and would otherwise vanish from the report entirely)
qpath = os.path.join(OUT, "queries.json")
declared = set(json.load(open(qpath))) if os.path.exists(qpath) else set(oracles)
missing = declared - {os.path.basename(d) for d in spark_results}
for n in missing: print(f"MISSING spark output for {n}")
print(f"\n{len(passes)} pass, {len(fails)} fail, {len(missing)} missing")
sys.exit(1 if fails or missing else 0)
