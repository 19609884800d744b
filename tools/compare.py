#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Runs each oracle_sql.json query in DuckDB over the same sf dir, loads the
Spark parquet dump, sorts columns by name, rounds doubles to 6dp, and
compares cell-exact. Usage: compare.py <sfdir> <verify_outdir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, ok, no_oracle = [], [], []

# every oracled query must have produced a dump dir — a Verify-side
# failure would otherwise vanish from the comparison entirely
dumped = {os.path.basename(d.rstrip("/")) for d in glob.glob(f"{outdir}/*/")}
for name in sorted(oracle):
    if name not in dumped:
        fails.append((name, "no Verify output (query failed before dump)"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == np.float64:
            df[c] = df[c].round(6)
        elif df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64).round(5)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)

for d in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracle:
        no_oracle.append((name, len(spark_df)))
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"cols spark={list(a.columns)} duck={list(b.columns)}"))
        continue
    if len(a) != len(b):
        fails.append((name, f"rows spark={len(a)} duck={len(b)}"))
        continue
    diff_cols = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype != bv.dtype:
            ka, kb = av.dtype.kind, bv.dtype.kind
            # the driver hashes serialized cells, so an int column on one
            # side and a float on the other (506627 vs 506627.0) is a real
            # hash mismatch even when values are numerically identical —
            # e.g. a DuckDB HUGEINT leaking through an oracle SUM
            if {ka, kb} <= {"i", "u", "f"} and ("f" in (ka, kb)) != (ka == kb == "f"):
                diff_cols.append(
                    f"{c}: int-vs-float type leak ({a[c].dtype} vs {b[c].dtype}; "
                    "driver hashes these differently)")
                continue
            try:
                av = av.astype(bv.dtype)
            except Exception:
                diff_cols.append(f"{c}: dtype {a[c].dtype} vs {b[c].dtype}")
                continue
        eq = (av == bv) | (av.isna() & bv.isna())
        if not eq.all():
            idx = (~eq).idxmax()
            diff_cols.append(f"{c}: {int((~eq).sum())} diffs, first@{idx}: {av[idx]!r} vs {bv[idx]!r}")
    if diff_cols:
        fails.append((name, "; ".join(diff_cols[:3])))
    else:
        ok.append(name)

print(f"PASS {len(ok)}: {' '.join(ok)}")
for n, r in no_oracle:
    print(f"NO-ORACLE {n}: {r} rows")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
sys.exit(1 if fails else 0)
