#!/usr/bin/env python3
"""Value-level diff of two Verify dump trees (per-key parquet dirs).

Usage: dump_diff.py <beforeDir> <afterDir> <key> [<key>...]

For each key, loads both parquet dirs with duckdb, sorts all columns by
every column, and compares row counts, column names/types, and the full
value multiset. Exit 1 on any difference. This is the bit-identity gate
for shared-replay consolidations: the AFTER dump must equal the BEFORE
dump value-for-value (schema nullability may differ; values may not).
"""
import sys
import duckdb

def rows_of(con, path):
    rel = con.sql(f"SELECT * FROM parquet_scan('{path}/*.parquet')")
    cols = rel.columns
    order = ", ".join(f'"{c}"' for c in cols)
    got = con.sql(
        f"SELECT * FROM parquet_scan('{path}/*.parquet') ORDER BY {order}"
    ).fetchall()
    return cols, [tuple(r) for r in got]

def main():
    before, after, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    bad = 0
    for k in keys:
        con = duckdb.connect()
        try:
            bc, br = rows_of(con, f"{before}/{k}")
            ac, ar = rows_of(con, f"{after}/{k}")
        except Exception as e:
            print(f"DIFF {k}: load error: {e}")
            bad += 1
            continue
        if [c.lower() for c in bc] != [c.lower() for c in ac]:
            print(f"DIFF {k}: columns {bc} vs {ac}")
            bad += 1
        elif len(br) != len(ar):
            print(f"DIFF {k}: rows {len(br)} vs {len(ar)}")
            bad += 1
        elif br != ar:
            n = sum(1 for x, y in zip(br, ar) if x != y)
            first = next((i, x, y) for i, (x, y) in enumerate(zip(br, ar))
                         if x != y)
            print(f"DIFF {k}: {n} differing rows; first at {first[0]}:"
                  f" {first[1]} vs {first[2]}")
            bad += 1
        else:
            print(f"SAME {k}: {len(br)} rows")
    sys.exit(1 if bad else 0)

main()
