#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [--only q1,q2]

Pass --only with the same list given to Verify via SPARK_GRAFT_ONLY
when checking a subset dump; without it a missing result directory is
a FAIL (a query that crashed in Verify writes no dir — it must not
vanish from a full-run gate).

For each query in <verifyOutDir>/oracle_sql.json: run the oracle SQL in
DuckDB (tables = views over <sfDir>/*.parquet), load the Spark result
parquet, sort columns by name and rows by all columns, and compare
row counts, schemas (loosely) and values (exact for strings/ints,
1e-9-relative for floats).  Dev tool only — never shipped in the lib.
"""
import json, sys, glob, os
import duckdb

def canon(con, rel_sql):
    df = con.sql(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for q, sql in sorted(oracle.items()):
        if only is not None and q not in only:
            continue
        spark_dir = f"{out_dir}/{q}"
        if not os.path.isdir(spark_dir):
            # In a FULL run a missing dir means the query crashed in
            # Verify (its catch block writes nothing) — that is a FAIL,
            # not a skip; only an explicit --only subset may omit dirs.
            print(f"FAIL {q}: no result directory (query crashed in Verify?)")
            n_fail += 1
            continue
        try:
            got = canon(con, f"SELECT * FROM '{spark_dir}/*.parquet'")
            want = canon(con, sql)
        except Exception as e:
            print(f"FAIL {q}: exec error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {q}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {q}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        import pandas as pd
        import numpy as np
        bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                aa, bb = a.astype(float), b.astype(float)
                nmask = aa.isna() & bb.isna()
                close = np.isclose(aa, bb, rtol=0, atol=0) | nmask
                if not close.all():
                    i = int(np.argmin(close.values))
                    bad = f"col {c} row {i}: {aa[i]!r} != {bb[i]!r}"
                    break
            else:
                eq = (a.astype(str).fillna("<NA>") == b.astype(str).fillna("<NA>"))
                if not eq.all():
                    i = int(np.argmin(eq.values))
                    bad = f"col {c} row {i}: {a[i]!r} != {b[i]!r}"
                    break
        if bad:
            print(f"FAIL {q}: {bad}")
            n_fail += 1
        else:
            print(f"PASS {q} ({len(got)} rows)")
            n_pass += 1
    extra = set(os.listdir(out_dir)) - set(oracle) - {"oracle_sql.json"}
    for q in sorted(extra):
        try:
            n = con.sql(f"SELECT COUNT(*) FROM '{out_dir}/{q}/*.parquet'").fetchone()[0]
            print(f"INFO {q} (no oracle): {n} rows")
        except Exception as e:
            print(f"INFO {q} (no oracle): unreadable: {e}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    sys.exit(main(args[0], args[1], only))
