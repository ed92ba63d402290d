#!/usr/bin/env python3
"""Inventory-wide partition-invariance gate.

Usage:
  SPARK_GRAFT_CPUS=4  sbt "runMain graft.Verify <sfDir> /tmp/invA"
  SPARK_GRAFT_CPUS=13 sbt "runMain graft.Verify <sfDir> /tmp/invB"
  python3 tools/invariance_check.py /tmp/invA /tmp/invB

Bit-compares every query's parquet output between two Verify dumps
produced under DIFFERENT parallelism (different partition counts,
different accumulation orders, different AQE decisions). A mismatch
means the query's result depends on partitioning — the class the
exact-integer / decimal / floor-quantization disciplines exist to
prevent, and one the single-run DuckDB oracle can miss when both
engines happen to agree. Dev tool only — never shipped in the lib.
"""
import sys
import os
import glob
import struct
import math
import duckdb


def canon(con, rel_sql):
    df = con.sql(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            x, y = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(x) and math.isnan(y):
            return True
        return struct.pack(">d", x) == struct.pack(">d", y)
    try:
        if a != a and b != b:
            return True
    except Exception:
        pass
    return a == b or str(a) == str(b)


def main(dir_a, dir_b):
    con = duckdb.connect()
    qa = {os.path.basename(d) for d in glob.glob(f"{dir_a}/q_*")}
    qb = {os.path.basename(d) for d in glob.glob(f"{dir_b}/q_*")}
    n_pass = n_fail = 0
    for q in sorted(qa | qb):
        if q not in qa or q not in qb:
            print(f"FAIL {q}: present in only one dump")
            n_fail += 1
            continue
        try:
            a = canon(con, f"SELECT * FROM '{dir_a}/{q}/*.parquet'")
            b = canon(con, f"SELECT * FROM '{dir_b}/{q}/*.parquet'")
        except Exception as e:
            print(f"FAIL {q}: load error: {e}")
            n_fail += 1
            continue
        if len(a) != len(b) or list(a.columns) != list(b.columns):
            print(f"FAIL {q}: shape {a.shape} vs {b.shape}")
            n_fail += 1
            continue
        bad = None
        for c in a.columns:
            for i, (x, y) in enumerate(zip(a[c].tolist(), b[c].tolist())):
                if not cells_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {q}: col={c} row={i}: {x!r} vs {y!r}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"== {n_pass} invariant / {n_fail} partition-dependent ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
