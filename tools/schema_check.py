#!/usr/bin/env python3
"""Round-start testdata schema tripwire.

Usage: python3 tools/schema_check.py [sfDir...]   (default: all three SFs)

The driver regenerates /root/testdata between rounds and physical
types HAVE changed under us (round 9: events.ts TIMESTAMP(NANOS) →
TIMESTAMP(MICROS), which crashed every events query until
Tables.events learned to branch). This prints each table's arrow
schema and diffs it against the manifest below — run it FIRST thing
each round; a FAIL means audit Tables.scala and the oracle SQL before
touching anything else. Dev tool only — never shipped in the lib.
"""
import sys
import glob
import os
import pyarrow.parquet as pq

# What the graft readers + oracles are written against (round 9).
EXPECTED = {
    "customer": "c_custkey:int64,c_name:string,c_nationkey:int32,c_acctbal:double,c_mktsegment:string",
    "documents": "doc_id:int64,text:string,lang:string,source:string,n_chars:int64",
    "embeddings": "vec_id:int64,embedding:list<element: float>,label:int32",
    "events": "event_id:int64,ts:timestamp[us],user_id:int64,event_type:string,value:double,props:string",
    "lineitem": "l_orderkey:int64,l_partkey:int64,l_suppkey:int64,l_linenumber:int32,l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate:timestamp[us]",
    "nation": "n_nationkey:int32,n_name:string,n_regionkey:int32",
    "orders": "o_orderkey:int64,o_custkey:int64,o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp[us],o_orderpriority:string",
    "part": "p_partkey:int64,p_name:string,p_brand:string,p_type:string,p_size:int32,p_retailprice:double",
    "region": "r_regionkey:int32,r_name:string",
    "supplier": "s_suppkey:int64,s_name:string,s_nationkey:int32,s_acctbal:double",
    # Known-accepted alternates (types Tables.scala explicitly handles).
}
ACCEPTED_ALTERNATES = {
    # Tables.events branches on long (nanosAsLong) vs timestamp.
    "events": {
        "event_id:int64,ts:timestamp[ns],user_id:int64,event_type:string,value:double,props:string",
    },
}


def fmt(schema):
    return ",".join(
        f"{f.name}:{f.type}" for f in schema)


def main(dirs):
    bad = 0
    for d in dirs:
        for p in sorted(glob.glob(f"{d}/*.parquet")):
            name = os.path.basename(p)[: -len(".parquet")]
            got = fmt(pq.ParquetFile(p).schema_arrow)
            want = EXPECTED.get(name)
            if want is None:
                print(f"NEW   {d}/{name}: {got}")
                bad += 1
            elif got != want and got not in ACCEPTED_ALTERNATES.get(name, ()):
                print(f"DRIFT {d}/{name}:\n  want {want}\n  got  {got}")
                bad += 1
    print("schema check:", "FAIL — audit Tables.scala + oracles" if bad
          else "OK")
    return 1 if bad else 0


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"]
    sys.exit(main(dirs))
