#!/usr/bin/env python3
"""Generate the synthetic sf1 (10x) relational tables used by the scale
stress (NOTES round 7): 10 copies of each sf0.1 table with DISJOINT key
spaces (keys offset per copy), so per-key structure is preserved within
a copy and never collides across copies -- row counts scale 10x, key
cardinalities scale 10x, value distributions are unchanged.

Usage: python3 tools/gen_sf1_tables.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /root/repo/tmp/sf1
(documents.parquet comes from tools/gen_sf1.py -- token-suffixed copies.)
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/sf1"

con = duckdb.connect()
os.makedirs(dst, exist_ok=True)

SPECS = {
    "orders": """
      SELECT o_orderkey + k.k * 100000000 AS o_orderkey,
             o_custkey + k.k * 10000000 AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM '{src}/orders.parquet', range(10) AS k(k)""",
    "lineitem": """
      SELECT l_orderkey + k.k * 100000000 AS l_orderkey,
             l_partkey + k.k * 10000000 AS l_partkey,
             l_suppkey + k.k * 1000000 AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM '{src}/lineitem.parquet', range(10) AS k(k)""",
    "customer": """
      SELECT c_custkey + k.k * 10000000 AS c_custkey,
             c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM '{src}/customer.parquet', range(10) AS k(k)""",
    "events": """
      SELECT event_id + k.k * 1000000000 AS event_id, ts,
             user_id + k.k * 10000000 AS user_id,
             event_type, value, props
      FROM '{src}/events.parquet', range(10) AS k(k)""",
    "embeddings": """
      SELECT vec_id + k.k * 10000000 AS vec_id, embedding, label
      FROM '{src}/embeddings.parquet', range(10) AS k(k)""",
    # part/supplier offsets MATCH lineitem's l_partkey/l_suppkey offsets,
    # so every fact row still joins its dimension row within its copy --
    # without these, 9/10 of lineitem would dangle and every part/supplier
    # join would run unrealistically fast on 10% matches.
    "part": """
      SELECT p_partkey + k.k * 10000000 AS p_partkey,
             p_name, p_brand, p_type, p_size, p_retailprice
      FROM '{src}/part.parquet', range(10) AS k(k)""",
    "supplier": """
      SELECT s_suppkey + k.k * 1000000 AS s_suppkey,
             s_name, s_nationkey, s_acctbal
      FROM '{src}/supplier.parquet', range(10) AS k(k)""",
    # nation/region stay 1x: customer/supplier keep their nationkeys, so
    # the shared dimension is identical across copies by construction.
    "nation": "SELECT * FROM '{src}/nation.parquet'",
    "region": "SELECT * FROM '{src}/region.parquet'",
}

for name, sql in SPECS.items():
    con.execute(
        f"COPY ({sql.format(src=src)}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
    print(f"wrote {dst}/{name}.parquet: {n} rows")
