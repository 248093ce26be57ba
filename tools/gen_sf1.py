#!/usr/bin/env python3
"""Generate the synthetic sf1 (10x) documents table used by the dedup
scale stress (NOTES round 7): 10 copies of sf0.1, each copy's every
token suffixed c<k> -- within-copy near-dup structure preserved exactly
(token mapping is a bijection, so shingle sets map 1:1 and Jaccard is
unchanged), cross-copy similarity zero. doc_ids offset by k*1_000_000.

Usage: python3 tools/gen_sf1.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /root/repo/tmp/sf1
"""
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/sf1"

con = duckdb.connect()
con.execute("SELECT 1")  # fail fast if duckdb is broken
import os
os.makedirs(dst, exist_ok=True)
con.execute(rf"""
COPY (
  SELECT doc_id + k.k * 1000000 AS doc_id,
         regexp_replace(text, '(\S+)', concat('\1c', CAST(k.k AS VARCHAR)), 'g') AS text,
         lang, source,
         length(regexp_replace(text, '(\S+)', concat('\1c', CAST(k.k AS VARCHAR)), 'g')) AS n_chars
  FROM '{src}/documents.parquet', range(10) AS k(k)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
n, avg = con.execute(f"SELECT count(*), round(avg(len(text)),1) FROM '{dst}/documents.parquet'").fetchone()
print(f"wrote {dst}/documents.parquet: {n} docs, avg {avg} chars")
