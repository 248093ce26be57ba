#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare row count, schema and
values (columns sorted by name, rows sorted by all columns).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and collapse float noise far below query-side rounding
        if v == 0:
            return "0"
        return f"{v:.10g}"
    return str(v)


def table_repr(rows):
    return sorted(",".join(norm_cell(c) for c in r) for r in rows)


def write_diff(out_dir, name, g, e):
    """Multiset per-row diff so a red names rows, not just a hash."""
    from collections import Counter
    cg, ce = Counter(g), Counter(e)
    only_spark = sorted((cg - ce).elements())
    only_duck = sorted((ce - cg).elements())
    path = f"{out_dir}/{name}.diff"
    with open(path, "w") as f:
        for r in only_spark:
            f.write(f"spark-only\t{r}\n")
        for r in only_duck:
            f.write(f"duck-only\t{r}\n")
    return path, len(only_spark), len(only_duck)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    print(f"duckdb module {duckdb.__version__}; engine "
          f"{con.execute('SELECT version()').fetchone()[0]}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        g = table_repr([[r[i] for i in gi] for r in got_rows])
        e = table_repr([[r[i] for i in ei] for r in exp_rows])
        if len(g) != len(e):
            path, ns, nd = write_diff(out_dir, name, g, e)
            print(f"FAIL {name}: rows {len(g)} != {len(e)}; "
                  f"diff ({ns} spark-only / {nd} duck-only) -> {path}")
            n_fail += 1
            continue
        diffs = [(a, b) for a, b in zip(g, e) if a != b]
        if diffs:
            path, ns, nd = write_diff(out_dir, name, g, e)
            print(f"FAIL {name}: {len(diffs)} differing rows; first: "
                  f"spark={diffs[0][0]!r} duck={diffs[0][1]!r}; "
                  f"diff ({ns} spark-only / {nd} duck-only) -> {path}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
