#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<query>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB over the fixture
tables in <sf_dir>, then compares: row count, column names, and values
(columns sorted by name, rows canonically sorted). Exact equality, same
spirit as the driver's hash compare.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(val)  # full precision; bit-level mismatches must show up
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for _, c in sorted(zip(cols, cols))], out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            failures += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            failures += 1
            continue
        _, g = canon_rows(got_cols, got_rows)
        _, x = canon_rows(exp_cols, exp_rows)
        if len(g) != len(x):
            print(f"FAIL {name}: rowcount {len(g)} != {len(x)}")
            failures += 1
            continue
        diffs = [(a, b) for a, b in zip(g, x) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)} differing rows; first: {diffs[0]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(g)} rows")
    # queries without an oracle: rows-only
    import os
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if os.path.isdir(path) and name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{path}/*.parquet')").fetchone()[0]
            status = "OK  " if n > 0 else "WARN"
            print(f"{status} {name}: rows-only check, {n} rows")
            if n == 0:
                failures += 1
    print(f"{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
