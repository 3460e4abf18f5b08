#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle statement in DuckDB
with the sf tables registered as views, reads the Spark-side result parquet,
sorts columns by name and rows by value, and diffs. Dev tool only — not part
of the shipped library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(oracle[name])
            w_cols = [d[0] for d in want.description]
            w_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        gc, gr = canon(g_rows, g_cols)
        wc, wr = canon(w_rows, w_cols)
        if gc != wc:
            print(f"FAIL {name}: columns spark={gc} oracle={wc}")
            n_fail += 1
        elif gr != wr:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(gr, wr) if a != b]
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(wr)}, "
                  f"{len(diffs)} differing (cols {gc})")
            for a, b in diffs[:3]:
                print(f"   spark : {a}\n   oracle: {b}")
            if len(gr) != len(wr):
                print(f"   spark head : {gr[:2]}\n   oracle head: {wr[:2]}")
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
