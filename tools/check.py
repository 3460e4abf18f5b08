#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle statement in DuckDB
with the sf tables registered as views, reads the Spark-side result parquet
with pandas/pyarrow (like the driver), sorts columns by name and rows with
pandas sort_values (like the driver — this intentionally crashes on
array-typed columns, as the driver does), and compares cells stringified
per-column with pandas astype(str). That reproduces the driver's
dtype-sensitive hash: Decimal("3.140000") != "3.14", HUGEINT-as-float
"3.0" != BIGINT "3", Spark floor BIGINT "3" != DuckDB DOUBLE "3.0" — while
int32 vs int64 ("3" == "3") and date vs midnight-datetime64 (pandas astype
drops the midnight time) compare equal, matching observed driver behavior.
Dev tool only — not part of the shipped library.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Sort columns by name, then rows by all columns, like the driver."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def fingerprint(df):
    s = df.astype(str)
    # normalize nulls across object-None / float-nan / NaT renderings
    s = s.mask(df.isna(), "<null>")
    return [tuple(row) for row in s.itertuples(index=False)]


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
            parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            g = pd.concat([pd.read_parquet(p) for p in parts],
                          ignore_index=True) if parts else pd.read_parquet(
                              f"{out_dir}/{name}")
            g = canon(g)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: "
                  f"{str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        try:
            w = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} "
                  f"oracle={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            n_fail += 1
            continue
        gr, wr = fingerprint(g), fingerprint(w)
        if gr != wr:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(gr, wr) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows "
                  f"(cols {list(g.columns)})")
            for a, b in diffs[:3]:
                print(f"   spark : {a}\n   oracle: {b}")
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
