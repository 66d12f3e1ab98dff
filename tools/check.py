#!/usr/bin/env python3
"""Dev-only local oracle checker (mimics the driver's DuckDB compare).

Not part of the Scala library. Usage:
    python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

For each query dumped by graft.Verify, runs the corresponding oracle SQL
from oracle_sql.json in DuckDB (tables registered as views over the same
parquet) and compares: column set (sorted by name), row count, and
values row-by-row.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns oracle={list(exp.columns)} spark={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows oracle={len(exp)} spark={len(got)}")
            n_fail += 1
            continue
        dt_diff = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in exp.columns
                   if str(exp[c].dtype) != str(got[c].dtype)]
        if dt_diff:
            print(f"FAIL {name}: dtype mismatch (oracle vs spark): {dt_diff}")
            n_fail += 1
            continue
        diff_cols = []
        for c in exp.columns:
            a, b = exp[c], got[c]
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                diff_cols.append(f"{c} (row {i}: oracle={a[i]!r} spark={b[i]!r}, "
                                 f"{int((~eq).sum())} diffs)")
        if diff_cols:
            print(f"FAIL {name}: value diffs: {'; '.join(diff_cols)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(exp)} rows x {len(exp.columns)} cols")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
