#!/usr/bin/env python3
"""Dev-only local oracle checker (mimics the driver's DuckDB compare).

Not part of the Scala library. Usage:
    python3 tools/check.py [--strict] <sfDir> <verifyOutDir> [query ...]

For each query dumped by graft.Verify, runs the corresponding oracle SQL
from oracle_sql.json in DuckDB (tables registered as views over the same
parquet) and compares: column set (sorted by name), row count, and
values row-by-row.

--strict additionally mimics the DRIVER's asymmetric read paths, which
the default mode cannot see because it routes BOTH sides through DuckDB
fetchdf (collapsing every decimal to float64): the driver reads the
ORACLE via fetchdf but the SPARK parquet natively via pyarrow, where a
decimal128 column survives as pandas `object` (Decimal values) and
hash-mismatches a float64 oracle even when every value agrees — q207's
round-9 red row. Strict mode re-reads the spark output through pyarrow
and compares post-collapse pandas dtypes (tz/unit-normalized), so a
wide-decimal output fails locally before the driver sees it. Verified
calibration: old-q207 fails strict; q90/q91/q158/q160 (date-vs-ts and
small-decimal-vs-double oracles, driver-green in r09) pass.
"""
import json
import sys

import duckdb


def canon_dtype(s):
    """Canonical pandas dtype name: collapse tz/unit variants the
    driver's compare normalizes, keep class differences (object ≠
    float64 ≠ int64)."""
    if s.startswith("datetime64"):
        return "datetime64"
    return s

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def main():
    argv = sys.argv[1:]
    strict = "--strict" in argv
    if strict:
        argv = [a for a in argv if a != "--strict"]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
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
        if strict:
            # oracle through fetchdf (driver's path, = `exp` above);
            # spark parquet through PYARROW, not DuckDB — the driver's
            # other path, where decimals don't collapse to float64.
            # Imported lazily: the default path needs only duckdb.
            import pyarrow.dataset as pads
            pa_df = pads.dataset(f"{out_dir}/{name}", format="parquet").to_table().to_pandas()
            exp_t = {c: canon_dtype(str(exp[c].dtype)) for c in exp.columns}
            got_t = {c: canon_dtype(str(pa_df[c].dtype)) for c in pa_df.columns}
            at_diff = [(c, exp_t[c], got_t.get(c)) for c in sorted(exp_t)
                       if exp_t[c] != got_t.get(c)]
            if at_diff:
                print(f"FAIL {name}: STRICT post-collapse dtype mismatch "
                      f"(oracle-fetchdf vs spark-pyarrow): {at_diff}")
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
