#!/usr/bin/env python3
"""Dev-only pre-check that mirrors the driver's DuckDB oracle gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query output parquet, runs the corresponding oracle SQL from
oracle_sql.json in DuckDB over the same testdata parquet tables, sorts
columns by name and rows by all columns, and compares values exactly
(with a small float report to distinguish ulp noise from real bugs).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
Not part of the shipped Scala library; uses the driver-side python stack.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:  # Spark parquet ts is tz-aware UTC, DuckDB naive
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> str:
    got, exp = norm(got), norm(exp)
    if list(got.columns) != list(exp.columns):
        return f"SCHEMA MISMATCH spark={list(got.columns)} duckdb={list(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWCOUNT MISMATCH spark={len(got)} duckdb={len(exp)}"
    bad = []
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            gn, en = g.astype(float), e.astype(float)
            mask = ~((gn == en) | (gn.isna() & en.isna()))
            if mask.any():
                d = (gn[mask] - en[mask]).abs().max()
                bad.append(f"{c}: {mask.sum()} diffs, max |Δ|={d:.3e}")
        else:
            gs, es = g.astype(str), e.astype(str)
            mask = gs != es
            if mask.any():
                i = mask.idxmax()
                bad.append(f"{c}: {mask.sum()} diffs, first@{i}: {g[i]!r} vs {e[i]!r}")
    return "; ".join(bad) if bad else ""


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    fails = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            fails += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            fails += 1
            continue
        msg = compare(name, got, exp)
        if msg:
            print(f"FAIL {name}: {msg}")
            fails += 1
        else:
            print(f"ok   {name}: {len(got)} rows x {len(got.columns)} cols")
    print(f"== {len(oracles) - fails}/{len(oracles)} queries match ==")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
