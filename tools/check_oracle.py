#!/usr/bin/env python3
"""Dev-only pre-check that mirrors the driver's DuckDB oracle gate — strictly.

Round-1 lesson: a laxer mirror (tz_localize(None), astype(str) int compare)
reported 39/39 while the driver failed 14 queries. This version reads the
Spark output parquet THROUGH DuckDB so both sides are typed by the same
engine, then demands:
  schema: identical (column, duckdb-type) sets after sorting columns by name
          — TIMESTAMP vs TIMESTAMP WITH TIME ZONE and BIGINT vs HUGEINT are
          mismatches, exactly as at the driver gate
  rows:   identical counts
  values: exact equality per cell after sorting columns by name and rows by
          all columns (floats compared bitwise-exact; a max|Δ| is printed to
          distinguish ulp noise from real bugs)

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
Usage: python3 tools/check_oracle.py <sfDir> <outDir>
Not part of the shipped Scala library; uses the driver-side python stack.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def typed_schema(con, sql: str):
    """[(column, duckdb_type)] sorted by column name."""
    rows = con.sql(f"DESCRIBE {sql}").fetchall()
    return sorted((r[0], r[1]) for r in rows)


def fetch_sorted(con, sql: str, cols) -> pd.DataFrame:
    # Sort rows in PANDAS, not DuckDB: the driver's gate sorts via
    # pandas sort_values, which cannot handle cells the DuckDB engine can
    # (e.g. top-level ARRAY cells raise "unhashable type: numpy.ndarray").
    # Sorting here the same way makes any such output shape fail locally
    # before it reaches the driver (round-3 lesson: DuckDB ORDER BY
    # green-lit two queries the driver could not compare).
    names = [c for c, _ in cols]
    sel = ", ".join(f'"{c}"' for c in names)
    df = con.sql(f'SELECT {sel} FROM ({sql})').df()
    return df.sort_values(by=names, kind="mergesort").reset_index(drop=True)


def compare(con, name: str, spark_glob: str, oracle_sql: str) -> str:
    spark_sql = f"SELECT * FROM read_parquet('{spark_glob}')"
    s_schema = typed_schema(con, spark_sql)
    o_schema = typed_schema(con, f"({oracle_sql})")
    if s_schema != o_schema:
        return f"SCHEMA MISMATCH spark={s_schema} duckdb={o_schema}"
    got = fetch_sorted(con, spark_sql, s_schema)
    exp = fetch_sorted(con, oracle_sql, o_schema)
    if len(got) != len(exp):
        return f"ROWCOUNT MISMATCH spark={len(got)} duckdb={len(exp)}"
    bad = []
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(e):
            mask = ~((g == e) | (g.isna() & e.isna()))
            if mask.any():
                d = (g[mask] - e[mask]).abs().max()
                bad.append(f"{c}: {int(mask.sum())} diffs, max |Δ|={d:.3e}")
        else:
            # identical duckdb types → same pandas dtype; any remaining
            # difference is a genuine value diff (no string coercion)
            try:
                mask = ~((g == e) | (g.isna() & e.isna()))
            except (TypeError, ValueError):
                gs, es = g.apply(repr), e.apply(repr)
                mask = gs != es
            if mask.any():
                i = mask.idxmax()
                bad.append(
                    f"{c}: {int(mask.sum())} diffs, first@{i}: {g[i]!r} vs {e[i]!r}")
    return "; ".join(bad) if bad else ""


def main(sf_dir: str, out_dir: str, only: str | None = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    if only:
        names = set(only.split(","))
        oracles = {k: v for k, v in oracles.items() if k in names}
    fails = 0
    for name, sql in sorted(oracles.items()):
        try:
            msg = compare(con, name, f"{out_dir}/{name}/*.parquet", sql)
        except Exception as e:
            msg = f"error: {e}"
        if msg:
            print(f"FAIL {name}: {msg}")
            fails += 1
        else:
            print(f"ok   {name}")
    print(f"== {len(oracles) - fails}/{len(oracles)} queries match ==")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
