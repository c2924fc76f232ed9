#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify (parquet dir + oracle_sql.json),
run the oracle SQL in DuckDB over the same parquet tables, sort columns
by name, sort rows, and compare values. Prints a per-query PASS/FAIL
line plus first diffs. Dev tool only — not part of the library.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize dtypes to strings for robust compare, floats rounded.
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            out[c] = s.round(6)
        elif str(s.dtype).startswith("datetime"):
            out[c] = s.astype("datetime64[us]")
        else:
            out[c] = s
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.execute(sql).fetchdf()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                raise AssertionError(
                    f"columns differ: spark={list(g.columns)} duck={list(w.columns)}")
            if len(g) != len(w):
                raise AssertionError(f"row count: spark={len(g)} duck={len(w)}")
            if not g.equals(w):
                diff_mask = ~(g.eq(w) | (g.isna() & w.isna()))
                bad = diff_mask.any(axis=1)
                raise AssertionError(
                    "values differ, first diffs:\n"
                    f"spark:\n{g[bad].head(3)}\nduck:\n{w[bad].head(3)}")
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
