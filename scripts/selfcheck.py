#!/usr/bin/env python3
"""Local pre-check replicating the driver's DuckDB oracle compare.

Usage: python3 scripts/selfcheck.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet (Spark result) and runs the matching
oracle_sql.json query in DuckDB over the sf tables; compares after sorting
columns by name and rows by all columns. Dev tool only — not shipped code.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Ops allowed to return 0 rows at sf0.01. An empty result that the oracle
# also returns empty is VACUOUS — it passes the compare while checking
# nothing (x_boilerplate shipped that way for two rounds before it was
# caught). Today every op yields rows at sf0.01, so the allowlist is
# empty; add a name here ONLY with a comment saying why empty is correct.
VACUOUS_OK: set = set()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        # vacuity guard (sf0.01 = the driver's gate scale): both sides
        # empty means the oracle verified nothing at all
        if (len(g) == 0 and name not in VACUOUS_OK
                and sf_dir.rstrip("/").endswith("sf0.01")):
            print(f"FAIL {name}: vacuous — 0 rows at sf0.01; the oracle "
                  "discriminates nothing (allowlist in selfcheck.py only "
                  "if genuinely empty)")
            failures += 1
            continue
        mismatched = []
        # The driver's comparator hashes raw values, so a dtype KIND gap
        # that a value-== compare forgives (e.g. DuckDB HUGEINT from an
        # uncast integer SUM arriving as float64, vs Spark BIGINT) is a
        # real FAIL there. Width-only gaps (int32 vs int64, e.g. Spark's
        # year()) hash identically in the driver — don't flag those.
        dtype_gap = [c for c in g.columns
                     if g[c].dtype.kind != w[c].dtype.kind]
        if dtype_gap:
            print(f"FAIL {name}: dtype mismatch in {dtype_gap}: "
                  f"got={[str(g[c].dtype) for c in dtype_gap]} "
                  f"want={[str(w[c].dtype) for c in dtype_gap]} "
                  "(uncast integer SUM in oracle SQL?)")
            failures += 1
            continue
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:  # noqa: BLE001
                eq = a.astype(str) == b.astype(str)
            if not bool(eq.all()):
                mismatched.append(c)
        if mismatched:
            print(f"FAIL {name}: value mismatch in {mismatched}")
            for c in mismatched[:2]:
                diff = g[c][~((g[c].isna() & w[c].isna()) | (g[c] == w[c]))]
                idx = diff.index[:3]
                print(f"   {c}: got={list(g[c][idx])} want={list(w[c][idx])}")
            failures += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
    print(f"{'SELFCHECK PASS' if failures == 0 else f'SELFCHECK FAIL ({failures})'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
