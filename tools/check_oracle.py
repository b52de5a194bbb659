#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json (written by graft.Verify), runs
each SQL in DuckDB against views over <sf_dir>/*.parquet, loads the
Spark parquet result from <verify_out_dir>/<name>/, then compares:
column names (sorted), row count, and values (rows sorted, exact
equality; NaN==NaN).

Dev tool only — the library itself has no Python dependency.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return repr(v)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    # Optional 3rd arg: restrict to queries whose name contains it
    # (pairs with Verify's identical dev-only filter).
    # Comma-OR name filter (Bench/Verify dev-filter semantics).
    name_filter = sys.argv[3] if len(sys.argv) > 3 else ""
    terms = [t.strip() for t in name_filter.split(",") if t.strip()]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(n for n in oracles
                       if not terms or any(t in n for t in terms)):
        sql = oracles[name]
        try:
            oracle = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue

        o_cols, s_cols = sorted(oracle.columns), sorted(spark.columns)
        if o_cols != s_cols:
            print(f"FAIL {name}: columns differ oracle={o_cols} spark={s_cols}")
            n_fail += 1
            continue
        o = oracle[o_cols]
        s = spark[s_cols]
        o_rows = sorted(tuple(norm_cell(v) for v in r)
                        for r in o.itertuples(index=False, name=None))
        s_rows = sorted(tuple(norm_cell(v) for v in r)
                        for r in s.itertuples(index=False, name=None))
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rows oracle={len(o_rows)} spark={len(s_rows)}")
            n_fail += 1
            continue
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(o_rows, s_rows))
                 if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(o_rows)} rows differ; "
                  f"first: oracle={diffs[0][1]} spark={diffs[0][2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o_rows)} rows, cols={o_cols})")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
