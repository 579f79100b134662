#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, executes the matching
oracle SQL from oracle_sql.json in DuckDB (tables = the sfDir parquet
files), canonicalizes both sides (columns sorted by name, rows sorted
by all columns), and compares values.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # The manifest lists EVERY declared query — a query that crashed in
    # Verify (no result dir) must fail here, not be silently skipped.
    manifest_path = f"{out_dir}/_manifest.json"
    expected = sorted(json.load(open(manifest_path))) if os.path.exists(
        manifest_path) else sorted(
        n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n)))
    for name in expected:
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            print(f"FAIL {name}: query produced no result directory")
            n_fail += 1
            continue
        try:
            got = canon(con, f"SELECT * FROM '{d}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: no result parquet ({str(e)[:120]})")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        want = canon(con, oracle[name])
        ok = False
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
        else:
            try:
                import pandas.testing as pt
                pt.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)
                ok = True
            except AssertionError as e:
                print(f"FAIL {name}: {str(e)[:500]}")
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
