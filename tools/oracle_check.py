#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, executes the matching
oracle SQL from oracle_sql.json in DuckDB (tables = the sfDir parquet
files), canonicalizes both sides (columns sorted by name, rows sorted
by all columns), and compares values.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.execute(rel_sql).fetchdf()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def norm_type(t):
    """Canonical arrow type string: ignores nested field NAMES (Spark
    writes list<element: …>, DuckDB exports list<l: …>) and the
    string/large_string distinction, but keeps everything the driver's
    strict compare keeps — timestamp unit AND tz, decimal precision and
    scale, integer width."""
    if pa.types.is_large_string(t):
        t = pa.string()
    if pa.types.is_large_binary(t):
        t = pa.binary()
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(f"{f.name}: {norm_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{norm_type(t.key_type)}, {norm_type(t.item_type)}>"
    return str(t)


def arrow_schema(name_to_type):
    return {n: norm_type(t) for n, t in name_to_type}


def spark_arrow_types(result_dir):
    files = sorted(glob.glob(os.path.join(result_dir, "*.parquet")))
    sch = pq.read_schema(files[0])
    return arrow_schema((f.name, f.type) for f in sch)


def oracle_arrow_types(con, sql):
    tbl = con.execute(sql).arrow()
    return arrow_schema((f.name, f.type) for f in tbl.schema)


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
        # Arrow-level type strictness FIRST — the driver hashes the
        # TYPED values, so LTZ-vs-NTZ or decimal(28,6)-vs-(38,6) drift
        # fails there even when every value matches (round-1 lesson).
        got_types = spark_arrow_types(d)
        want_types = oracle_arrow_types(con, oracle[name])
        ok = False
        if got_types != want_types:
            drift = {k: (got_types.get(k), want_types.get(k))
                     for k in set(got_types) | set(want_types)
                     if got_types.get(k) != want_types.get(k)}
            print(f"FAIL {name}: arrow type drift {drift}")
        elif list(got.columns) != list(want.columns):
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
