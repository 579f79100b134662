#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, executes the matching
oracle SQL from oracle_sql.json in DuckDB (tables = the sfDir parquet
files), canonicalizes both sides (columns sorted by name, rows sorted
by all columns), and compares values.

Usage: python3 tools/oracle_check.py <sfDir> <outDir>
"""
import datetime
import decimal
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_val(v):
    """Type-TAGGED canonical value string. The tag is the point: the
    driver hashes typed values, so a DuckDB decimal that its pandas
    fetch path degraded to float64 must hash differently from a Spark
    decimal128 even when numerically equal (round-2 lesson: the lax
    pandas compare here green-lit exactly what the driver failed)."""
    if v is None or v is pa.NA:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"  # keeps scale: Decimal('1.500000') != float 1.5
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "∅" if f != f else f"f:{f!r}"  # NaN ≡ null (both engines)
    if isinstance(v, datetime.datetime):  # before date (datetime is a date)
        return f"t:{v.isoformat()}"
    if isinstance(v, datetime.date):
        return f"D:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, str):
        return f"s:{v}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_val(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}={canon_val(v[k])}" for k in sorted(v)) + "}"
    if hasattr(v, "isoformat"):  # pandas Timestamp and friends
        return f"t:{v.isoformat()}"
    if v != v:  # pandas NaT
        return "∅"
    return f"?{type(v).__name__}:{v!r}"


def canon_rows(columns, row_iter):
    """Sorted list of canonical row tuples, columns sorted by name."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(canon_val(row[i]) for i in order) for row in row_iter)


def spark_rows(result_dir):
    """Engine side: read the result parquet with pyarrow so types
    survive exactly as Spark wrote them (decimal128 stays Decimal)."""
    files = sorted(glob.glob(os.path.join(result_dir, "*.parquet")))
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    return tbl.schema.names, canon_rows(
        tbl.schema.names, zip(*cols) if cols else iter(()))


def oracle_rows(con, sql):
    """Oracle side: DuckDB through the pandas fetch path — the same
    degradation layer the driver's hash sees (decimals → float64)."""
    df = con.execute(sql).fetchdf()
    names = list(df.columns)
    return names, canon_rows(
        names, (tuple(rec) for rec in df.itertuples(index=False, name=None)))


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
            got_cols, got = spark_rows(d)
        except Exception as e:
            print(f"FAIL {name}: no result parquet ({str(e)[:120]})")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        want_cols, want = oracle_rows(con, oracle[name])
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
        elif sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
        elif got != want:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(got, want))
                        if a != b)
            print(f"FAIL {name}: value drift at sorted row {diff[0]}:\n"
                  f"  spark : {diff[1]}\n  oracle: {diff[2]}")
        else:
            ok = True
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
