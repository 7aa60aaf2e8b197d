#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]

Reads each <verify_out_dir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the sf_dir tables, sorts
columns by name and rows by all columns, and diffs the values. Mirrors the
driver's compare closely enough to catch schema/name/value drift before a
round ends.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        # exact repr — doubles must match bit-for-bit (queries round
        # explicitly, so any drift here is a real engine difference)
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            d_cols = [d[0] for d in duck_rel.description]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        s_canon, s_names = canon(s_rows, s_cols)
        d_canon, d_names = canon(d_rows, d_cols)
        if s_names != d_names:
            print(f"FAIL {name}: column names {s_names} vs {d_names}")
            n_fail += 1
        elif s_canon != d_canon:
            diff = [(a, b) for a, b in zip(s_canon, d_canon) if a != b]
            print(f"FAIL {name}: {len(s_canon)} vs {len(d_canon)} rows, "
                  f"first diffs: {diff[:3]}")
            n_fail += 1
        else:
            # repr-compare can't see int-width drift (a DuckDB INTEGER and a
            # Spark BIGINT repr identically) but the driver's compare is
            # schema-sensitive — surface type mismatches as warnings.
            # DBAPI description coarsens everything to NUMBER; DESCRIBE gives
            # the real types.
            def types_of(q):
                return {r[0]: r[1] for r in con.execute(f"DESCRIBE {q}").fetchall()}
            s_types = types_of(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            d_types = types_of(sql)
            drift = {c: (s_types[c], d_types[c])
                     for c in s_types if c in d_types and s_types[c] != d_types[c]}
            if drift:
                print(f"PASS {name} ({len(s_canon)} rows) TYPEWARN: {drift}")
            else:
                print(f"PASS {name} ({len(s_canon)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
