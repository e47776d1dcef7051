#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query parquet in <verifyOutDir> with an entry in
oracle_sql.json: register the sfDir tables as DuckDB views, run the
oracle SQL, and compare against the Spark result after sorting columns
by name and rows by all values. Reports per-query row/schema/value
match. (Driver-side only: this script is NOT part of the Scala
library; it exists to pre-validate oracle parity before the round's
official verification.)
"""
import json
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    # sort columns by name, then rows by all values (as strings to
    # sidestep NaN ordering), round floats
    # strict: no float rounding — queries must produce bit-identical
    # doubles (single-expression arithmetic, or rounded in-query at the
    # exact decimal grain of the true value)
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        if name not in oracles:
            results[name] = f"rows-only: {len(spark_df)} rows"
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}"
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff[diff].index[0]
            results[name] = (f"VALUE MISMATCH at row {i}:\n  spark={a.iloc[i].to_dict()}\n"
                             f"  oracle={b.iloc[i].to_dict()}")
        else:
            results[name] = f"OK ({len(a)} rows)"
    bad = 0
    for k, v in sorted(results.items()):
        flag = " " if v.startswith(("OK", "rows-only")) else "!"
        if flag == "!":
            bad += 1
        print(f"{flag} {k}: {v}")
    print(f"\n{len(results)} queries, {bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
