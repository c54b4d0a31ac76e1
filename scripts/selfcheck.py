#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: selfcheck.py [verify_out_dir] [sf_dir]

Reads each Spark result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same fixture tables, and
compares (columns sorted by name, rows sorted, exact values).
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixture: single file <sf>/<t>.parquet; generated fixture
        # (GenFixture): Spark directory <sf>/<t>.parquet/part-*.parquet
        path = f"{sf}/{t}.parquet"
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        try:
            ora_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {e}"
            continue
        a, b = norm(spark_df), norm(ora_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_COLS: spark={list(a.columns)} oracle={list(b.columns)}"
            continue
        if [str(x) for x in a.dtypes] != [str(x) for x in b.dtypes]:
            results[name] = (f"SCHEMA_TYPES: spark={[str(x) for x in a.dtypes]} "
                             f"oracle={[str(x) for x in b.dtypes]}")
            # keep going — value compare may still pass after str-normalize
        if len(a) != len(b):
            results[name] = f"ROWCOUNT: spark={len(a)} oracle={len(b)}"
            continue
        av = a.astype(str).values.tolist()
        bv = b.astype(str).values.tolist()
        if av == bv:
            # non-vacuity guard (round-9 verdict #2): an empty result that
            # matches an empty oracle proves only that both engines return
            # nothing — fail loud so a fixture/parameter drift that empties
            # a gate can't hide behind a hash match
            if len(av) == 0:
                results[name] = "VACUOUS_EMPTY (0 rows both sides)"
                continue
            results[name] = results.get(name, "OK")
            if results[name].startswith("SCHEMA_TYPES"):
                results[name] += " (values match)"
        else:
            diffs = [(i, x, y) for i, (x, y) in enumerate(zip(av, bv)) if x != y][:3]
            results[name] = f"VALUE_MISMATCH ({len([1 for x, y in zip(av, bv) if x != y])}/{len(av)} rows): {diffs}"
    # queries without oracle: report row counts only
    for name in sorted(set(
            d.split("/")[-1] for d in glob.glob(f"{out}/*") if "." not in d.split("/")[-1])):
        if name not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out}/{name}/*.parquet')").fetchone()[0]
            results[name] = f"NO_ORACLE rows={n}"
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        flag = "PASS" if v == "OK" else ("INFO" if v.startswith("NO_ORACLE") else "FAIL")
        print(f"[{flag}] {name}: {v}")
    print(f"\n{ok}/{len(oracle)} oracle queries match")


if __name__ == "__main__":
    main()
