#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: oracle_check.py [sf_dir] [verify_out_dir]

Reads each <out>/<name> parquet written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB against the sf tables, and
compares: row count, column names, and exact values after sorting columns
by name and rows by all columns. Exact float equality — mirrors a
hash-based compare.
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes that differ in representation only (before sorting —
    # arrays must become tuples to be orderable)
    for c in df.columns:
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], (pd.Timestamp,)) or (
                    len(sample) and type(sample.iloc[0]).__name__ == "date"):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                def to_tuple(v):
                    if isinstance(v, (list, np.ndarray)):
                        return tuple(float(x) if isinstance(x, (float, np.floating))
                                     else x for x in v)
                    return v
                df[c] = df[c].apply(to_tuple)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    # --only-present: check only the oracle entries whose spark dump
    # exists in <out> (for restricted graft.Verify runs, e.g. the sf1
    # banding-family sweep) instead of failing the absent ones.
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only_present = "--only-present" in sys.argv
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/verify_out"
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        # Spark writes a table as a DIRECTORY of part files (the sf1
        # fixture); point DuckDB at the part glob in that case.
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracle):
        if only_present and not os.path.exists(f"{out}/{name}"):
            continue
        try:
            spark_df = pd.read_parquet(f"{out}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in cols {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"  first diff col={c} row={idx}: "
                      f"spark={a[c][idx]!r} duck={b[c][idx]!r}")
            n_fail += 1
            continue
        print(f"OK   {name} ({len(a)} rows)")
    extra = [k for k in glob.glob(f"{out}/*") if k.split("/")[-1] not in oracle
             and not k.endswith(".json")]
    for k in sorted(extra):
        try:
            n = len(pd.read_parquet(k))
            print(f"ROWS {k.split('/')[-1]} ({n} rows, no oracle)")
        except Exception as e:
            print(f"FAIL {k.split('/')[-1]}: unreadable rows-only output ({e})")
            n_fail += 1
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
