#!/usr/bin/env python3
"""Round-15 transitive sf1 certification diff (verdict ask 1).

For each touched query, EXCEPT-ALL both ways in DuckDB between the
r13-binary dump (sf1-certified lineage) and the current-binary dump on
the same /tmp/graft_sf1 fixture; also compares row counts. Empty diffs
certify the rework's results at sf1 without a second oracle replay.
"""
import sys, glob, os
import duckdb

OLD = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_r13bin"
NEW = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_r15bin"

names = sorted(os.path.basename(p) for p in glob.glob(f"{OLD}/*")
               if os.path.isdir(p))
fails = 0
for n in names:
    po, pn = f"{OLD}/{n}/*.parquet", f"{NEW}/{n}/*.parquet"
    try:
        co = duckdb.sql(f"SELECT count(*) FROM '{po}'").fetchone()[0]
        cn = duckdb.sql(f"SELECT count(*) FROM '{pn}'").fetchone()[0]
        d1 = duckdb.sql(
            f"SELECT count(*) FROM (SELECT * FROM '{po}' EXCEPT ALL "
            f"SELECT * FROM '{pn}')").fetchone()[0]
        d2 = duckdb.sql(
            f"SELECT count(*) FROM (SELECT * FROM '{pn}' EXCEPT ALL "
            f"SELECT * FROM '{po}')").fetchone()[0]
        ok = co == cn and d1 == 0 and d2 == 0
        print(f"{'OK  ' if ok else 'FAIL'} {n}: rows {co}/{cn}, "
              f"diff {d1}+{d2}")
        fails += 0 if ok else 1
    except Exception as e:
        print(f"ERR  {n}: {e}")
        fails += 1
print("ALL IDENTICAL" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
