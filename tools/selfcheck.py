#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (NOT part of the library).

Usage: python3 tools/selfcheck.py [sfDir] [outDir]

Assumes `graft.Verify` has already written <outDir>/<query>/ parquet dirs and
<outDir>/oracle_sql.json. Registers the sfDir parquet tables in DuckDB, runs
each oracle, and compares against the Spark result: row count, column names
(sorted), and values (doubles to 1e-9 relative tolerance, timestamps
normalized to UTC-naive microseconds).
"""
import json, sys, glob, math
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
spark_dirs = {p.split('/')[-1] for p in glob.glob(f"{out}/*") if not p.endswith('.json')}

def canon(df):
    # sort columns by name, then rows by string repr
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False):
        rows.append(tuple(row))
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))

def eq(a, b):
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        return (a is None or (isinstance(a, float) and math.isnan(a))) and \
               (b is None or (isinstance(b, float) and math.isnan(b)))
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)

fails = []
for name in sorted(spark_dirs):
    try:
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"spark output unreadable: {e}")); continue
    if name not in oracles:
        print(f"  {name:24s} rows-only: {len(got)} rows " +
              ("OK" if len(got) > 0 else "EMPTY (suspicious)"))
        continue
    try:
        want = con.sql(oracles[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    gc, gr = canon(got)
    wc, wr = canon(want)
    if gc != [c.lower() for c in wc] and gc != wc:
        fails.append((name, f"columns differ: spark={gc} oracle={wc}")); continue
    if len(gr) != len(wr):
        fails.append((name, f"row count differs: spark={len(gr)} oracle={len(wr)}")); continue
    bad = None
    for i, (a, b) in enumerate(zip(gr, wr)):
        if not all(eq(x, y) for x, y in zip(a, b)):
            bad = (i, a, b); break
    if bad:
        fails.append((name, f"row {bad[0]} differs:\n    spark : {bad[1]}\n    oracle: {bad[2]}"))
    else:
        print(f"  {name:24s} OK ({len(gr)} rows)")

print()
if fails:
    print(f"FAILED {len(fails)}:")
    for n, msg in fails:
        print(f"  {n}: {msg}")
    sys.exit(1)
print("ALL MATCH")
