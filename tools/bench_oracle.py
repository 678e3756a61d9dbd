#!/usr/bin/env python3
"""DuckDB baseline anchor (driver-side tool, NOT part of the library).

Times every oracle SQL from a Verify dump in DuckDB against the same
parquet tables graft.Bench reads, so BENCH_r{N}.json has an in-repo
absolute number to compare against (the "within 2x of baseline" gate).

Usage: python3 tools/bench_oracle.py [sfDir] [verifyOutDir] [repeats]

Notes on comparability: DuckDB executes the ANSI oracle formulations,
which are the reference semantics but not always the engine's plan shape
(e.g. q_near_dup's oracle is the all-pairs string join the Spark side
deliberately avoids). Wall-clock is best-of-N to strip cold-cache noise.
"""
import json, sys, time, glob
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

con = duckdb.connect()
con.sql("PRAGMA threads=32")
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
times, errors = {}, {}
for name in sorted(oracles):
    best = None
    for _ in range(repeats):
        t0 = time.monotonic()
        try:
            con.sql(oracles[name]).fetchall()
        except Exception as e:
            errors[name] = str(e).splitlines()[0][:200]
            break
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    if best is not None:
        times[name] = round(best, 4)

print(json.dumps({"sf": sf, "unit": "sec(best-of-%d)" % repeats,
                  "total": round(sum(times.values()), 3),
                  "queries": times, "errors": errors}))
