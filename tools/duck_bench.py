#!/usr/bin/env python3
"""Time the full DuckDB oracle basket (the engine-to-engine comparison
the README's "vs oracle" ratio is based on).

Usage: python3 tools/duck_bench.py <sfDir> <oracle_sql.json> [reps]

One 32-thread DuckDB process over views of <sfDir>/*.parquet; each
oracle runs `reps` times (default 3) after a warmup pass of the whole
basket; per-query best-of-reps and the basket total of those minima are
reported — mirroring graft.Bench's protocol (full evaluation, fetchall
as the noop sink). Dev tool only — NOT part of the shipped library.
"""
import sys, json, glob, os, time
import duckdb

sf_dir, oracle_path = sys.argv[1], sys.argv[2]
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
con = duckdb.connect()
con.execute("SET threads TO 32")
for f in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
oracles = json.load(open(oracle_path))
# warmup: one full pass (OS cache, codegen)
for name, sql in sorted(oracles.items()):
    try:
        con.execute(sql).fetchall()
    except Exception as e:
        print(f"WARM FAIL {name}: {e}", file=sys.stderr)
best = {}
for name, sql in sorted(oracles.items()):
    times = []
    for _ in range(reps):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception:
            times.append(float("nan")); break
        times.append(time.time() - t0)
    best[name] = min(times)
for name in sorted(best, key=lambda n: -best[n]):
    print(f"{best[name]:8.3f}  {name}")
print(json.dumps({"metric": "duckdb_oracle_basket", "unit": "sec",
                  "value": sum(best.values()), "queries": len(best)}))
# optional 4th arg: dump the per-query minima for tools/bench_ratio.py
if len(sys.argv) > 4:
    with open(sys.argv[4], "w") as f:
        json.dump({"metric": "duckdb_oracle_basket", "unit": "sec",
                   "sf": sf_dir, "reps": reps, "queries": best}, f)
