#!/usr/bin/env python3
"""Per-query oracle-ratio gate: merge graft.Bench's per-query Spark
times with tools/duck_bench.py's per-query DuckDB times into one
artifact, and FLAG any query whose Spark/DuckDB ratio exceeds 2x
WITHOUT a checked-in adjudication.

The 2x engine-to-engine contract is enforced on the basket total by
the driver; this tool closes the per-query blind spot — a single
pathological query hiding under the basket's headroom. Every >2x row
must either carry an entry in tools/ratio_adjudications.json
(category: "floor" = sub-second scheduling-floor query, "replay" =
multi-commit MV serve the one-shot oracle doesn't pay, "real" = an
accepted, documented cost) or it is reported as NEW/unexplained and
the tool exits nonzero.

Usage:
  python3 tools/bench_ratio.py BENCH_FULL.json DUCK_FULL.json \
      [--adjudications tools/ratio_adjudications.json] [--out merged.json]

Writes the merged artifact (default: overwrite BENCH_FULL.json) with
added "duck_s" and "ratio" maps, and prints a ranked table of >2x
rows with their adjudications. Dev tool only — NOT part of the
shipped library.
"""
import sys, json, argparse

ap = argparse.ArgumentParser()
ap.add_argument("bench_json")
ap.add_argument("duck_json")
ap.add_argument("--adjudications", default="tools/ratio_adjudications.json")
ap.add_argument("--out", default=None)
ap.add_argument("--threshold", type=float, default=2.0)
args = ap.parse_args()

bench = json.load(open(args.bench_json))
duck = json.load(open(args.duck_json))["queries"]
try:
    adj = json.load(open(args.adjudications))
except FileNotFoundError:
    adj = {}

spark_q = bench["queries"]
duck_s, ratio = {}, {}
for name, s in spark_q.items():
    d = duck.get(name)
    if d is None:
        continue
    duck_s[name] = d
    ratio[name] = round(s / d, 2) if d > 0 else float("inf")

bench["duck_s"] = duck_s
bench["ratio"] = ratio
over = sorted((n for n, r in ratio.items() if r > args.threshold),
              key=lambda n: -ratio[n])
flags = [n for n in over if n not in adj]
bench["ratio_flags"] = flags

out = args.out or args.bench_json
with open(out, "w") as f:
    json.dump(bench, f)

print(f"{len(ratio)} queries merged; "
      f"{len(over)} over {args.threshold}x, {len(flags)} unexplained")
print(f"{'query':30s} {'spark_s':>8s} {'duck_s':>8s} {'ratio':>7s}  adjudication")
for n in over:
    a = adj.get(n, {})
    tag = f"{a.get('category', 'NEW/UNEXPLAINED')}: {a.get('why', '')}" \
        if n in adj else "NEW/UNEXPLAINED"
    print(f"{n:30s} {spark_q[n]:8.3f} {duck_s[n]:8.3f} {ratio[n]:7.2f}  {tag}")
sys.exit(1 if flags else 0)
