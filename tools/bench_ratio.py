#!/usr/bin/env python3
"""Per-query oracle-ratio gate: merge graft.Bench's per-query Spark
times with tools/duck_bench.py's per-query DuckDB times into one
artifact, and FLAG any query whose Spark/DuckDB ratio exceeds 2x
WITHOUT a checked-in adjudication.

The 2x engine-to-engine contract is enforced on the basket total by
the driver; this tool closes the per-query blind spot — a single
pathological query hiding under the basket's headroom. Two classes
auto-adjudicate (they are structural, not per-query facts):

- "floor": Spark best-of-N under FLOOR_S (1.5 s) — DuckDB answers
  sf0.1-scale oracles in single-digit milliseconds while Spark pays a
  ~0.1-0.3 s per-query scheduling/planning floor at local[32], so a
  sub-1.5 s absolute time with a huge ratio is fixed overhead, not a
  scale hazard (the floor does not grow with data).
- "replay": mv_* queries replay MULTI-COMMIT sink writes plus a serve
  (12-22 Spark jobs) where the oracle runs one batch SQL — the ratio
  prices the streaming machinery, not the operator.

Every OTHER >2x row must carry an entry in
tools/ratio_adjudications.json (category "real" with a why — an
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
    if d > 0:
        ratio[name] = round(s / d, 2)
    else:
        # a 0 duck time would yield float('inf'), which json.dump
        # emits as bare Infinity — invalid strict JSON that breaks
        # downstream parsers. Record null and warn instead.
        print(f"WARN {name}: duck time {d} <= 0, ratio recorded as null")
        ratio[name] = None

FLOOR_S = 1.5
# jobs-aware floor: a query that fans into many Spark jobs (replayed
# sink commits, iterative loops, multi-stage pipelines) pays the
# ~0.1-0.3 s/job scheduling+planning cost at local[32] that many
# times; measured s/job across the borderline set is 0.075-0.26. Auto-
# adjudicate "floor" up to PER_JOB_S per job, hard-capped at
# JOB_FLOOR_CAP_S so a genuinely slow query can't hide behind a high
# job count.
PER_JOB_S = 0.15
JOB_FLOOR_CAP_S = 3.0
jobs_map = bench.get("jobs", {})
# replay auto-adjudication cap: mv_* rows price multi-commit sink
# machinery (~10-25x vs one batch SQL), but a genuine regression in a
# serve path must still flag — beyond this bound an mv_ row needs an
# explicit adjudication entry or the jobs-aware floor.
REPLAY_MAX_RATIO = 25.0

def adjudicate(n):
    if n in adj:
        return adj[n].get("category", "real"), adj[n].get("why", "")
    floor = max(FLOOR_S,
                min(JOB_FLOOR_CAP_S, PER_JOB_S * jobs_map.get(n, 0)))
    if spark_q[n] <= floor:
        return "floor", (f"spark abs {spark_q[n]:.2f}s <= "
                         f"{floor:.2f}s scheduling floor "
                         f"({jobs_map.get(n, 0)} jobs)")
    if n.startswith("mv_") and (ratio[n] or 0) <= REPLAY_MAX_RATIO:
        return "replay", "multi-commit sink replay + serve vs one-shot SQL"
    return None, None

bench["duck_s"] = duck_s
bench["ratio"] = ratio
over = sorted((n for n, r in ratio.items()
               if r is not None and r > args.threshold),
              key=lambda n: -ratio[n])
verdicts = {n: adjudicate(n) for n in over}
flags = [n for n in over if verdicts[n][0] is None]
bench["ratio_flags"] = flags
bench["ratio_adjudications"] = {
    n: v[0] for n, v in verdicts.items() if v[0] is not None}

out = args.out or args.bench_json
with open(out, "w") as f:
    json.dump(bench, f)

cats = {}
for n in over:
    cats[verdicts[n][0] or "NEW"] = cats.get(verdicts[n][0] or "NEW", 0) + 1
# The artifact's own box-noise measurement (5 post-basket reps of a
# 1-job control query): its median IS the measured scheduling floor of
# the rep that produced these numbers — context for judging spikes.
noise = bench.get("noise_control") or []
noise_vals = sorted(t for t in noise if isinstance(t, (int, float)))
noise_med = noise_vals[len(noise_vals) // 2] if noise_vals else None
noise_txt = (f"noise_control median {noise_med:.3f}s" if noise_med is not None
             else "NO noise_control series in artifact")
print(f"{len(ratio)} queries merged; {len(over)} over {args.threshold}x "
      f"({', '.join(f'{k}: {v}' for k, v in sorted(cats.items()))}); "
      f"{len(flags)} unexplained; {noise_txt}")
print(f"{'query':30s} {'spark_s':>8s} {'duck_s':>8s} {'ratio':>7s}  adjudication")
for n in over:
    cat, why = verdicts[n]
    if cat == "floor":
        continue  # structural; printed compactly below, not as 150 table rows
    tag = f"{cat}: {why}" if cat else "NEW/UNEXPLAINED"
    print(f"{n:30s} {spark_q[n]:8.3f} {duck_s[n]:8.3f} {ratio[n]:7.2f}  {tag}")
# Auto-floor visibility: every row the relaxed gate absorbed, with its
# computed floor, so a genuine sub-floor regression on a many-job query
# is eyeball-able instead of invisible. Sorted by spark time descending
# (the rows nearest their floor are the ones worth a second look).
floor_rows = sorted((n for n in over if verdicts[n][0] == "floor"),
                    key=lambda n: -spark_q[n])
if floor_rows:
    def floor_of(n):
        return max(FLOOR_S,
                   min(JOB_FLOOR_CAP_S, PER_JOB_S * jobs_map.get(n, 0)))
    print(f"auto-floor absorbed {len(floor_rows)} rows "
          f"(name spark_s/floor_s jobs, spark-desc):")
    items = [f"{n} {spark_q[n]:.2f}/{floor_of(n):.2f} "
             f"j{jobs_map.get(n, 0)}" for n in floor_rows]
    for i in range(0, len(items), 4):
        print("  " + "  |  ".join(items[i:i + 4]))
sys.exit(1 if flags else 0)
