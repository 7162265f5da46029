#!/usr/bin/env python3
"""Per-query bench regression gate (dev-side, like validate.py).

Compares a fresh `bench_out.json` against the frozen per-query baseline
(`BENCH_BASELINE.json` — the r8 clean-host run, the first one measured
under the honest toRdd forcing protocol) and FLAGS queries that are both
 >RATIO x their baseline (default 1.5) and >FLOOR seconds slower
(default 0.30 s — sub-second timer noise on a shared VM is not a
regression). Prints flagged regressions, the biggest improvements, and
new/missing queries; exits 1 iff anything is flagged, so it can gate.

Totals on this host swing 50-90 s with load (see the verify skill) —
that is exactly why this compares PER-QUERY, and why the floor exists.
When a protocol change or a real plan change moves a query's honest
cost, re-freeze the baseline in the same commit that explains it.

Usage: tools/bench_compare.py [bench_out.json] [baseline.json]
                              [--ratio R] [--floor S]
"""
import argparse, json, sys

ap = argparse.ArgumentParser(description=__doc__)
ap.add_argument("cur_path", nargs="?", default="bench_out.json")
ap.add_argument("base_path", nargs="?", default="BENCH_BASELINE.json")
ap.add_argument("--ratio", type=float, default=1.5)
ap.add_argument("--floor", type=float, default=0.30)
ns = ap.parse_args()
cur_path, base_path = ns.cur_path, ns.base_path
ratio, floor = ns.ratio, ns.floor

cur = json.load(open(cur_path))
base = json.load(open(base_path))
cq, bq = cur["queries"], base["queries"]

flagged, improved, checked = [], [], 0
for name in sorted(cq):
    if name not in bq:
        continue
    c, b = cq[name], bq[name]
    if c < 0 or b < 0:
        continue  # -1 = failed run; the correctness gate owns those
    checked += 1
    if c > b * ratio and c - b > floor:
        flagged.append((name, b, c, c / b))
    elif b > c * ratio and b - c > floor:
        improved.append((name, b, c, c / b))

new = sorted(set(cq) - set(bq))
missing = sorted(set(bq) - set(cq))

# r11 outlier guard: Bench re-runs any query measured >5x its baseline
# and reports both numbers; surface them here so a stall is legible in
# the gate output too (the min already rides in cur["queries"]).
for name, s in sorted(cur.get("stall_suspects", {}).items()):
    print(f"  STALL-SUSPECT {name}: observed {s['observed']:.2f}s, "
          f"re-run {s['rerun']:.2f}s (min reported)")

print(f"baseline {base_path}: {base.get('value')}s / {len(bq)} queries")
print(f"current  {cur_path}: {cur.get('value')}s / {len(cq)} queries")
print(f"compared {checked} common queries at ratio>{ratio} floor>{floor}s")
if new:
    print(f"new (not in baseline, informational): {', '.join(new)}")
if missing:
    print(f"MISSING from current run: {', '.join(missing)}")
for name, b, c, r in sorted(improved, key=lambda t: t[3]):
    print(f"  improved   {name}: {b:.2f}s -> {c:.2f}s ({r:.2f}x)")
for name, b, c, r in sorted(flagged, key=lambda t: -t[3]):
    print(f"  REGRESSION {name}: {b:.2f}s -> {c:.2f}s ({r:.2f}x)")
if flagged or missing:
    print(f"FAIL: {len(flagged)} regression(s), {len(missing)} missing")
    sys.exit(1)
print("OK: no per-query regression")
