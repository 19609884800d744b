#!/usr/bin/env python3
"""Normalized bench-drift attribution (VERDICT r10 'Next round' #4).

The shared host throttles in 2-5x CPU-burst windows, so raw per-query
ratios between rounds mix code regressions with host noise. This tool
separates them mechanically:

  1. ratio(q) = current run seconds / reference median seconds
  2. host factor H = median of ratio(q) over the COMMON query set
     (dozens of unchanged queries make the median a robust host probe)
  3. normalized(q) = ratio(q) / H
  4. flag only normalized(q) > THRESH (default 2.0): a query that got
     slower than the run's own host window explains.

Reference medians come from the latest BENCH_STEADY.json entry (or a
--label'd one); the current run from BENCH_FULL.json's min-of-2 map (or
a second steady entry via --vs-label). Output: one summary line for
PLANS.md plus a table of flagged queries; exit 1 if anything flagged.

Usage:
  tools/bench_drift.py                 # BENCH_FULL.json vs latest steady
  tools/bench_drift.py --label r10     # pick the steady reference entry
  tools/bench_drift.py --vs-label r11  # steady-vs-steady comparison
"""
import argparse, json, statistics, sys

ap = argparse.ArgumentParser()
ap.add_argument("--steady", default="BENCH_STEADY.json")
ap.add_argument("--full", default="BENCH_FULL.json")
ap.add_argument("--label", default=None,
                help="steady entry label to use as the reference")
ap.add_argument("--vs-label", default=None,
                help="compare this steady entry instead of BENCH_FULL")
ap.add_argument("--thresh", type=float, default=2.0)
args = ap.parse_args()

entries = json.load(open(args.steady))
if args.label:
    ref = next(e for e in entries if e["label"] == args.label)
else:
    ref = entries[-2] if args.vs_label and entries[-1]["label"] == args.vs_label \
        else entries[-1]

if args.vs_label:
    cur_e = next(e for e in entries if e["label"] == args.vs_label)
    cur, cur_name = cur_e["medians"], f"steady[{cur_e['label']}]"
else:
    cur = json.load(open(args.full))["queries"]
    cur_name = args.full

common = sorted(set(cur) & set(ref["medians"]))
if len(common) < 5:
    print(f"[drift] only {len(common)} common queries — not attributable")
    sys.exit(0)

ratios = {q: cur[q] / ref["medians"][q] for q in common
          if ref["medians"][q] > 0}
H = statistics.median(ratios.values())
flagged = sorted(((q, r / H, r) for q, r in ratios.items() if r / H > args.thresh),
                 key=lambda t: -t[1])

print(f"[drift] {cur_name} vs steady[{ref['label']}]: {len(common)} common, "
      f"host factor x{H:.2f} (median ratio), "
      f"{len(flagged)} normalized >{args.thresh}x outliers")
for q, norm, raw in flagged:
    print(f"  FLAG {q}: raw x{raw:.2f}, normalized x{norm:.2f} "
          f"({ref['medians'][q]:.2f}s -> {cur[q]:.2f}s)")
if not flagged:
    print("[drift] all per-query drift within the run's host window — "
          "no code-attributable regressions")
sys.exit(1 if flagged else 0)
