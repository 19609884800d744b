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

With --retime, flagged queries are re-run in ISOLATION (min-of-2 via
graft.BenchOne) and classified: a query whose isolated time lands back
inside thresh x reference is the transient class (suite contention /
RocksDB harness stall — the one-per-run pattern every round close has
triaged by hand); one that reproduces is code-attributable. The
verdict's PLANS note is then the tool's own output, and the isolated
times are annotated onto the steady entry ("retimes" field).

Usage:
  tools/bench_drift.py                 # BENCH_FULL.json vs latest steady
  tools/bench_drift.py --label r10     # pick the steady reference entry
  tools/bench_drift.py --vs-label r11  # steady-vs-steady comparison
  tools/bench_drift.py --retime        # isolation re-time flagged queries
"""
import argparse, json, re, statistics, subprocess, sys

ap = argparse.ArgumentParser()
ap.add_argument("--steady", default="BENCH_STEADY.json")
ap.add_argument("--full", default="BENCH_FULL.json")
ap.add_argument("--label", default=None,
                help="steady entry label to use as the reference")
ap.add_argument("--vs-label", default=None,
                help="compare this steady entry instead of BENCH_FULL")
ap.add_argument("--thresh", type=float, default=2.0)
ap.add_argument("--retime", action="store_true",
                help="re-run flagged queries in isolation and classify")
ap.add_argument("--sfdir", default="/root/testdata/sf0.1",
                help="sf dir for --retime runs")
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

if flagged and args.retime:
    names = [q for q, _, _ in flagged]
    print(f"[drift] isolation re-time (min-of-2, BenchOne): {names}")
    env = dict(__import__("os").environ, SPARK_GRAFT_CPUS="32")
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.BenchOne " + args.sfdir + " "
         + " ".join(names)],
        capture_output=True, text=True, env=env)
    times = {}
    for m in re.finditer(r"\[benchone\] (\S+) run\d: ([0-9.]+) s",
                         out.stdout):
        q, t = m.group(1), float(m.group(2))
        times[q] = min(times.get(q, t), t)
    retimes, persistent = {}, []
    for q in names:
        if q not in times:
            print(f"  RETIME {q}: no BenchOne result (run failed?)")
            persistent.append(q)
            continue
        iso = times[q]
        refm = ref["medians"].get(q)
        if not refm:
            # flagged via a non-steady reference path (or a zero
            # median): nothing to classify against — report raw only
            print(f"  RETIME {q}: isolated {iso:.2f}s (no steady ref)")
            retimes[q] = round(iso, 3)
            continue
        # the isolated run has its own (unknown) host window — compare
        # raw against the reference median, no suite-H scaling
        transient = iso <= args.thresh * refm
        retimes[q] = round(iso, 3)
        cls = "TRANSIENT (suite contention)" if transient \
            else "PERSISTENT (code-attributable)"
        print(f"  RETIME {q}: isolated {iso:.2f}s vs ref {refm:.2f}s -> {cls}")
        if not transient:
            persistent.append(q)
    # annotate the steady entry the comparison keyed on. Serialize
    # BEFORE touching the file and rename atomically: open(path, "w")
    # truncates first, so an exception mid-dump would otherwise corrupt
    # the benchmark history.
    ref["retimes"] = retimes
    payload = json.dumps(entries, indent=1)
    tmp = args.steady + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    __import__("os").replace(tmp, args.steady)
    note = (f"flagged {len(flagged)}, isolation re-timed: "
            + ", ".join(f"{q} {retimes.get(q, float('nan'))}s" for q in names)
            + ("; PERSISTENT: " + ", ".join(persistent) if persistent
               else "; all transient"))
    print(f"[drift] PLANS note: {note}")
    sys.exit(1 if persistent else 0)

sys.exit(1 if flagged else 0)
