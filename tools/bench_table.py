#!/usr/bin/env python3
"""Build the BASELINE.md per-query variance table from N saved
BENCH_FULL.json maps (dev-time harness; driver-side python is fine here).

Usage: python3 tools/bench_table.py full1.json full2.json [full3.json ...]
Prints a markdown table (mean/sigma/runs per query, slowest first).
"""
import json
import statistics
import sys


def main(paths):
    runs = []
    for p in paths:
        d = json.load(open(p))
        runs.append(d["queries"] if "queries" in d else d)
    names = sorted(set().union(*[set(r) for r in runs]))
    rows = []
    for n in names:
        vals = [r[n] for r in runs if n in r and r[n] >= 0]
        if len(vals) < 2:
            continue
        mean = statistics.mean(vals)
        sd = statistics.stdev(vals)
        rows.append((mean, sd, n, vals))
    rows.sort(reverse=True)
    print("| query | mean_s | sigma_s | runs |")
    print("|---|---|---|---|")
    for mean, sd, n, vals in rows:
        rv = " / ".join(f"{v:.2f}" for v in vals)
        print(f"| {n} | {mean:.2f} | {sd:.2f} | {rv} |")


if __name__ == "__main__":
    main(sys.argv[1:])
