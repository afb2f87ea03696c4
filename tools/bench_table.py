#!/usr/bin/env python3
"""Build the BASELINE.md per-query variance table from N saved
BENCH_FULL.json maps, and (with --record) emit the 2-of-3 adjudication
against a prior round's record runs (dev-time harness; driver-side python
is fine here).

Usage:
  python3 tools/bench_table.py run1.json run2.json [run3.json ...]
      [--record rec1.json rec2.json rec3.json]

Without --record: prints the markdown variance table (mean/sigma/runs per
query, slowest first) — paste into BASELINE.md.

With --record: additionally applies the repo's 2-of-3 reading rule
(BASELINE.md): a per-query movement vs the record mean is REAL only if it
reproduces in >= 2 of the current runs beyond mean + 2*sigma (sigma floored
at max(0.05 s, 10% of mean) so zero-variance records don't flag noise);
1-of-N excursions are adjudicated as environment noise. Emits one table of
flagged queries with the verdict per row, plus the run-total comparison.
"""
import json
import statistics
import sys


def load_md_runs(path):
    """Reconstruct per-run maps from a BASELINE.md-style variance table
    (the FIRST `| query | mean_s | sigma_s | runs |` table in the file;
    the `runs` column is `a / b / c`). Lets --record point at BASELINE.md
    when the raw BENCH_FULL maps of the record round weren't archived."""
    runs = []
    in_table = False
    for line in open(path):
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) == 4 and cells[0] == "query" and cells[3] == "runs":
            if in_table:
                break  # only the first table — later ones are superseded
            in_table = True
            continue
        if not in_table:
            continue
        if len(cells) != 4 or cells[0].startswith("-"):
            if line.strip().startswith("|"):
                continue
            if runs:
                break  # table ended
            continue
        vals = [float(v) for v in cells[3].split("/")]
        while len(runs) < len(vals):
            runs.append({})
        for i, v in enumerate(vals):
            runs[i][cells[0]] = v
    return runs


def load_runs(paths):
    runs = []
    for p in paths:
        if p.endswith(".md"):
            runs.extend(load_md_runs(p))
            continue
        d = json.load(open(p))
        runs.append(d["queries"] if "queries" in d else d)
    return runs


def table(runs):
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


def adjudicate(runs, recs):
    rec_stats = {}
    names = sorted(set().union(*[set(r) for r in recs]))
    for n in names:
        vals = [r[n] for r in recs if n in r and r[n] >= 0]
        if not vals:
            continue
        mean = statistics.mean(vals)
        sd = statistics.stdev(vals) if len(vals) >= 2 else 0.0
        sd = max(sd, 0.05, 0.10 * mean)  # floor: see module docstring
        rec_stats[n] = (mean, sd)
    need = 2  # the 2-of-3 rule: >= 2 runs must reproduce the excursion
    flagged = []
    for n, (mean, sd) in sorted(rec_stats.items()):
        vals = [r[n] for r in runs if n in r and r[n] >= 0]
        if not vals:
            continue
        hi = sum(1 for v in vals if v > mean + 2 * sd)
        lo = sum(1 for v in vals if v < mean - 2 * sd)
        if hi == 0 and lo == 0:
            continue
        if hi >= need:
            verdict = "REGRESSION (reproduced %d/%d)" % (hi, len(vals))
        elif lo >= need:
            verdict = "improved (reproduced %d/%d)" % (lo, len(vals))
        else:
            verdict = "noise (1-of-%d excursion)" % len(vals)
        rv = " / ".join(f"{v:.2f}" for v in vals)
        flagged.append((max(vals) / mean if mean > 0 else 0.0,
                        n, mean, sd, rv, verdict))
    flagged.sort(reverse=True)
    print()
    print("## 2-of-3 adjudication vs record")
    print()
    rec_tot = statistics.mean(
        [sum(v for v in r.values() if v >= 0) for r in recs])
    run_tots = [sum(v for v in r.values() if v >= 0) for r in runs]
    print("record total (mean): %.2f s; current totals: %s" %
          (rec_tot, " / ".join(f"{t:.2f}" for t in run_tots)))
    print()
    if not flagged:
        print("No per-query excursions beyond mean + 2*sigma — clean.")
        return
    print("| query | record mean_s | sigma_s | current runs | verdict |")
    print("|---|---|---|---|---|")
    for _, n, mean, sd, rv, verdict in flagged:
        print(f"| {n} | {mean:.2f} | {sd:.2f} | {rv} | {verdict} |")
    real = [f for f in flagged if f[5].startswith("REGRESSION")]
    print()
    print("%d flagged, %d adjudicated REAL regressions, %d noise/improved."
          % (len(flagged), len(real), len(flagged) - len(real)))


def main(argv):
    if "--record" in argv:
        i = argv.index("--record")
        run_paths, rec_paths = argv[:i], argv[i + 1:]
    else:
        run_paths, rec_paths = argv, []
    runs = load_runs(run_paths)
    if len(runs) >= 2:
        table(runs)
    if rec_paths:
        adjudicate(runs, load_runs(rec_paths))


if __name__ == "__main__":
    main(sys.argv[1:])
