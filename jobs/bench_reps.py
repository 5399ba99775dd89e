"""Median-of-reps headline bench (VERDICT r3 item 3).

Runs bench.py REPS times, each in a fresh subprocess/JVM (same convention as
bench_scaling.py: fresh JVM per measurement so nothing leaks across reps),
and reports per-query MEDIAN + robust CV. Purpose: separate plan changes
from the documented ~3x shuffle-heavy variance band on this co-tenant box —
a query is only "regressed" if its MEDIAN moved, not one polluted rep.

Usage: python jobs/bench_reps.py [--reps 3] [--out BENCH_MEDIANS.json]
Prints one JSON line; per-rep raw numbers included.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_once(repo: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True,
        text=True,
        timeout=2400,
        cwd=repo,
        env=dict(os.environ),
    )
    for line in reversed(out.stdout.replace("\r", "\n").splitlines()):
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise RuntimeError(f"bench.py produced no JSON:\n{out.stderr[-2000:]}")


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    reps = 3
    out_path = None
    argv = sys.argv
    if "--reps" in argv:
        reps = int(argv[argv.index("--reps") + 1])
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]

    runs = []
    for i in range(reps):
        r = run_once(repo)
        runs.append(r)
        print(
            f"rep {i}: wall {r['value']}s "
            + " ".join(f"{k}={v}" for k, v in sorted(r["queries"].items())),
            file=sys.stderr,
        )

    queries = sorted(runs[0]["queries"])
    med = {}
    cv = {}
    for q in queries:
        xs = [r["queries"][q] for r in runs]
        m = statistics.median(xs)
        med[q] = round(m, 3)
        cv[q] = round(statistics.pstdev(xs) / statistics.mean(xs), 4) if len(xs) > 1 else 0.0
    walls = [r["value"] for r in runs]
    # steady-state estimator, consistent with bench.py's derived block: pool
    # every rep's post-warmup ANN walls (walls[1:] — the first in-JVM rep
    # carries the 32-worker Python spin-up) and take median-of-pool. The
    # one-shot queries_median ratio would measure worker spin-up, not the
    # index (the round-6 accounting correction).
    ann_speedup = None
    bpool = [
        w
        for r in runs
        for w in r.get("derived", {}).get("ann_brute_walls", [])[1:]
    ]
    tpool = [
        w
        for r in runs
        for w in r.get("derived", {}).get("ann_probe_walls", [])[1:]
    ]
    if bpool and tpool:
        ann_speedup = round(
            statistics.median(bpool) / statistics.median(tpool), 2
        )
    result = {
        "metric": "headline_suite_wall_median",
        "value": round(statistics.median(walls), 3),
        "unit": "sec",
        "reps": reps,
        "queries_median": med,
        "queries_cv": cv,
        "wall_per_rep": walls,
        "queries_per_rep": [r["queries"] for r in runs],
        "ann_speedup_vs_brute_median": ann_speedup,
        "derived_last_rep": runs[-1].get("derived", {}),
        "sf": runs[0].get("sf"),
        "cpus": runs[0].get("cpus"),
        "method": "median of %d fresh-JVM bench.py runs; CV = pstdev/mean "
        "across reps" % reps,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
