"""Rebuild a BENCH_SCALING artifact from a bench_scaling.py stderr log.

bench_scaling.py prints one self-contained line per worker rep (subject,
level, rep median, busy/steal/burst contention samples, every raw wall)
BEFORE the end-of-run JSON assembly, so a crash or interrupt after the rep
loop loses no measurement data. This tool re-applies the round-6 screening
policy (identical constants, imported from bench_scaling) to such a log
and emits the same JSON shape (minus the aux section, which runs after the
rep loop; pass --aux-from to graft it from another artifact).

Usage: python jobs/rebuild_scaling_from_log.py /tmp/scaling.err [--edges N]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scaling import _contended  # single source of truth for the policy

LINE = re.compile(
    r"rep (\d+) (\w+) local\[(\d+)\]: median ([\d.]+)s busy ([\d.]+) "
    r"steal ([\d.]+) burst ([\d.]+)( CONTENDED)? walls (\[.*\])"
)


def main() -> None:
    log = sys.argv[1]
    edges = 0
    if "--edges" in sys.argv:
        edges = int(sys.argv[sys.argv.index("--edges") + 1])

    medians: dict = {}
    raw_walls: dict = {}
    contention: dict = {}
    for line in open(log):
        m = LINE.search(line)
        if not m:
            continue
        subj, c = m.group(2), int(m.group(3))
        med, busy, steal, burst = (
            float(m.group(4)),
            float(m.group(5)),
            float(m.group(6)),
            float(m.group(7)),
        )
        walls = json.loads(m.group(9))
        medians.setdefault(subj, {}).setdefault(c, []).append(med)
        raw_walls.setdefault(subj, {}).setdefault(c, []).append(walls)
        # re-derive the tag from the recorded signals via the SAME policy
        # function the live harness uses (the log's own CONTENDED marker is
        # kept for cross-checking)
        bad = _contended(c, busy, steal, burst)
        assert bad == bool(m.group(8)), (line, bad)
        contention.setdefault(subj, {}).setdefault(c, []).append(
            {
                "busy_cores": busy,
                "steal_cores": steal,
                "burst_ratio": burst,
                "contended": bad,
            }
        )

    subjects = sorted(medians)
    levels = sorted({c for s in subjects for c in medians[s]})

    def screened(subj, c):
        meds = medians[subj][c]
        keep = [
            m
            for m, t in zip(meds, contention[subj][c])
            if not t["contended"]
        ]
        if len(keep) >= 3:
            return keep, "screened"
        trimmed = sorted(meds)[:-1] if len(meds) > 2 else meds
        return trimmed, "trim1-fallback"

    def level_stats(subj, c):
        meds = medians[subj][c]
        keep, how = screened(subj, c)
        smed = statistics.median(keep)
        return {
            "rep_medians_screened": [round(m, 3) for m in keep],
            "screen_estimator": how,
            "cv_screened": round(
                statistics.pstdev(keep) / statistics.mean(keep), 4
            )
            if len(keep) > 1
            else 0.0,
            "sec_per_superstep_median_screened": round(smed, 3),
            "sec_per_superstep_median": round(statistics.median(meds), 3),
            "rep_medians": [round(m, 3) for m in meds],
            "cv": round(statistics.pstdev(meds) / statistics.mean(meds), 4)
            if len(meds) > 1
            else 0.0,
            "reps_screened_out": len(meds) - len(keep),
            "contention": contention[subj][c],
            "supersteps_per_sec": round(1.0 / smed, 4),
            "edges_per_sec": round(edges / smed, 1) if edges else None,
        }

    def eff(subj, a, b):
        ma = statistics.median(screened(subj, a)[0])
        mb = statistics.median(screened(subj, b)[0])
        return round((ma / mb) / (b / a), 3)

    headline = next(
        s
        for s in ("pagerank_res", "pagerank_csr", "pagerank")
        if s in subjects
    )
    reps = max(len(medians[s][c]) for s in subjects for c in medians[s])
    result = {
        "metric": "pagerank_scaling_efficiency_N_to_4N",
        "value": eff(headline, 2, 8),
        "unit": "ratio",
        "headline_subject": headline,
        "rebuilt_from_log": os.path.basename(log),
        "method": "steady-state sec/superstep, per-superstep jobs, warmup-4 "
        "dropped, median of %d interleaved fresh-JVM reps per level under "
        "the round-6 contention screen; rebuilt from the harness stderr log "
        "(every rep line is self-contained) — identical policy constants "
        "via bench_scaling._contended" % reps,
    }
    for s in subjects:
        result[s] = {f"local[{c}]": level_stats(s, c) for c in medians[s]}
        if 2 in medians[s] and 8 in medians[s]:
            result[f"{s}_efficiency_2_to_8"] = eff(s, 2, 8)
        if 8 in medians[s] and 32 in medians[s]:
            result[f"{s}_efficiency_8_to_32"] = eff(s, 8, 32)
    result |= {
        "edges": edges,
        "raw_walls": {
            s: {f"local[{c}]": raw_walls[s][c] for c in raw_walls[s]}
            for s in subjects
        },
        "outlier_policy": "round-6 contention screen, stated in "
        "bench_scaling.py BEFORE this run: a rep is CONTENDED iff "
        "steal_cores > 1.0 OR busy_cores > level + 8 OR burst_ratio > 3.0 "
        "(max/median of its own steady supersteps). Estimator = median "
        "over non-contended reps when >= 3 survive, else drop-single-worst "
        "trim (screen_estimator names which applied). Every raw wall, rep "
        "median and contention sample is in this file for audit",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
