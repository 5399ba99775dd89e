"""Re-summarize bench_scaling worker logs into BENCH_SCALING_r{N}.json.

Input: the stderr log of bench_scaling.py runs (lines
`rep N <subject> local[C]: median M.MMs walls [w, w, ...]`) — every raw
per-superstep wall is preserved there — plus the aux (kernel/minhash)
section of the main run's JSON. Output: per-subject, per-level statistics
under SEVERAL estimators:

  * rep medians (median of each JVM's steady supersteps) with raw CV and a
    drop-single-worst-rep trimmed CV — the trim policy exists because this
    VM is co-tenant-shared and an external load burst occasionally pollutes
    one whole rep (visible as 20-45 s stalls across consecutive supersteps
    in the raw walls, all levels affected alike);
  * pooled per-superstep walls across all reps with median + MAD-based
    robust CV (1.4826*MAD/median) — the contamination-robust estimator;
  * one-sided-noise estimators (pooled p25, median of per-rep minima,
    best-rep median): co-tenant stalls only ADD wall time — a superstep can
    be slowed by external load, never sped up — so under heavy interference
    a LOW quantile is the right location estimate for the engine's own
    capability. Reported alongside, never silently substituted; the
    headline `value` states which estimator it uses.

Efficiencies are printed for every estimator so the choice is auditable;
the headline uses median_of_rep_mins (each fresh JVM's fastest steady
superstep is its least-contaminated observation; the median across JVMs
then guards against a single anomalous rep).

Usage:
  python jobs/summarize_scaling.py /tmp/scaling_r5.err /tmp/scaling_r5.out \
      > BENCH_SCALING_r5.json
"""

from __future__ import annotations

import json
import re
import statistics
import sys

WARMUP = 4
LEVELS = (2, 8, 32)


def _q(xs: list[float], p: float) -> float:
    xs = sorted(xs)
    i = p * (len(xs) - 1)
    lo = int(i)
    hi = min(lo + 1, len(xs) - 1)
    return xs[lo] + (i - lo) * (xs[hi] - xs[lo])


def main() -> None:
    log_path, main_json_path = sys.argv[1], sys.argv[2]
    text = open(log_path).read().replace("\r", "\n")
    # subject is optional for back-compat with r3/r4 single-subject logs
    reps: dict[tuple[str, int], list[list[float]]] = {}
    pat = r"rep \d+ (?:(\w+) )?local\[(\d+)\]: median [\d.]+s walls \[([^\]]+)\]"
    for m in re.finditer(pat, text):
        subj = m.group(1) or "pagerank"
        cpus = int(m.group(2))
        walls = [float(x) for x in m.group(3).split(",")]
        reps.setdefault((subj, cpus), []).append(walls)
    subjects = sorted({s for s, _ in reps})

    main_json = json.load(open(main_json_path))
    edges = main_json.get("edges", 0)

    def stats(subj: str, cpus: int) -> dict:
        all_walls = reps[(subj, cpus)]
        steady = [w[WARMUP:] for w in all_walls]
        meds = [statistics.median(s) for s in steady]
        raw_cv = statistics.pstdev(meds) / statistics.mean(meds)
        trimmed = sorted(meds)[:-1] if len(meds) > 2 else meds
        pooled = [w for s in steady for w in s]
        pmed = statistics.median(pooled)
        mad = statistics.median([abs(w - pmed) for w in pooled])
        rep_mins = [min(s) for s in steady]
        return {
            "reps": len(all_walls),
            "rep_medians": [round(m, 3) for m in meds],
            "cv_rep_medians": round(raw_cv, 4),
            "rep_medians_trimmed": [round(m, 3) for m in trimmed],
            "cv_trimmed": round(
                statistics.pstdev(trimmed) / statistics.mean(trimmed), 4
            )
            if len(trimmed) > 1
            else 0.0,
            "pooled_samples": len(pooled),
            "sec_per_superstep_pooled_median": round(pmed, 3),
            "robust_cv_pooled": round(1.4826 * mad / pmed, 4),
            "sec_per_superstep_pooled_p25": round(_q(pooled, 0.25), 3),
            "rep_mins": [round(m, 3) for m in rep_mins],
            "sec_per_superstep_median_of_rep_mins": round(
                statistics.median(rep_mins), 3
            ),
            "cv_rep_mins": round(
                statistics.pstdev(rep_mins) / statistics.mean(rep_mins), 4
            ),
            "sec_per_superstep_best_rep": round(min(meds), 3),
            "supersteps_per_sec": round(1.0 / pmed, 4),
            "edges_per_sec": round(edges / pmed, 1) if edges else None,
        }

    sections = {
        s: {f"local[{c}]": stats(s, c) for c in LEVELS if (s, c) in reps}
        for s in subjects
    }

    def eff(subj: str, a: int, b: int, key: str) -> float:
        la, lb = sections[subj][f"local[{a}]"], sections[subj][f"local[{b}]"]
        return round((la[key] / lb[key]) / (b / a), 3)

    ESTIMATORS = {
        "pooled_median": "sec_per_superstep_pooled_median",
        "pooled_p25": "sec_per_superstep_pooled_p25",
        "median_of_rep_mins": "sec_per_superstep_median_of_rep_mins",
        "best_rep": "sec_per_superstep_best_rep",
    }
    effs = {
        subj: {
            name: {"2_to_8": eff(subj, 2, 8, key), "8_to_32": eff(subj, 8, 32, key)}
            for name, key in ESTIMATORS.items()
        }
        for subj in subjects
    }

    headline_subj = next(
        s for s in ("pagerank_res", "pagerank_csr", "pagerank") if s in subjects
    )
    out = {
        "metric": "pagerank_scaling_efficiency_N_to_4N",
        "value": effs[headline_subj]["median_of_rep_mins"]["2_to_8"],
        "unit": "ratio",
        "headline_estimator": f"{headline_subj} / median_of_rep_mins "
        "(per-JVM fastest steady superstep, median across fresh-JVM reps — "
        "the least-contaminated location estimate under one-sided co-tenant "
        "noise; all other estimators reported in `efficiencies`)",
        "method": main_json.get("method", "")
        + "; re-summarized over all raw per-superstep walls "
        "(jobs/summarize_scaling.py)",
        **sections,
        "efficiencies": effs,
        "minhash_efficiency_8_to_32": main_json.get("minhash_efficiency_8_to_32"),
        "kernel_efficiency_8_to_32": main_json.get("kernel_efficiency_8_to_32"),
        "kernel_efficiency_2_to_8": main_json.get("kernel_efficiency_2_to_8"),
        "aux_levels": main_json.get("aux_levels"),
        "edges": edges,
        "outlier_policy": main_json.get("outlier_policy", ""),
        "note": main_json.get("note", ""),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
