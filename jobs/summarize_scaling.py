"""Re-summarize bench_scaling worker logs into BENCH_SCALING_r3.json.

Input: the stderr log of bench_scaling.py runs (lines
`rep N local[C]: median M.MMs walls [w, w, ...]`) — every raw per-superstep
wall is preserved there — plus the aux (kernel/minhash) section of the main
run's JSON. Output: per-level statistics under BOTH estimators:

  * rep medians (median of each JVM's steady supersteps) with raw CV and a
    drop-single-worst-rep trimmed CV — the trim policy exists because this
    VM is co-tenant-shared and an external load burst occasionally pollutes
    one whole rep (visible as 30-80 s stalls across consecutive supersteps
    in the raw walls, all levels affected alike);
  * pooled per-superstep walls across all reps with median + MAD-based
    robust CV (1.4826*MAD/median) — the contamination-robust estimator.

Efficiencies use the pooled medians. All raw rep medians and pooled sample
counts ship in the JSON so the trim/pool choices are auditable.

Usage: python jobs/summarize_scaling.py /tmp/bs3.log /tmp/bs3_main.json > BENCH_SCALING_r3.json
"""

from __future__ import annotations

import json
import re
import statistics
import sys

WARMUP = 4


def main() -> None:
    log_path, main_json_path = sys.argv[1], sys.argv[2]
    text = open(log_path).read().replace("\r", "\n")
    reps: dict[int, list[list[float]]] = {2: [], 8: [], 32: []}
    for m in re.finditer(r"rep \d+ local\[(\d+)\]: median [\d.]+s walls \[([^\]]+)\]", text):
        cpus = int(m.group(1))
        walls = [float(x) for x in m.group(2).split(",")]
        reps[cpus].append(walls)

    main = json.load(open(main_json_path))
    edges = main.get("edges", 0)

    def stats(cpus: int) -> dict:
        all_walls = reps[cpus]
        meds = [statistics.median(w[WARMUP:]) for w in all_walls]
        raw_cv = statistics.pstdev(meds) / statistics.mean(meds)
        trimmed = sorted(meds)[:-1] if len(meds) > 2 else meds
        cv_t = statistics.pstdev(trimmed) / statistics.mean(trimmed)
        pooled = [w for ws in all_walls for w in ws[WARMUP:]]
        pmed = statistics.median(pooled)
        mad = statistics.median([abs(w - pmed) for w in pooled])
        robust_cv = 1.4826 * mad / pmed
        # One-sided-contamination estimators: co-tenant stalls only ADD wall
        # time (a superstep can be slowed by external load, never sped up),
        # so under heavy interference a LOW quantile is the right location
        # estimate for the engine's capability — same rationale as the aux
        # workers' best-of-3. Reported alongside, never silently substituted.
        p25 = statistics.quantiles(pooled, n=4)[0] if len(pooled) > 3 else pmed
        best_rep = min(meds)
        return {
            "reps": len(all_walls),
            "rep_medians": [round(m, 3) for m in meds],
            "cv_rep_medians": round(raw_cv, 4),
            "rep_medians_trimmed": [round(m, 3) for m in trimmed],
            "cv_trimmed": round(statistics.pstdev(trimmed) / statistics.mean(trimmed), 4)
            if len(trimmed) > 1
            else 0.0,
            "pooled_samples": len(pooled),
            "sec_per_superstep_pooled_median": round(pmed, 3),
            "robust_cv_pooled": round(robust_cv, 4),
            "sec_per_superstep_pooled_p25": round(p25, 3),
            "sec_per_superstep_best_rep": round(best_rep, 3),
            "supersteps_per_sec": round(1.0 / pmed, 4),
            "edges_per_sec": round(edges / pmed, 1) if edges else None,
        }

    levels = {c: stats(c) for c in (2, 8, 32)}

    def eff(a: int, b: int, key: str = "sec_per_superstep_pooled_median") -> float:
        return round((levels[a][key] / levels[b][key]) / (b / a), 3)

    out = {
        "metric": "pagerank_scaling_efficiency_N_to_4N",
        "value": eff(2, 8),
        "unit": "ratio",
        "method": main.get("method", "") + "; re-summarized over all reps with "
        "pooled per-superstep median + MAD robust CV, plus one-sided-noise "
        "p25/best-rep estimators (jobs/summarize_scaling.py)",
        "pagerank": {f"local[{c}]": levels[c] for c in (2, 8, 32)},
        "pagerank_efficiency_2_to_8": eff(2, 8),
        "pagerank_efficiency_8_to_32": eff(8, 32),
        "pagerank_efficiency_2_to_8_p25": eff(2, 8, "sec_per_superstep_pooled_p25"),
        "pagerank_efficiency_8_to_32_p25": eff(8, 32, "sec_per_superstep_pooled_p25"),
        "pagerank_efficiency_2_to_8_best_rep": eff(2, 8, "sec_per_superstep_best_rep"),
        "pagerank_efficiency_8_to_32_best_rep": eff(8, 32, "sec_per_superstep_best_rep"),
        "minhash_efficiency_8_to_32": main.get("minhash_efficiency_8_to_32"),
        "kernel_efficiency_8_to_32": main.get("kernel_efficiency_8_to_32"),
        "kernel_efficiency_2_to_8": main.get("kernel_efficiency_2_to_8"),
        "aux_levels": main.get("aux_levels"),
        "edges": edges,
        "note": main.get("note", ""),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
