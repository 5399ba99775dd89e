"""Quantify 2-move eviction-plan refinement gains on the golden graphs
(VERDICT r2 item 7): partition ba10k/ba100k with the full refinement
(single moves + eviction plans alternating) and with eviction plans disabled
(round-1 behavior), report the EXACT post-hoc edge-cut ratio for both.

Its round-3 measurement (BENCH_EVICTIONS_r3.json: ±0.3% cut for up to 9×
refinement wall) is why CuttanaConfig.enable_eviction_plans now defaults
OFF; the switch here is that config flag.

Usage: python jobs/bench_evictions.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cuttana_spark.partition.batched import cuttana_partition_batched
from cuttana_spark.partition.config import CuttanaConfig


def _ba(n, m=5, seed=42):
    import networkx as nx

    G = nx.barabasi_albert_graph(n, m, seed=seed)
    return [(v, sorted(G.neighbors(v))) for v in sorted(G.nodes())]


def exact_cut(adj, res) -> float:
    part = dict(zip(res.vertices.tolist(), res.partitions.tolist()))
    cut = total = 0
    for v, nbrs in adj:
        pv = part.get(v)
        for nb in nbrs:
            total += 1
            if pv != part.get(nb):
                cut += 1
    return cut / total if total else 0.0


def run(adj, k: int, evictions: bool) -> dict:
    cfg = CuttanaConfig(enable_eviction_plans=evictions)
    t0 = time.monotonic()
    res = cuttana_partition_batched(adj, k, config=cfg)
    dt = time.monotonic() - t0
    return {
        "cut_exact": round(exact_cut(adj, res), 5),
        "balance": round(res.balance, 4),
        "moves": len(res.moves),
        "wall_sec": round(dt, 2),
    }


def main() -> None:
    out = {}
    for name, n in (("ba10k", 10_000), ("ba100k", 100_000)):
        adj = _ba(n)
        for k in (4, 16):
            with_ev = run(adj, k, evictions=True)
            without = run(adj, k, evictions=False)
            out[f"{name}_k{k}"] = {
                "with_evictions": with_ev,
                "without_evictions": without,
                "cut_delta_pct": round(
                    100.0
                    * (without["cut_exact"] - with_ev["cut_exact"])
                    / max(without["cut_exact"], 1e-12),
                    3,
                ),
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
