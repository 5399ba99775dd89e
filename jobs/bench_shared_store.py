"""Shared-block-store CC benchmark (VERDICT r5 item 6).

Scenario: a pipeline has already packed the canonical sym-unit block store
for a graph (pagerank → k-core → CC over the same edges; graphstore.py) and
CC's contraction pre-pass can therefore run against a PRE-EXISTING store —
its marginal cost is accel_rounds frontier-only gathers + one relabel
shuffle, with no pack. This job measures, on a dense synthetic graph
(E/V = 5, the regime the pre-pass is built for):

  * pack      — one-time store build (the cost the pipeline amortizes),
  * cc_star   — pure small/large-star loop (shuffles O(E) twice per round),
  * cc_accel  — contraction pre-pass against the existing store
                (fingerprint-matched, no repack — asserted) + star tail.

Graph: V ring edges (one giant component, guarantees label mixing) + 4V
deterministic-hash random edges → E = 5V undirected. Both engines run on
the same cached edge DataFrame; equality of the resulting labelings is
asserted before the walls are reported.

Usage: python jobs/bench_shared_store.py [--verts 1000000] [--rounds 4]
       [--cpus 32] [--reps 2]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv
    verts = int(argv[argv.index("--verts") + 1]) if "--verts" in argv else 1_000_000
    rounds = int(argv[argv.index("--rounds") + 1]) if "--rounds" in argv else 4
    cpus = int(argv[argv.index("--cpus") + 1]) if "--cpus" in argv else 32
    reps = int(argv[argv.index("--reps") + 1]) if "--reps" in argv else 2

    from pyspark.sql import functions as F

    from cuttana_spark.session import get_spark

    spark = get_spark(
        app="shared-store-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    import cuttana_spark.analytics.blockstore as B
    from cuttana_spark.analytics.components import connected_components
    from cuttana_spark.analytics.graphstore import sym_unit_graph

    # ring + 4 deterministic-hash random edges per vertex -> E = 5V
    ring = spark.range(verts).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % verts).alias("dst")
    )
    rand = spark.range(4 * verts).select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(verts)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(verts)).alias("dst"),
    )
    edges = ring.unionAll(rand).filter(F.col("src") != F.col("dst")).cache()
    n_edges = edges.count()

    store = os.path.join(
        tempfile.mkdtemp(prefix="cuttana-shared-store-"), "blocks"
    )
    trans, vp, pid_of = sym_unit_graph(edges, cpus)

    t0 = time.monotonic()
    B.ensure_block_store(trans, vp, store, src_pid=pid_of(F.col("src")))
    pack_wall = round(time.monotonic() - t0, 3)
    key_after_pack = B._store_key(store)

    star_walls, accel_walls = [], []
    star_rounds = accel_rounds_ran = None
    base = None
    for _ in range(reps):
        rw: list = []
        t0 = time.monotonic()
        cc_star = connected_components(spark, edges, round_walls=rw)
        n_comp = cc_star.groupBy("component").count().count()
        star_walls.append(round(time.monotonic() - t0, 3))
        star_rounds = len(rw)

        rw2: list = []
        t0 = time.monotonic()
        cc_accel = connected_components(
            spark,
            edges,
            accel_rounds=rounds,
            accel_min_edges=0,
            accel_partitions=cpus,
            block_store=store,
            round_walls=rw2,
        )
        n_comp_accel = cc_accel.groupBy("component").count().count()
        accel_walls.append(round(time.monotonic() - t0, 3))
        accel_rounds_ran = len(rw2)

        assert B._store_key(store) == key_after_pack, "store was re-packed!"
        mism = (
            cc_star.withColumnRenamed("component", "a")
            .join(cc_accel.withColumnRenamed("component", "b"), "vertex", "full")
            .filter("a IS NULL OR b IS NULL OR a <> b")
            .count()
        )
        assert mism == 0 and n_comp == n_comp_accel, "labelings diverged"
        base = n_comp

    print(
        json.dumps(
            {
                "metric": "cc_shared_store",
                "unit": "sec",
                "n_vertices": verts,
                "n_edges_undirected": n_edges,
                "e_over_v": round(n_edges / verts, 2),
                "cpus": cpus,
                "pack_wall": pack_wall,
                "cc_star_walls": star_walls,
                "cc_star_rounds": star_rounds,
                "cc_accel_walls": accel_walls,
                "cc_accel_rounds_total": accel_rounds_ran,
                "accel_pre_rounds": rounds,
                "n_components": base,
                "speedup_star_over_accel": round(
                    min(star_walls) / min(accel_walls), 2
                ),
                "store_reused_without_repack": True,
            }
        )
    )
    B.drop_block_store(store)
    spark.stop()


if __name__ == "__main__":
    main()
