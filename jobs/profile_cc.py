"""Per-round wall profile of connected_components on the bench graph.

Usage: python jobs/profile_cc.py [sig_every] [cpus]
Prints one JSON line: total wall, rounds, per-round walls + sig walls.
Used to decide the signature cadence (VERDICT r4 item 2a) with data rather
than guesswork: the every-other-round idea only pays if sig_wall is a
meaningful fraction of round wall AND the confirmation round it can add
costs less than the skipped aggregates.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sig_every = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from cuttana_spark.session import get_spark

    spark = get_spark(
        app="cc-profile", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import ensure_bench_transcripts
    from cuttana_spark.analytics.components import connected_components
    from cuttana_spark.operators import edges as E

    tdf = spark.read.parquet(ensure_bench_transcripts())
    nodes, eids = E.transcript_edges(tdf, mode="hash")
    eids = eids.cache()
    eids.count()

    walls: list = []
    t0 = time.monotonic()
    try:
        cc = connected_components(spark, eids, sig_every=sig_every, round_walls=walls)
    except TypeError:  # older signature (A/B runs against stashed versions)
        cc = connected_components(spark, eids)
    n_comp = cc.agg({"component": "approx_count_distinct"}).first()[0]
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "metric": "cc_wall",
                "value": round(wall, 3),
                "unit": "sec",
                "sig_every": sig_every,
                "cpus": cpus,
                "rounds": len(walls),
                "n_components_approx": n_comp,
                "round_walls": [round(w["wall"], 3) for w in walls],
                "sig_walls": [round(w["sig_wall"], 3) for w in walls],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
