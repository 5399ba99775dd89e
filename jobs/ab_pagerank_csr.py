"""A/B isolation: pagerank_csr under Cuttana partitions vs pmod-hash
partitions (round-1 open question, BENCH.md).

Method: same session, same graph (bench transcripts, hash ids), same k;
ALTERNATING interleaved reps (A B A B ...) so JIT warm-up, page cache and
GC drift hit both arms equally — round-1's single-shot A/B (28.8s vs 14.8s)
ran the arms back-to-back and was vulnerable to exactly that confound.
Both arms run the same bucketed-table path bench.py uses.

Usage: python jobs/ab_pagerank_csr.py [n_conv] [k] [iters] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from pyspark.sql import functions as F

    from cuttana_spark import transcripts as T
    from cuttana_spark.analytics.pagerank import pagerank_csr
    from cuttana_spark.operators import edges as E
    from cuttana_spark.partition.batched import cuttana_partition_df_batched
    from cuttana_spark.session import get_spark

    spark = get_spark(app="ab-pagerank-csr", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    fixture = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "fixtures", f"bench_transcripts_{n_conv // 1000}k.parquet")
    if not os.path.exists(fixture):
        T.write_parquet(fixture, n_conv=n_conv)
    tdf = spark.read.parquet(fixture)

    nodes, eids = E.transcript_edges(tdf, mode="hash")
    eids = eids.cache()
    n_edges = eids.count()
    sym = E.symmetrize(eids).cache()
    sym.count()
    adj = E.adjacency(eids).cache()
    adj.count()

    res = cuttana_partition_df_batched(adj, k, batch_size=4096)
    vp_cut = res.to_spark_df(spark).select("vertex", "partition_id").cache()
    vp_cut.count()
    vp_pmod = (
        nodes.select("vid")
        .select(F.col("vid").alias("vertex"),
                F.pmod(F.xxhash64("vid"), F.lit(k)).cast("int").alias("partition_id"))
        .cache()
    )
    vp_pmod.count()

    arms = {"cuttana": vp_cut, "pmod": vp_pmod}
    tables = {"cuttana": "ab_blocks_cut", "pmod": "ab_blocks_pmod"}
    for t in tables.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    # pack + warm both arms once (untimed)
    for name, vp in arms.items():
        pagerank_csr(spark, sym, vp, max_iter=1, tol=0.0,
                     bucketed_table=tables[name]).agg(F.sum("score")).collect()

    times: dict[str, list[float]] = {a: [] for a in arms}
    for _ in range(reps):
        for name, vp in arms.items():
            t0 = time.monotonic()
            pagerank_csr(spark, sym, vp, max_iter=iters, tol=0.0,
                         bucketed_table=tables[name]).agg(F.sum("score")).collect()
            times[name].append(round(time.monotonic() - t0, 2))

    med = {a: sorted(v)[len(v) // 2] for a, v in times.items()}
    print(json.dumps({
        "n_edges": n_edges, "k": k, "iters": iters,
        "times": times, "median": med,
        "cuttana_over_pmod": round(med["cuttana"] / med["pmod"], 3),
    }))
    for t in tables.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
