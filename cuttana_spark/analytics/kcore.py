"""k-core decomposition by iterative peeling.

The k-core is the maximal subgraph where every vertex has degree >= k.
Peeling: repeatedly drop vertices whose degree among the *surviving* set is
below k, to fixpoint. Each round is two hash joins (edges x alive set, both
sides) and one aggregate — fully declarative, shrinking working set,
localCheckpoint truncates lineage per round. Round count is bounded by the
longest peeling chain (18 on the transcripts fixture at k=2); at 10^12-edge
scale each round's joins shuffle only the surviving O(V) vertex set against
the edge table, which stays cached/bucketed.

Oracle: pure-Python/networkx `core_number` in tests; the driver oracle
unrolls the same peeling as materialized DuckDB CTEs (__spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def k_core(spark: SparkSession, edges: DataFrame, k: int, max_rounds: int = 200) -> DataFrame:
    """edges: undirected canonical (src, dst[, weight]) → DataFrame[vertex]
    containing exactly the k-core vertices (empty if none)."""
    from cuttana_spark.plans.checkpoints import CheckpointCycler

    sym = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()
    ck = CheckpointCycler(spark)
    alive = ck.checkpoint(sym.select(F.col("src").alias("vertex")).distinct())
    n_prev = alive.count()
    for _ in range(max_rounds):
        deg = (
            sym.join(alive.withColumnRenamed("vertex", "src"), "src")
            .join(alive.withColumnRenamed("vertex", "dst"), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        new_alive = ck.checkpoint(
            deg.filter(F.col("deg") >= k).select(F.col("src").alias("vertex"))
        )
        n_new = new_alive.count()
        alive = new_alive
        if n_new == n_prev or n_new == 0:
            break
        n_prev = n_new
    sym.unpersist(False)
    return ck.finish(alive)
