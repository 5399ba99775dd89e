"""Deterministic random walks — the DeepWalk/node2vec corpus generator.

Each walk step is a pure function of (walk_id, step): the next neighbor is
nbrs[ H(walk_id || '|' || step) mod degree ] over the SORTED neighbor
array, with H the portable md5-prefix hash. Determinism buys three things:
walks are reproducible across runs and engines (the DuckDB oracle replays
the identical recurrence), resumable mid-walk, and shardable without
coordination — at 10^12-edge scale every step is one hash join of the
frontier (walk_id, vertex) against the adjacency table, shuffling only the
O(#walks) frontier.

Dead ends (isolated vertices) terminate their walk; emitted rows carry
(walk_id, step, vertex) so downstream can window into context pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuttana_spark.operators.text import portable_hash64


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    starts: DataFrame,
    walk_length: int = 4,
) -> DataFrame:
    """edges: undirected (src, dst[, weight]); starts: DataFrame[walk_id,
    vertex] (walk_id unique). Returns (walk_id, step, vertex) for steps
    0..walk_length (step 0 = the start vertex)."""
    sym = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = (
        sym.groupBy("src")
        .agg(F.array_sort(F.collect_set("dst")).alias("nbrs"))
        .withColumnRenamed("src", "vertex")
        .cache()
    )

    frontier = starts.select("walk_id", "vertex")
    out = [frontier.withColumn("step", F.lit(0))]
    for step in range(1, walk_length + 1):
        key = F.concat_ws("|", F.col("walk_id").cast("string"), F.lit(str(step)))
        stepped = frontier.join(adj, "vertex").select(
            "walk_id",
            F.element_at(
                "nbrs",
                (F.pmod(portable_hash64(key), F.size("nbrs")) + 1).cast("int"),
            ).alias("vertex"),
        )
        out.append(stepped.withColumn("step", F.lit(step)))
        frontier = stepped
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.select("walk_id", "step", "vertex")
