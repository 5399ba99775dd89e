"""Connected components — alternating small-star / large-star
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14),
expressed entirely as DataFrame aggregations + joins.

Converges in O(log² n) rounds; each round is two groupBy-min shuffles. The
result maps every vertex to the minimum vertex id of its component (the
canonical representative), which the networkx oracle checks exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_ROUNDS = 50


def _large_star(e: DataFrame) -> DataFrame:
    """For each u: m = min(u ∪ N(u)); emit (v, m) for v in N(u) with v > u."""
    sym = e.select("a", "b").unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(F.min("b").alias("mb"))
    return (
        sym.filter(F.col("b") > F.col("a"))
        .join(mins, "a")
        .select(F.col("b").alias("a"), F.least("a", "mb").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges high→low; for each u: m = min(N_low(u) ∪ {u}); emit
    (v, m) for v in N_low(u) and (u, m)."""
    d = e.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).filter(F.col("a") != F.col("b"))
    mins = d.groupBy("a").agg(F.min("b").alias("m"))
    star = d.join(mins, "a")
    out = star.select(F.col("b").alias("a"), F.col("m").alias("b")).unionAll(
        star.select("a", F.col("m").alias("b"))
    )
    return out.filter(F.col("a") != F.col("b")).distinct()


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = MAX_ROUNDS,
    runner=None,
) -> DataFrame:
    """edges: undirected (src, dst[, weight]) → DataFrame[vertex, component]
    where component = min vertex id of the component."""
    nodes = (
        edges.select(F.col("src").alias("vertex"))
        .unionAll(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .cache()
    )
    from cuttana_spark.plans.checkpoints import CheckpointCycler

    ck = CheckpointCycler(spark)
    e = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).filter(
        F.col("a") != F.col("b")
    )
    e = ck.checkpoint(e)

    start = 0
    if runner is not None:
        resumed = runner.resume()
        if resumed is not None:
            start, e = resumed
            e = ck.checkpoint(e)

    def _sig(df, canonical: bool = False) -> tuple:
        # order-insensitive canonical-edge-set signature: one cheap aggregate
        # per round instead of a union+groupBy over both generations.
        # canonical=True: the rows are already distinct with b < a (exactly
        # what _small_star emits), so the least/greatest + distinct pass —
        # a full extra shuffle of the edge set per round — is skipped and
        # the signature is a single aggregate over (b, a).
        if canonical:
            x, y = F.col("b"), F.col("a")
            src = df
        else:
            src = df.select(
                F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
            ).distinct()
            x, y = F.col("x"), F.col("y")
        row = src.agg(
            F.count(F.lit(1)).alias("cnt"),
            # decimal sum: exact and overflow-free under ANSI mode
            F.sum(F.xxhash64(x, y).cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row.cnt, row.h)

    prev_sig = _sig(e)
    for rnd in range(start, max_rounds):
        e2 = ck.checkpoint(_small_star(_large_star(e)))
        sig = _sig(e2, canonical=True)
        changed = sig != prev_sig
        prev_sig = sig
        e = e2
        if runner is not None:
            runner.checkpoint(rnd + 1, e, {"changed": int(changed)})
        if not changed:
            break

    # at fixpoint every edge is (v, root); vertices may appear as roots only
    ck.finish(e)
    labels = e.groupBy(F.col("a").alias("vertex")).agg(F.min("b").alias("component"))
    return (
        nodes.join(labels, "vertex", "left")
        .select(
            "vertex",
            F.least(F.coalesce("component", F.col("vertex")), F.col("vertex")).alias("component"),
        )
    )
