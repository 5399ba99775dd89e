"""Synchronous label propagation with deterministic tie-breaking.

Each superstep every vertex adopts the most frequent label among its
neighbors (ties → smallest label; vertices keep their label if isolated).
Deterministic by construction — (count DESC, label ASC) row_number window —
so the run is exactly reproducible and checkable against a pure-Python
oracle. Fixed max_iter (LPA need not converge; synchronous LPA can
oscillate on bipartite structures).

Self-loops are NOT neighbors (round 6): both entry points drop src == dst,
the same simple-graph convention as kcore.py, so the join and CSR paths
cannot diverge on inputs containing self-loops (a self-loop-only vertex is
"isolated" and keeps its label — which is also what counting its own label
would have produced, but tie-breaks against other neighbors differed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 10,
    runner=None,
) -> DataFrame:
    """edges: undirected (src, dst[, weight]) → DataFrame[vertex, label]."""
    sym = (
        edges.select("src", "dst")
        .unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
    )
    nodes = (
        edges.select(F.col("src").alias("vertex"))
        .unionAll(edges.select(F.col("dst").alias("vertex")))
        .distinct()
        .cache()
    )
    labels = nodes.withColumn("label", F.col("vertex"))

    start = 0
    if runner is not None:
        resumed = runner.resume()
        if resumed is not None:
            start, labels = resumed
    from cuttana_spark.plans.checkpoints import CheckpointCycler

    ck = CheckpointCycler(spark)
    labels = ck.checkpoint(labels)

    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("label"))
    for it in range(start, max_iter):
        freq = (
            sym.join(labels, sym.src == labels.vertex)
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        best = (
            freq.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select(F.col("dst").alias("vertex"), F.col("label").alias("new_label"))
        )
        labels = ck.checkpoint(
            labels.join(best, "vertex", "left").select(
                "vertex", F.coalesce("new_label", "label").alias("label")
            )
        )
        if runner is not None:
            runner.checkpoint(it + 1, labels, {})
    nodes.unpersist(False)
    return ck.finish(labels)


def label_propagation_csr(
    spark: SparkSession,
    edges: DataFrame,
    vertex_partitions: DataFrame | None,
    max_iter: int = 10,
    bucketed_table: str | None = None,
    block_store: str | None = None,
    hash_partitions: int | None = None,
) -> DataFrame:
    """LPA on the CSR gather-scatter skeleton (round 5) — identical
    semantics to label_propagation() (most frequent neighbor label, ties →
    smallest, isolated keep theirs), but each superstep shuffles only the
    O(V) label frontier against executor-resident CSR blocks; the per-block
    Arrow kernel pre-counts (dst, label) runs so the global aggregation
    receives ≤ one row per (block, dst, label) instead of one per edge. The
    argmax is a single min(struct(-cnt, label)) aggregation — no window
    sort. vertex_partitions must cover every vertex (see k_core_csr); any
    total map is correct, partition quality only affects locality.
    block_store: executor-resident store dir (see blockstore.py) — only the
    O(V) frontier enters the plan; mutually exclusive with bucketed_table.
    hash_partitions (round 6): pass an int INSTEAD of vertex_partitions to
    use the canonical expression map + shared sym-unit payload
    (graphstore.sym_unit_graph) — with block_store, the store fingerprint
    matches k-core's and CC's over the same edges, so one pack serves all
    three."""
    from cuttana_spark.analytics.csr import (
        gather_label_counts,
        pack_blocks,
    )
    from cuttana_spark.plans.checkpoints import CheckpointCycler

    if (vertex_partitions is None) == (hash_partitions is None):
        raise ValueError("pass exactly one of vertex_partitions / hash_partitions")
    if bucketed_table is not None and block_store is not None:
        raise ValueError("pass at most one of bucketed_table / block_store")
    src_pid = None
    if hash_partitions is not None:
        from cuttana_spark.analytics.graphstore import sym_unit_graph

        trans, vp, pid_of = sym_unit_graph(edges, hash_partitions)
        src_pid = pid_of(F.col("src"))
        frontier = vp.withColumn("label", F.col("vertex"))
    else:
        sym = (
            edges.select("src", "dst")
            .unionAll(
                edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .filter(F.col("src") != F.col("dst"))
        )
        trans = sym.withColumn("p", F.lit(1.0))  # ps unused by the label kernel
        vp = vertex_partitions.select("vertex", "partition_id")
        nodes = (
            edges.select(F.col("src").alias("vertex"))
            .unionAll(edges.select(F.col("dst").alias("vertex")))
            .distinct()
        )
        frontier = nodes.join(vp, "vertex").withColumn("label", F.col("vertex"))
    if block_store is not None:
        from cuttana_spark.analytics.blockstore import (
            ensure_block_store,
            gather_label_counts_resident,
        )

        ensure_block_store(
            trans, vp, block_store, src_pid=src_pid,
            kind="sym-unit" if src_pid is not None else "",
        )
        blocks = None
        gather = lambda f: gather_label_counts_resident(spark, block_store, f)
    elif bucketed_table is not None:
        if not spark.catalog.tableExists(bucketed_table):
            nb = int(vp.agg(F.max("partition_id")).first()[0]) + 1
            pack_blocks(trans, vp, src_pid=src_pid).write.bucketBy(
                nb, "partition_id"
            ).mode("overwrite").saveAsTable(bucketed_table)
        blocks = spark.table(bucketed_table)
        gather = lambda f: gather_label_counts(spark, blocks, f)
    else:
        blocks = pack_blocks(trans, vp, src_pid=src_pid).cache()
        blocks.count()
        gather = lambda f: gather_label_counts(spark, blocks, f)

    ck = CheckpointCycler(spark)
    frontier = ck.checkpoint(frontier)
    for _ in range(max_iter):
        partials = gather(frontier)
        counts = partials.groupBy("dst", "label").agg(F.sum("cnt").alias("cnt"))
        best = (
            counts.groupBy("dst")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"), F.col("label").alias("lb")
                    )
                ).alias("s")
            )
            .select(F.col("dst").alias("vertex"), F.col("s.lb").alias("new_label"))
        )
        frontier = ck.checkpoint(
            frontier.join(best, "vertex", "left").select(
                "vertex",
                "partition_id",
                F.coalesce("new_label", "label").alias("label"),
            )
        )
    if bucketed_table is None and block_store is None:
        blocks.unpersist(False)
    return ck.finish(frontier).select("vertex", "label")


def label_propagation_oracle(adj: dict[int, list[int]], max_iter: int = 10) -> dict[int, int]:
    """Pure-Python oracle with identical semantics (exact-match tests)."""
    labels = {v: v for v in adj}
    for _ in range(max_iter):
        new = {}
        for v, nbrs in adj.items():
            if not nbrs:
                new[v] = labels[v]
                continue
            counts: dict[int, int] = {}
            for nb in nbrs:
                lb = labels[nb]
                counts[lb] = counts.get(lb, 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        labels = new
    return labels
