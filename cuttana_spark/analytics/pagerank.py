"""PageRank — two implementations sharing semantics with networkx.pagerank.

1. ``pagerank`` — pure declarative DataFrame joins + aggregations. Catalyst
   gets the whole plan; AQE handles reducer skew; per-iteration lineage is
   truncated with localCheckpoint. This is the oracle-checkable variant.

2. ``pagerank_csr`` — the scale path from the north star: frontier scores
   hash-cogrouped against CSR-packed per-partition adjacency blocks inside an
   Arrow ``applyInPandas`` UDF (numpy gather-scatter, no per-row Python).
   Hub-vertex skew is neutralized structurally: each block partially
   aggregates contributions per dst BEFORE the shuffle (map-side combine), so
   a degree-10^8 hub receives at most one row per block instead of one per
   edge. See csr.py for block packing.

Semantics (matches networkx.pagerank): column-stochastic transition with
weights, teleport (1-α)/N, dangling mass redistributed uniformly,
L1 convergence err < N·tol.

The reference has no analytics at all (SURVEY §0); the oracle is
networkx/DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nodes(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("vertex"))
        .unionAll(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-10,
    runner=None,
    checkpoint_interval: int = 5,
    iter_walls: list | None = None,
    stable_layout: bool | None = None,
) -> DataFrame:
    """PageRank over a DIRECTED weighted edge table (src, dst, weight).

    For undirected graphs pass the symmetrized table
    (operators.edges.symmetrize). Feed an edge table hash-partitioned on
    `src` (e.g. `.repartition(n, "src")` once, cached) when you can: the
    transition-matrix window then runs exchange-free and short runs skip
    ~4 s of re-exchange on the 1.3M-edge bench graph (stable_layout=True
    imposes that layout itself). Returns DataFrame[vertex, score].
    ``runner``: optional supersteps.SuperstepRunner for checkpoint/resume.
    ``checkpoint_interval``: materialize (and truncate lineage) every k-th
    superstep; intermediate supersteps stay lazily chained in one DAG.
    ``iter_walls``: optional list — appends each superstep's wall seconds
    (meaningful with checkpoint_interval=1, where every superstep is its own
    job; the scaling bench's steady-state metric).
    ``stable_layout``: lay out the static transition matrix on the join key
    and materialize it eagerly before superstep 1. Worth it only when the
    upfront repartition+count amortizes over many supersteps — default is
    on for long/tol-driven runs (tol > 0 or max_iter > 8) and off for short
    fixed-iteration runs, where the upfront cost would dominate the wall.

    AQE: when every superstep materializes as its own job
    (checkpoint_interval=1 or tol-driven), adaptive execution re-plans the
    SAME fixed-shape query each superstep — each one splits into 3 driver
    jobs (2 AQE sub-jobs + the checkpoint job) and the coalesced output
    layout forces a fresh frontier exchange next round. Measured on the
    10.5M-edge fixture at local[32]: 2.38 s/superstep with AQE vs 1.60 s
    without (local[8]: 3.02 vs 2.71). The loop therefore disables AQE for
    its own queries in that mode and restores the session setting on exit;
    lazily-chained fixed-iteration runs (one DAG) keep the session setting —
    there AQE measures slightly BETTER (15.3 s vs 16.8 s for 5 chained
    supersteps). Skew safety inside the loop comes from the plan itself
    (map-side partial aggregation bounds hub fan-in), not AQE.

    SESSION-LEVEL SIDE EFFECT: the AQE toggle is a SparkSession conf, so any
    OTHER query run concurrently on the same session during a per-superstep
    pagerank() call also executes AQE-off. Don't interleave unrelated
    queries with a tol-driven / checkpoint_interval=1 run on one session —
    use a separate session (spark.newSession()) for concurrent work. The
    original setting is restored exactly on exit: an explicitly-set value is
    set back, an unset key is unset again (not pinned to a default).
    """
    import time as _time

    per_superstep_jobs = checkpoint_interval == 1 or tol > 0
    aqe_touched = False
    aqe_saved = None
    if per_superstep_jobs:
        aqe_saved = spark.conf.get("spark.sql.adaptive.enabled", None)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        aqe_touched = True
    try:
        return _pagerank_impl(
            spark, edges, alpha, max_iter, tol, runner, checkpoint_interval,
            iter_walls, stable_layout, _time,
        )
    finally:
        if aqe_touched:
            if aqe_saved is None:
                spark.conf.unset("spark.sql.adaptive.enabled")
            else:
                spark.conf.set("spark.sql.adaptive.enabled", aqe_saved)


def _pagerank_impl(
    spark, edges, alpha, max_iter, tol, runner, checkpoint_interval,
    iter_walls, stable_layout, _time,
):
    edges = edges.select("src", "dst", F.col("weight").cast("double"))
    # ONE aggregation pass answers everything the loop needs about the
    # vertex set: the set itself, the count, and which vertices lack an
    # out-edge (round 7; was nodes.distinct + srcs.distinct + a left join —
    # three exchanges over up to 2x the rows). groupBy(max) has map-side
    # partial aggregation, so the single exchange carries ~V rows.
    flags = (
        edges.select(F.col("src").alias("vertex"), F.lit(1).alias("_has_out"))
        .unionAll(edges.select(F.col("dst").alias("vertex"), F.lit(0).alias("_has_out")))
        .groupBy("vertex")
        .agg(F.max("_has_out").alias("_has_out"))
        .cache()
    )
    row = flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_has_out") == 0, 1).otherwise(0)).alias("n_dangling"),
    ).first()
    n = row.n
    if n == 0:
        flags.unpersist(False)
        return spark.createDataFrame([], "vertex long, score double")
    has_dangling = row.n_dangling > 0
    nodes = flags.select("vertex")

    # The transition matrix is STATIC across supersteps and joined on src
    # every one of them. Built with a window over src (p = w / sum(w) per
    # src) instead of a groupBy+join: no out_w subtree, and when the input
    # is already hash-partitioned on src the window adds NO exchange. The
    # sum is exact in any order for integer-valued weights (doubles below
    # 2^53), so p is bit-identical to the join formulation on count-weighted
    # graphs. For LONG runs, lay it out once (explicit hash partitioning on
    # the join key, no AQE-coalesced odd layout) and materialize it eagerly
    # — otherwise the first superstep's job mixes cache-fill with gather and
    # per-superstep walls are unstable (measured: 2.8 s vs 5-50 s stalls at
    # 10M edges when the cached side kept its ad-hoc post-join layout). For
    # SHORT fixed-iteration runs the upfront repartition+count costs more
    # than it saves, so it is conditional.
    from pyspark.sql import Window

    if stable_layout is None:
        stable_layout = tol > 0 or max_iter > 8
    base = edges.repartition("src") if stable_layout else edges
    trans = base.select(
        "src",
        "dst",
        (F.col("weight") / F.sum("weight").over(Window.partitionBy("src"))).alias("p"),
    ).cache()
    if stable_layout:
        trans.count()
    dangling_nodes = (
        flags.filter(F.col("_has_out") == 0).select("vertex")
        if has_dangling
        else None
    )

    start_iter = 0
    ranks = nodes.withColumn("score", F.lit(1.0 / n))
    from cuttana_spark.plans.checkpoints import CheckpointCycler

    ck = CheckpointCycler(spark)
    if runner is not None:
        resumed = runner.resume()
        if resumed is not None:
            start_iter, ranks = resumed
            # resumed state carries real lineage — cut it before looping
            ranks = ck.checkpoint(ranks)
    # fresh start: ranks is nodes(cached) + a literal column — lineage is
    # already minimal, a checkpoint here would only cost an extra job

    # FUSED fixed-iteration mode (round 7): between checkpoint boundaries the
    # full ranks table is never materialized as a relation — the state is
    # (contribs, dangling_mass), and a vertex's score is the EXPRESSION
    # cst + α·(coalesce(contrib, 0) + dm/n), identical to the one the
    # materialized table held. The per-superstep `nodes ⋈ contribs` left
    # join (a V-row scan + sort-merge per superstep whose only purpose was
    # re-introducing zero-in-degree vertices) disappears; the transition
    # join attaches scores by LEFT-joining contribs onto trans.src and
    # computing the same expression inline. Scores at boundaries are built
    # with the exact formula/relations of the unfused superstep. Only active
    # when no convergence test or resume runner needs the full table.
    use_fused = tol <= 0 and runner is None
    fused_state = None  # (contribs, dm_prev) when ranks is implicit

    def _attach_scores(rel, key_col, contribs, dm_prev):
        """LEFT-join contribs onto rel[key_col]; returns (df, score_column)
        computing the implicit per-vertex score."""
        c = contribs.select(F.col("dst").alias("_cv"), "contrib")
        out = rel.join(c, F.col(key_col) == F.col("_cv"), "left")
        if has_dangling:
            out = out.crossJoin(F.broadcast(dm_prev))
            extra = F.col("dangling_mass") / F.lit(float(n))
        else:
            extra = F.lit(0.0)
        score = F.lit((1.0 - alpha) / n) + F.lit(alpha) * (
            F.coalesce(F.col("contrib"), F.lit(0.0)) + extra
        )
        return out, score

    for it in range(start_iter, max_iter):
        _t_it = _time.monotonic() if iter_walls is not None else 0.0
        if fused_state is not None:
            pc, pdm = fused_state
            att, pscore = _attach_scores(trans, "src", pc, pdm)
            contribs = att.groupBy("dst").agg(
                F.sum(F.col("p") * pscore).alias("contrib")
            )
            dm = None
            if has_dangling:
                datt, dscore = _attach_scores(dangling_nodes, "vertex", pc, pdm)
                dm = datt.agg(
                    F.coalesce(F.sum(dscore), F.lit(0.0)).alias("dangling_mass")
                )
        else:
            contribs = (
                trans.join(ranks, trans.src == ranks.vertex)
                .groupBy("dst")
                .agg(F.sum(F.col("p") * F.col("score")).alias("contrib"))
            )
            dm = None
            if has_dangling:
                # fold the dangling-mass scalar INTO the plan via a broadcast
                # crossJoin of the 1-row aggregate — no per-superstep driver
                # action, so fixed-iteration runs stay a single lazy DAG even
                # on graphs with dangling vertices
                dm = dangling_nodes.join(ranks, "vertex").agg(
                    F.coalesce(F.sum("score"), F.lit(0.0)).alias("dangling_mass")
                )
        boundary = (
            tol > 0
            or runner is not None
            or (it + 1) % checkpoint_interval == 0
            or it + 1 == max_iter
        )
        if use_fused and not boundary:
            fused_state = (contribs, dm)
            if iter_walls is not None:
                iter_walls.append(_time.monotonic() - _t_it)
            continue
        # materialize the full ranks table (and truncate lineage/plan
        # growth) only at boundaries — intermediate supersteps live as
        # shuffle outputs that Spark reuses, so a fixed-iteration run
        # executes as ONE dag with no per-superstep driver round-trip
        joined = nodes.join(contribs, nodes.vertex == contribs.dst, "left")
        if has_dangling:
            joined = joined.crossJoin(F.broadcast(dm))
            extra = F.col("dangling_mass") / F.lit(float(n))
        else:
            extra = F.lit(0.0)
        new_ranks = joined.select(
            "vertex",
            (
                F.lit((1.0 - alpha) / n)
                + F.lit(alpha) * (F.coalesce(F.col("contrib"), F.lit(0.0)) + extra)
            ).alias("score"),
        )
        new_ranks = ck.checkpoint(new_ranks)
        fused_state = None
        if tol > 0:
            err = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "vertex")
                .agg(F.sum(F.abs(F.col("a.score") - F.col("b.score"))))
                .first()[0]
            )
        else:
            err = float("inf")  # fixed-iteration mode: no convergence action
        ranks = new_ranks
        if iter_walls is not None:
            iter_walls.append(_time.monotonic() - _t_it)
        if runner is not None:
            runner.checkpoint(it + 1, ranks, {"err": float(err) if err != float("inf") else -1.0})
        if err < n * tol:
            break
    # the returned ranks is a checkpointed LogicalRDD — the per-call input
    # caches are dead weight now; unpersist so repeated calls don't pile up
    # evictable-but-noisy blocks in the BlockManager
    for c in (flags, trans):
        c.unpersist(False)
    return ck.finish(ranks)


def pagerank_csr(
    spark: SparkSession,
    edges: DataFrame,
    vertex_partitions: DataFrame | None,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-10,
    runner=None,
    bucketed_table: str | None = None,
    num_buckets: int | None = None,
    checkpoint_interval: int = 5,
    iter_walls: list | None = None,
    block_store: str | None = None,
    hash_partitions: int | None = None,
) -> DataFrame:
    """PageRank via CSR-block gather-scatter (see module docstring).

    ``checkpoint_interval``/``iter_walls``: as in pagerank() — interval 1
    materializes every superstep as its own job so each wall in iter_walls
    is one steady-state superstep (the scaling bench's subject); the default
    (5) keeps fixed-iteration runs lazily chained.

    vertex_partitions: DataFrame[vertex, partition_id] — from the Cuttana
    partitioner; blocks are co-located by partition_id so each superstep
    shuffles only the O(V) frontier, not the O(E) edges.

    bucketed_table: if set, the packed blocks are written ONCE as a table
    bucketed by partition_id; every superstep's cogroup then reads it with
    the exchange elided (verified in the physical plan) — the O(E) side is
    never reshuffled. This is the bucketing story from the north star and
    the right mode on a real cluster.

    block_store: if set (a directory path; mutually exclusive with
    bucketed_table), the packed blocks are written ONCE as a parquet dataset
    partitioned by partition_id and each superstep runs against the
    EXECUTOR-RESIDENT store: only the O(V) frontier enters the plan — block
    bytes are loaded from the store by the reused Python workers on first
    touch and cached in-process (blockstore.py). This removes the
    per-superstep O(E) Arrow transfer that dominates the cogroup modes on
    dense graphs; scores are bit-identical (same kernels).

    hash_partitions (round 7, VERDICT r6 item 6): pass an int INSTEAD of
    vertex_partitions to use the canonical expression map + transition
    payload (graphstore.trans_graph) — the same routing family k-core / LPA
    / CC share. The O(E)⋈O(V) routing join is skipped (the map is an
    expression), the per-call V⋈V vp attach is a codegen expression, and
    with block_store set the store fingerprint matches any other
    trans_graph pack over the same edges DataFrame and k: a pagerank →
    k-core → LPA → CC pipeline pays exactly TWO packs (trans + sym-unit).
    Scores are identical to the vertex_partitions mode (partition maps
    affect only locality).
    """
    from pyspark.sql import Window

    from cuttana_spark.analytics.csr import pack_blocks, scatter_gather

    if (vertex_partitions is None) == (hash_partitions is None):
        raise ValueError("pass exactly one of vertex_partitions / hash_partitions")
    if bucketed_table is not None and block_store is not None:
        raise ValueError("pass at most one of bucketed_table / block_store")
    src_pid = None
    pid_of = None
    kind = ""
    if hash_partitions is not None:
        from cuttana_spark.analytics.graphstore import trans_graph

        # canonical plans built from the ORIGINAL edges df — fingerprint
        # equality across callers requires the same construction
        trans, vp_canon, pid_of = trans_graph(edges, hash_partitions)
        src_pid = pid_of(F.col("src"))
        kind = "trans"
    edges = edges.select("src", "dst", F.col("weight").cast("double"))
    if hash_partitions is None:
        # window-built transition matrix — see pagerank(): no out_w subtree,
        # bit-identical p on count-weighted graphs
        trans = edges.select(
            "src",
            "dst",
            (F.col("weight") / F.sum("weight").over(Window.partitionBy("src"))).alias(
                "p"
            ),
        )
    if block_store is not None:
        from cuttana_spark.analytics.blockstore import (
            ensure_block_store,
            scatter_gather_resident,
        )

        ensure_block_store(
            trans,
            vp_canon if hash_partitions is not None else vertex_partitions,
            block_store,
            src_pid=src_pid,
            kind=kind,
        )
        blocks = None
        gather = lambda frontier: scatter_gather_resident(
            spark, block_store, frontier
        )
    elif bucketed_table is not None:
        if not spark.catalog.tableExists(bucketed_table):
            if hash_partitions is not None:
                k = hash_partitions
                pack_src = vp_canon
            else:
                k = num_buckets or int(
                    vertex_partitions.agg(F.max("partition_id")).first()[0]
                ) + 1
                pack_src = vertex_partitions
            pack_blocks(trans, pack_src, src_pid=src_pid).write.bucketBy(
                k, "partition_id"
            ).mode("overwrite").saveAsTable(bucketed_table)
        blocks = spark.table(bucketed_table)
        gather = lambda frontier: scatter_gather(spark, blocks, frontier)
    else:
        blocks = pack_blocks(
            trans,
            vp_canon if hash_partitions is not None else vertex_partitions,
            src_pid=src_pid,
        ).cache()
        blocks.count()  # materialize once; reused every superstep
        gather = lambda frontier: scatter_gather(spark, blocks, frontier)
    vp = (
        vertex_partitions.select("vertex", "partition_id")
        if hash_partitions is None
        else None
    )
    # carry partition_id through the loop so each superstep needs no extra
    # score→partition join (vertices without a partition — possible only for
    # dangling-only ids — contribute nothing and keep pid -1). The dangling
    # indicator is computed in the SAME aggregation pass that builds the
    # vertex set (round 7; was nodes.distinct + srcs.distinct + two joins —
    # the fused groupBy(max) carries ~V rows through one exchange), and ONE
    # driver action fills the cache and answers vertex count + any-dangling.
    vflags = (
        edges.select(F.col("src").alias("vertex"), F.lit(1).alias("_has_out"))
        .unionAll(edges.select(F.col("dst").alias("vertex"), F.lit(0).alias("_has_out")))
        .groupBy("vertex")
        .agg(F.max("_has_out").alias("_has_out"))
    )
    if hash_partitions is not None:
        # expression map: the pid attach is free codegen, no V⋈V join
        nodes_flags = vflags.select(
            "vertex", pid_of(F.col("vertex")).alias("partition_id"), "_has_out"
        ).cache()
    else:
        nodes_flags = (
            vflags.join(vp, "vertex", "left")
            .select(
                "vertex",
                F.coalesce("partition_id", F.lit(-1)).alias("partition_id"),
                "_has_out",
            )
            .cache()
        )
    row = nodes_flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_has_out") == 0, 1).otherwise(0)).alias("n_dangling"),
    ).first()
    n = row.n
    if n == 0:
        nodes_flags.unpersist(False)
        if bucketed_table is None and block_store is None:
            blocks.unpersist(False)
        return spark.createDataFrame([], "vertex long, score double")
    has_dangling = row.n_dangling > 0
    nodes_pid = nodes_flags.select("vertex", "partition_id")  # cache projection
    dangling_nodes = nodes_flags.filter(F.col("_has_out") == 0).select("vertex")

    start_iter = 0
    ranks = nodes_pid.withColumn("score", F.lit(1.0 / n))
    if runner is not None:
        resumed = runner.resume()
        if resumed is not None:
            start_iter, resumed_state = resumed
            ranks = resumed_state
            if "partition_id" not in ranks.columns:
                ranks = ranks.join(nodes_pid, "vertex")
    from cuttana_spark.plans.checkpoints import CheckpointCycler

    ck = CheckpointCycler(spark)
    ranks = ck.checkpoint(ranks)

    import time as _time

    for it in range(start_iter, max_iter):
        _t_it = _time.monotonic()
        contribs = gather(ranks)
        joined = nodes_pid.join(contribs, nodes_pid.vertex == contribs.dst, "left")
        if has_dangling:
            # in-plan dangling mass (broadcast 1-row aggregate) — see pagerank()
            dm = dangling_nodes.join(ranks, "vertex").agg(
                F.coalesce(F.sum("score"), F.lit(0.0)).alias("dangling_mass")
            )
            joined = joined.crossJoin(F.broadcast(dm))
            extra = F.col("dangling_mass") / F.lit(float(n))
        else:
            extra = F.lit(0.0)
        new_ranks = joined.select(
            "vertex",
            "partition_id",
            (
                F.lit((1.0 - alpha) / n)
                + F.lit(alpha) * (F.coalesce(F.col("contrib"), F.lit(0.0)) + extra)
            ).alias("score"),
        )
        # materialize (truncate lineage/plan growth) only periodically —
        # intermediate supersteps live as shuffle outputs that Spark reuses,
        # so a fixed-iteration run executes as ONE dag with no per-superstep
        # driver round-trip
        interval = max(1, checkpoint_interval)
        if tol > 0 or runner is not None or (it + 1) % interval == 0 or it + 1 == max_iter:
            new_ranks = ck.checkpoint(new_ranks)
        if tol > 0:
            err = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "vertex")
                .agg(F.sum(F.abs(F.col("a.score") - F.col("b.score"))))
                .first()[0]
            )
        else:
            err = float("inf")  # fixed-iteration mode: no convergence action
        ranks = new_ranks
        if iter_walls is not None:
            iter_walls.append(_time.monotonic() - _t_it)
        if runner is not None:
            runner.checkpoint(it + 1, ranks, {"err": float(err) if err != float("inf") else -1.0})
        if err < n * tol:
            break
    nodes_flags.unpersist(False)
    if bucketed_table is None and block_store is None:
        blocks.unpersist(False)
    return ck.finish(ranks).select("vertex", "score")


def personalized_pagerank(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    alpha: float = 0.85,
    max_iter: int = 20,
    stable_layout: bool | None = None,
) -> DataFrame:
    """Personalized PageRank: teleport (and dangling mass) go UNIFORMLY to
    the `seeds` vertex set instead of to all vertices — random walk with
    restart from the seeds. seeds: DataFrame[vertex]. Fixed-iteration,
    lazily chained like pagerank(); the seed indicator rides along as a
    column so each superstep's teleport needs no extra join."""
    edges = edges.select("src", "dst", F.col("weight").cast("double"))
    nodes = _nodes(edges).cache()
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "vertex long, score double")
    seed_df = F.broadcast(seeds.select("vertex").distinct().withColumn("is_seed", F.lit(1)))
    nodes_s = nodes.join(seed_df, "vertex", "left").select(
        "vertex", F.coalesce("is_seed", F.lit(0)).alias("is_seed")
    ).cache()
    n_seeds = nodes_s.agg(F.sum("is_seed")).first()[0]
    if not n_seeds:
        raise ValueError("personalized_pagerank: no seed vertex exists in the graph")

    from pyspark.sql import Window

    # static across supersteps — window-built (see pagerank), eager join-key
    # layout only when the run is long enough to amortize it
    if stable_layout is None:
        stable_layout = max_iter > 8
    base = edges.repartition("src") if stable_layout else edges
    trans = base.select(
        "src",
        "dst",
        (F.col("weight") / F.sum("weight").over(Window.partitionBy("src"))).alias("p"),
    ).cache()
    if stable_layout:
        trans.count()
    srcs = edges.select(F.col("src").alias("vertex")).distinct()
    dangling = nodes.join(srcs, "vertex", "left_anti").cache()
    has_dangling = dangling.count() > 0

    from cuttana_spark.plans.checkpoints import CheckpointCycler

    ck = CheckpointCycler(spark)
    # start from the restart distribution (uniform over seeds)
    ranks = ck.checkpoint(
        nodes_s.withColumn(
            "score", F.col("is_seed").cast("double") / F.lit(float(n_seeds))
        )
    )
    for it in range(max_iter):
        contribs = (
            trans.join(ranks, trans.src == ranks.vertex)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("score")).alias("contrib"))
        )
        joined = nodes_s.join(contribs, nodes_s.vertex == contribs.dst, "left")
        if has_dangling:
            dm = dangling.join(ranks, "vertex").agg(
                F.coalesce(F.sum("score"), F.lit(0.0)).alias("dmass")
            )
            joined = joined.crossJoin(F.broadcast(dm))
            extra = F.col("dmass") / F.lit(float(n_seeds))
        else:
            extra = F.lit(0.0)
        restart = F.col("is_seed").cast("double") / F.lit(float(n_seeds))
        new_ranks = joined.select(
            "vertex",
            "is_seed",
            (
                F.lit(1.0 - alpha) * restart
                + F.lit(alpha) * (F.coalesce(F.col("contrib"), F.lit(0.0)) + extra * F.col("is_seed"))
            ).alias("score"),
        )
        if (it + 1) % 5 == 0 or it + 1 == max_iter:
            new_ranks = ck.checkpoint(new_ranks)
        ranks = new_ranks
    for c in (nodes, nodes_s, trans, dangling):
        c.unpersist(False)
    return ck.finish(ranks).select("vertex", "score")
