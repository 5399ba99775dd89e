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
    """For each u: m = min(u ∪ N(u)); emit (v, m) for v in N(u) with v > u.

    NO dedup here (round 5): the star operations are min-aggregations, which
    are duplicate-insensitive, so the intermediate may be a MULTISET — the
    Kiveris et al. proofs only concern the edge SET represented, which
    dropping duplicates does not change. Small-star's terminal distinct (the
    one the convergence signature needs anyway) bounds multiset growth each
    round; removing this distinct removes a full edge-set shuffle per round.
    The min side stays a groupBy (map-side partial agg → ε shuffle, and AQE
    typically broadcasts it) rather than a window, because the min is over
    ALL 2E sym rows while only the E high-oriented rows are emitted — a
    window would shuffle 2E where groupBy+join shuffles E+ε."""
    sym = e.select("a", "b").unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(F.min("b").alias("mb"))
    return (
        sym.filter(F.col("b") > F.col("a"))
        .join(mins, "a")
        .select(F.col("b").alias("a"), F.least("a", "mb").alias("b"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges high→low; for each u: m = min(N_low(u) ∪ {u}); emit
    (v, m) for v in N_low(u) and (u, m).

    The per-u min is built with a window over `a` instead of groupBy+join:
    the window needs ONE exchange + ONE sort of the E oriented rows, where
    the join formulation exchanges the same E rows for the probe side AND
    sort-merges both sides. m = min(N_low(u)) < u always (every b < a here),
    so min(N_low ∪ {u}) = m with no extra least(). Hub skew is identical to
    the join formulation — either way all rows of one u land in one task;
    WindowExec spills its per-key frame if a hub exceeds memory."""
    from pyspark.sql import Window

    d = e.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).filter(F.col("a") != F.col("b"))
    star = d.withColumn("m", F.min("b").over(Window.partitionBy("a")))
    out = star.select(F.col("b").alias("a"), F.col("m").alias("b")).unionAll(
        star.select("a", F.col("m").alias("b"))
    )
    return out.filter(F.col("a") != F.col("b")).distinct()


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = MAX_ROUNDS,
    runner=None,
    sig_every: int = 1,
    round_walls: list | None = None,
    accel_rounds: int = 0,
    accel_min_edges: int = 200_000,
    accel_partitions: int = 32,
    block_store: str | None = None,
) -> DataFrame:
    """edges: undirected (src, dst[, weight]) → DataFrame[vertex, component]
    where component = min vertex id of the component.

    ``sig_every``: compute the convergence signature only every k-th round
    (plus a consecutive-round confirmation when two sigs measured k rounds
    apart agree — period-k oscillation through the alternation is not ruled
    out by the potential argument, so equality k>1 apart is treated as a
    HINT, never a stop). Worth >1 only if the signature job costs a
    meaningful fraction of a round; measure before changing the default.
    ``round_walls``: optional list receiving one dict per executed round
    ({"round", "wall", "sig_wall"}) for profiling.

    ``accel_rounds``: number of CSR min-propagation CONTRACTION rounds run
    before the star loop (0 = off, the default). Each star round shuffles
    and rewrites the full O(E) edge set twice; a min-propagation round over
    packed CSR blocks (csr.py) shuffles only the O(V) label frontier — the
    blocks are packed once with one shuffle. After r rounds every vertex
    carries the minimum vertex id of its radius-r ball, so contiguous
    regions collapse: relabeling the edges by their endpoints' labels and
    deduping shrinks the edge set ~(2r)× on chain-rich graphs (measured
    11.6× at r=4 on the transcript bench graph), and the star loop then
    runs on the contracted remainder. Exactness: label[v] is always a
    vertex id inside v's own component, and the component's global minimum
    m always keeps label m (m is the min of its own ball), so (a) every
    contracted-graph vertex id is an original id from the same component,
    and (b) whenever a component spans ≥2 labels, a boundary edge (p,q)
    with label[p]=m injects m into the contracted graph — the star loop's
    min over the contracted component is therefore exactly m, and
    single-label components are their own m. Skipped when ``runner`` is set
    (resume state is the star loop's edge multiset) or when the edge count
    is below ``accel_min_edges``.

    WHEN IT PAYS (measured): the pre-pass moves O(V) per round where a star
    round moves O(E) — so it wins when E ≫ V AND block bytes don't re-enter
    the plan each round, i.e. with ``block_store`` set (the node-resident
    mmap arena, blockstore.py). On the E≈V bench graph it is a wash, and in
    cogroup mode (block_store=None) the per-round O(E) Arrow re-feed eats
    the savings even at E/V=5 — keep it off unless the graph is dense and a
    store path (shared storage on a real cluster, tmpfs locally) is
    available. ``block_store``: directory for the packed blocks; the caller
    owns the lifecycle (drop_block_store when done).

    AQE (round 7): measured A/B at the 1.3M-edge bench graph — star rounds
    run ~1.6x FASTER with AQE ON (11.4-12.3 s vs 17.8-20.9 s for the full
    run), the opposite of pagerank()'s per-superstep finding. The shapes
    differ: pagerank supersteps are fixed-size (AQE re-plans the identical
    query every round for nothing), while star rounds SHRINK the edge set
    round over round, so AQE's runtime broadcast conversion and partition
    coalescing pay more each round. AQE therefore stays at the session
    setting here; do not copy pagerank's AQE-off pattern into this loop."""
    return _connected_components_impl(
        spark, edges, max_rounds, runner, sig_every, round_walls,
        accel_rounds, accel_min_edges, accel_partitions, block_store,
    )


def _connected_components_impl(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int,
    runner,
    sig_every: int,
    round_walls: list | None,
    accel_rounds: int,
    accel_min_edges: int,
    accel_partitions: int,
    block_store: str | None,
) -> DataFrame:
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

    if accel_rounds > 0 and runner is None and e.count() >= accel_min_edges:
        import time as _time

        from cuttana_spark.analytics.csr import gather_min, pack_blocks
        from cuttana_spark.analytics.graphstore import sym_unit_graph

        # Canonical shared payload + synthetic hash map (graphstore.py) —
        # CC needs no Cuttana map, only a consistent routing of edges to
        # their source's partition. Because the map is an EXPRESSION
        # (pmod(xxhash64(v), k)), routing the edges needs no O(E)⋈O(V) join
        # (pack_blocks src_pid=) and the per-round label update needs no
        # re-attach join: partition_id is recomputed from the vertex id for
        # free inside codegen. The payload is built from the ORIGINAL
        # `edges` plan (not the localCheckpointed `e`, whose plan hash is
        # run-specific), so with block_store set the store fingerprint
        # equals k_core_csr's / label_propagation_csr's over the same edges
        # DataFrame and partition count — one pack serves all three.
        sym, vp, _pid_of = sym_unit_graph(edges, accel_partitions)
        if block_store is not None:
            from cuttana_spark.analytics.blockstore import (
                ensure_block_store,
                gather_min_resident,
            )

            ensure_block_store(
                sym, vp, block_store, src_pid=_pid_of(F.col("src")),
                kind="sym-unit",
            )
            blocks = None
            _gather = lambda lbls: gather_min_resident(spark, block_store, lbls)
        else:
            blocks = pack_blocks(sym, vp, src_pid=_pid_of(F.col("src"))).cache()
            blocks.count()  # one O(E) pack shuffle, reused every accel round
            _gather = lambda lbls: gather_min(spark, blocks, lbls)
        # One shuffle per round: the vertex's own label rides in the same
        # union as the gathered neighbor partials, so min-combining them IS
        # the new label relation — no join, no per-round eager checkpoint
        # (the rounds chain lazily like pagerank's fixed-iteration mode and
        # materialize as ONE dag inside the final checkpoint; intermediate
        # rounds persist only as reusable shuffle outputs).
        lck = CheckpointCycler(spark, keep_generations=1)
        labels = lck.checkpoint(vp.withColumn("label", F.col("vertex")))
        for r in range(accel_rounds):
            t0 = _time.monotonic()
            partials = _gather(labels).select("dst", "mlab")
            labels = lck.checkpoint(
                partials.unionAll(
                    labels.select(
                        F.col("vertex").alias("dst"), F.col("label").alias("mlab")
                    )
                )
                .groupBy("dst")
                .agg(F.min("mlab").alias("label"))
                .select(
                    F.col("dst").alias("vertex"),
                    _pid_of(F.col("dst")).alias("partition_id"),
                    "label",
                )
            )
            if round_walls is not None:
                round_walls.append(
                    {
                        "round": -(r + 1),  # accel rounds count down from -1
                        "wall": _time.monotonic() - t0,
                        "sig_wall": 0.0,
                    }
                )
        if blocks is not None:
            blocks.unpersist(False)
        la = labels.select(F.col("vertex").alias("a"), F.col("label").alias("la"))
        lb = labels.select(F.col("vertex").alias("b"), F.col("label").alias("lb"))
        contracted = (
            e.join(la, "a")
            .join(lb, "b")
            .filter(F.col("la") != F.col("lb"))
            .select(
                F.least("la", "lb").alias("src"), F.greatest("la", "lb").alias("dst")
            )
            .distinct()
        )
        # Snapshot persistent-RDD ids around the recursive tail call: the
        # inner star loop's ck.finish() leaves ITS final star forest (and
        # its own nodes cache) pinned — correct while `out` is lazy, a leak
        # once `out` is eagerly re-checkpointed below. Everything persisted
        # by the tail that this cycler does not track is released after the
        # checkpoint (the exact leak class CheckpointCycler exists to stop).
        # SINGLE-THREADED-DRIVER ASSUMPTION (ADVICE r6): the diff-based
        # sweep force-unpersists every RDD registered during the window that
        # neither cycler tracks — caches persisted CONCURRENTLY by other
        # jobs on this SparkSession would be swept too. Entry queries run
        # sequentially so this holds today; a concurrent-driver caller must
        # run CC on its own session (spark.newSession()) or accept the
        # recompute of any cache it fills during this call.
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        before_ids = set(jmap.keys())
        tail = connected_components(
            spark,
            contracted,
            max_rounds=max_rounds,
            sig_every=sig_every,
            round_walls=round_walls,
            accel_rounds=0,
        )
        out = (
            labels.join(
                tail.select(
                    F.col("vertex").alias("label"), F.col("component").alias("_c")
                ),
                "label",
                "left",
            )
            .select("vertex", F.coalesce("_c", "label").alias("component"))
        )
        # eagerly materialize the O(V) result, then release everything it
        # was built from — the original O(E) edge checkpoint, the label
        # chain, the nodes cache, AND the tail call's pinned internals.
        # Residency at return is O(V), matching the star-loop path.
        out = ck.checkpoint(out)
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        tracked = set().union(*ck._gens) if ck._gens else set()
        for rid in set(jmap.keys()) - before_ids - tracked:
            jmap[rid].unpersist(True)
        lck.close()
        nodes.unpersist(False)
        return ck.finish(out)

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

    import time as _time

    # No signature of the INITIAL edge set: its non-canonical form needs a
    # full least/greatest+distinct shuffle just to compare, and it only pays
    # when the input is already a converged star forest — there the loop now
    # runs one (cheap, idempotent) extra round instead.
    prev_sig = None
    prev_rnd = start - 1
    confirming = False
    for rnd in range(start, max_rounds):
        t0 = _time.monotonic()
        e2 = ck.checkpoint(_small_star(_large_star(e)))
        t1 = _time.monotonic()
        measure = (
            confirming
            or (rnd - start) % max(1, sig_every) == sig_every - 1
            or rnd == max_rounds - 1
        )
        changed = True
        sig_wall = 0.0
        if measure:
            sig = _sig(e2, canonical=True)
            sig_wall = _time.monotonic() - t1
            if prev_sig is not None and sig == prev_sig:
                if prev_rnd == rnd - 1:
                    changed = False  # consecutive rounds equal → fixpoint
                else:
                    confirming = True  # k apart equal → confirm next round
            else:
                confirming = False
            prev_sig, prev_rnd = sig, rnd
        e = e2
        if round_walls is not None:
            round_walls.append(
                {"round": rnd, "wall": _time.monotonic() - t0, "sig_wall": sig_wall}
            )
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
