"""Analytics vs networkx / pure-numpy oracles (the reference has no
analytics — SURVEY §0; these implement the north-rule suite)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuttana_spark.analytics.components import connected_components
from cuttana_spark.analytics.labelprop import label_propagation, label_propagation_oracle
from cuttana_spark.analytics.pagerank import pagerank, pagerank_csr
from cuttana_spark.analytics.triangles import triangle_count, triangles_per_vertex


def _ba_graph(n=200, m=3, seed=7):
    import networkx as nx

    return nx.barabasi_albert_graph(n, m, seed=seed)


@pytest.fixture(scope="module")
def G():
    return _ba_graph()


@pytest.fixture(scope="module")
def edges_df(spark, G):
    rows = [(int(u), int(v), 1.0) for u, v in G.edges()]
    return spark.createDataFrame(rows, "src long, dst long, weight double").cache()


def _sym(edges_df):
    return edges_df.unionAll(
        edges_df.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
    )


def _np_pagerank(G, alpha, n_iter, tol=0.0):
    """Power-method oracle with networkx-identical semantics (networkx's
    own pagerank needs scipy, absent in this sandbox): teleport (1-α)/N,
    uniform dangling redistribution, L1 stop err < N·tol."""
    nodes = sorted(G.nodes())
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    x = np.full(n, 1.0 / n)
    deg = np.array([G.degree(v) for v in nodes], float)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for u, v in G.edges():
            contrib[idx[v]] += x[idx[u]] / deg[idx[u]]
            contrib[idx[u]] += x[idx[v]] / deg[idx[v]]
        dangling = x[deg == 0].sum()
        x_new = (1 - alpha) / n + alpha * (contrib + dangling / n)
        err = np.abs(x_new - x).sum()
        x = x_new
        if tol > 0 and err < n * tol:
            break
    return {v: x[idx[v]] for v in nodes}


def test_pagerank_fixed_iterations_matches_numpy(spark, G, edges_df):
    got = {r.vertex: r.score for r in pagerank(spark, _sym(edges_df), max_iter=8, tol=0.0).collect()}
    want = _np_pagerank(G, 0.85, 8)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_converged_matches_oracle(spark, G, edges_df):
    got = {
        r.vertex: r.score
        for r in pagerank(spark, _sym(edges_df), max_iter=100, tol=1e-9).collect()
    }
    want = _np_pagerank(G, 0.85, 200, tol=1e-9)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)


def test_pagerank_csr_matches_dataframe(spark, G, edges_df):
    from cuttana_spark.partition import cuttana_partition

    adj = [(v, sorted(G.neighbors(v))) for v in sorted(G.nodes())]
    res = cuttana_partition(adj, 4)
    vp = res.to_spark_df(spark).select("vertex", "partition_id")
    a = {r.vertex: r.score for r in pagerank(spark, _sym(edges_df), max_iter=6, tol=0.0).collect()}
    b = {
        r.vertex: r.score
        for r in pagerank_csr(spark, _sym(edges_df), vp, max_iter=6, tol=0.0).collect()
    }
    assert set(a) == set(b)
    for v in a:
        assert b[v] == pytest.approx(a[v], abs=1e-12)


def test_connected_components_exact(spark):
    import networkx as nx

    # multi-component graph: three BA blobs + isolated edge chain
    G = nx.Graph()
    for off in (0, 1000, 2000):
        H = _ba_graph(n=60, m=2, seed=off + 1)
        G.add_edges_from((u + off, v + off) for u, v in H.edges())
    G.add_edges_from([(5000, 5001), (5001, 5002)])
    rows = [(int(u), int(v)) for u, v in G.edges()]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {r.vertex: r.component for r in connected_components(spark, df).collect()}
    for comp in nx.connected_components(G):
        rep = min(comp)
        for v in comp:
            assert got[v] == rep
    assert len(got) == G.number_of_nodes()


def test_connected_components_accel_matches_star(spark):
    """The CSR min-propagation contraction pre-pass (accel_rounds>0, forced
    via accel_min_edges=0) must produce the IDENTICAL labelling as the pure
    star loop on a graph that exercises every contraction case: long chains
    (labels still converging when the pre-pass stops), hub blobs (collapse
    to one label → vanish from the contracted graph), singleton-label
    components, and a two-vertex component."""
    import networkx as nx

    G = nx.Graph()
    rs = __import__("random").Random(7)
    # three blobs + two long chains (length > accel rounds) + bridge + pair
    for off in (0, 1000, 2000):
        H = _ba_graph(n=50, m=2, seed=off + 3)
        G.add_edges_from((u + off, v + off) for u, v in H.edges())
    chain1 = [3000 + i for i in range(40)]
    chain2 = [4000 + i for i in range(25)]
    rs.shuffle(chain1)  # random ids along the chain: min is mid-chain
    G.add_edges_from(zip(chain1, chain1[1:]))
    G.add_edges_from(zip(chain2, chain2[1:]))
    G.add_edge(chain1[-1], 17)  # bridge chain1 into blob 0
    G.add_edges_from([(5000, 5001)])
    rows = [(int(u), int(v)) for u, v in G.edges()]
    df = spark.createDataFrame(rows, "src long, dst long")
    base = {r.vertex: r.component for r in connected_components(spark, df).collect()}
    for rounds in (1, 3, 6):
        acc = {
            r.vertex: r.component
            for r in connected_components(
                spark, df, accel_rounds=rounds, accel_min_edges=0, accel_partitions=4
            ).collect()
        }
        assert acc == base, f"accel_rounds={rounds} diverged from star loop"
    for comp in nx.connected_components(G):
        rep = min(comp)
        for v in comp:
            assert base[v] == rep


def test_connected_components_accel_block_store(spark, tmp_path, monkeypatch):
    """block_store mode: the contraction gathers run against the resident
    mmap arena (gather_min_resident) instead of the cogroup — identical
    labelling."""
    import networkx as nx

    monkeypatch.setenv("CUTTANA_BLOCK_ARENA", str(tmp_path / "arena"))
    G = nx.Graph()
    H = _ba_graph(n=80, m=2, seed=11)
    G.add_edges_from(H.edges())
    G.add_edges_from(zip(range(900, 930), range(901, 931)))  # chain
    rows = [(int(u), int(v)) for u, v in G.edges()]
    df = spark.createDataFrame(rows, "src long, dst long")
    base = {r.vertex: r.component for r in connected_components(spark, df).collect()}
    acc = {
        r.vertex: r.component
        for r in connected_components(
            spark,
            df,
            accel_rounds=3,
            accel_min_edges=0,
            accel_partitions=4,
            block_store=str(tmp_path / "ccstore"),
        ).collect()
    }
    assert acc == base


def test_label_propagation_exact(spark, G, edges_df):
    got = {r.vertex: r.label for r in label_propagation(spark, edges_df, max_iter=4).collect()}
    adj = {v: sorted(G.neighbors(v)) for v in G.nodes()}
    want = label_propagation_oracle(adj, max_iter=4)
    assert got == want


def test_label_propagation_csr_exact(spark, G, edges_df):
    """CSR-skeleton LPA must match the pure-Python oracle exactly under an
    arbitrary hash partition map (result is partition-layout-independent)."""
    from cuttana_spark.analytics.labelprop import label_propagation_csr

    vp = (
        edges_df.select(F.col("src").alias("vertex"))
        .unionAll(edges_df.select(F.col("dst").alias("vertex")))
        .distinct()
        .select("vertex", F.pmod(F.hash("vertex"), F.lit(4)).alias("partition_id"))
    )
    got = {
        r.vertex: r.label
        for r in label_propagation_csr(spark, edges_df, vp, max_iter=4).collect()
    }
    adj = {v: sorted(G.neighbors(v)) for v in G.nodes()}
    want = label_propagation_oracle(adj, max_iter=4)
    assert got == want


def test_triangle_count_exact(spark, G, edges_df):
    import networkx as nx

    got = triangle_count(spark, edges_df).first().triangles
    want = sum(nx.triangles(G).values()) // 3
    assert got == want


def test_triangles_per_vertex_exact(spark, G, edges_df):
    import networkx as nx

    got = {r.vertex: r.triangles for r in triangles_per_vertex(spark, edges_df).collect()}
    want = nx.triangles(G)
    assert got == {v: int(c) for v, c in want.items()}


def test_pagerank_resume_bit_identical(spark, G, edges_df, tmp_path):
    """Kill after superstep 3, resume, final state identical to an
    uninterrupted run (north-rule resumability)."""
    from cuttana_spark.analytics.supersteps import SuperstepRunner
    from cuttana_spark.plans.warehouse import Warehouse

    sym = _sym(edges_df)
    base = {r.vertex: r.score for r in pagerank(spark, sym, max_iter=6, tol=0.0).collect()}

    wh = Warehouse(str(tmp_path / "wh"))
    r1 = SuperstepRunner(spark, wh, "pr", interval=1, fail_after=3)
    with pytest.raises(RuntimeError, match="injected failure"):
        pagerank(spark, sym, max_iter=6, tol=0.0, runner=r1)
    assert wh.latest("pr_state").meta["superstep"] == 3

    # the committed snapshot itself reads back bit-identically
    snap3 = {r.vertex: r.score for r in wh.read(spark, "pr_state", snapshot_id=2).collect()}
    assert wh.snapshots("pr_state")[2].meta["superstep"] == 3

    r2 = SuperstepRunner(spark, wh, "pr", interval=1)
    resumed = {
        r.vertex: r.score
        for r in pagerank(spark, sym, max_iter=6, tol=0.0, runner=r2).collect()
    }
    # identical up to float-aggregation order (sum order over shuffle
    # partitions is nondeterministic in any distributed engine; the state
    # VALUES round-trip exactly — only re-executed supersteps re-aggregate)
    assert set(resumed) == set(base)
    for v in base:
        assert resumed[v] == pytest.approx(base[v], abs=1e-12)
    # resume really started from superstep 3, not 0: snapshots continue 4..6
    assert [s.meta["superstep"] for s in wh.snapshots("pr_state")] == [1, 2, 3, 4, 5, 6]
    # lineage recorded per superstep
    lin = wh.read(spark, "pr_lineage")
    assert lin.select("superstep").distinct().count() >= 1


def test_pagerank_dangling_vertices_in_plan(spark):
    """Directed graph with sink vertices: the dangling mass must be
    redistributed uniformly each superstep — now folded into the DAG as a
    broadcast 1-row aggregate (no per-superstep driver action). Oracle:
    direct numpy power iteration on the directed transition matrix."""
    # 0->1, 0->2, 1->2, 3->0 ; vertices 2 is a sink (no out-edges)
    edges = [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0), (3, 0, 1.0)]
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    got = {r.vertex: r.score for r in pagerank(spark, df, max_iter=12, tol=0.0).collect()}

    n, alpha = 4, 0.85
    x = np.full(n, 1.0 / n)
    out = {0: [(1, 0.5), (2, 0.5)], 1: [(2, 1.0)], 3: [(0, 1.0)]}
    for _ in range(12):
        contrib = np.zeros(n)
        for u, lst in out.items():
            for v, p in lst:
                contrib[v] += x[u] * p
        dangling = x[2]  # vertex 2 is the only sink
        x = (1 - alpha) / n + alpha * (contrib + dangling / n)
    for v in range(n):
        assert got[v] == pytest.approx(x[v], abs=1e-12)


def test_k_core_matches_networkx(spark, G, edges_df):
    import networkx as nx

    from cuttana_spark.analytics.kcore import k_core

    core_num = nx.core_number(G)
    for k in (2, 3):
        got = sorted(r.vertex for r in k_core(spark, edges_df, k=k).collect())
        want = sorted(v for v, c in core_num.items() if c >= k)
        assert got == want


def test_k_core_csr_matches_networkx(spark, G, edges_df):
    """CSR-skeleton k-core (frontier-only shuffle) must equal networkx
    core_number exactly; the vertex→partition map is an arbitrary hash
    (partition choice affects locality only, never the result)."""
    import networkx as nx

    from cuttana_spark.analytics.kcore import k_core_csr

    vp = (
        edges_df.select(F.col("src").alias("vertex"))
        .unionAll(edges_df.select(F.col("dst").alias("vertex")))
        .distinct()
        .select("vertex", F.pmod(F.hash("vertex"), F.lit(4)).alias("partition_id"))
    )
    core_num = nx.core_number(G)
    for k in (2, 3):
        got = sorted(r.vertex for r in k_core_csr(spark, edges_df, vp, k=k).collect())
        want = sorted(v for v, c in core_num.items() if c >= k)
        assert got == want


def test_personalized_pagerank_matches_numpy(spark):
    """Random walk with restart from seeds {0}: exact vs a direct numpy
    recurrence on a small weighted digraph (incl. a dangling vertex whose
    mass restarts to the seeds)."""
    from cuttana_spark.analytics.pagerank import personalized_pagerank

    edges = [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 1.0), (3, 0, 1.0)]  # 2 = sink
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    seeds = spark.createDataFrame([(0,)], "vertex long")
    got = {
        r.vertex: r.score
        for r in personalized_pagerank(spark, df, seeds, max_iter=15).collect()
    }

    n, alpha = 4, 0.85
    restart = np.array([1.0, 0, 0, 0])
    x = restart.copy()
    out = {0: [(1, 2 / 3), (2, 1 / 3)], 1: [(2, 1.0)], 3: [(0, 1.0)]}
    for _ in range(15):
        contrib = np.zeros(n)
        for u, lst in out.items():
            for v, p in lst:
                contrib[v] += x[u] * p
        dmass = x[2]
        x = (1 - alpha) * restart + alpha * (contrib + dmass * restart)
    for v in range(n):
        assert got[v] == pytest.approx(x[v], abs=1e-12)
    # mass conserved: scores sum to 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_csr_multichunk_blocks(spark, G, edges_df, monkeypatch):
    """Force CHUNK_EDGES small so every partition block splits into many
    CSR chunk rows — exercises the per-block chunk-merge path in
    scatter_gather (untested at default 2M chunk size) and must still equal
    the DataFrame engine exactly."""
    from cuttana_spark.analytics import csr
    from cuttana_spark.analytics.pagerank import pagerank, pagerank_csr
    from cuttana_spark.partition import cuttana_partition

    monkeypatch.setattr(csr, "CHUNK_EDGES", 64)

    adj = [(v, sorted(G.neighbors(v))) for v in sorted(G.nodes())]
    res = cuttana_partition(adj, 4)
    vp = res.to_spark_df(spark).select("vertex", "partition_id")
    a = {r.vertex: r.score for r in pagerank(spark, _sym(edges_df), max_iter=4, tol=0.0).collect()}
    b = {
        r.vertex: r.score
        for r in pagerank_csr(spark, _sym(edges_df), vp, max_iter=4, tol=0.0).collect()
    }
    assert set(a) == set(b)
    for v in a:
        assert b[v] == pytest.approx(a[v], abs=1e-12)


def test_csr_frontier_mismatch_guard(spark):
    """The sort-free CSR kernel resolves scores positionally, so a frontier
    that is not exactly the packed partition's vertex set must raise, never
    return silently wrong sums."""
    import pytest as _pytest

    from cuttana_spark.analytics.csr import pack_blocks, scatter_gather

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)], "src long, dst long, p double"
    )
    vp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0)], "vertex long, partition_id int"
    )
    blocks = pack_blocks(edges, vp).cache()
    ok = vp.withColumn("score", F.lit(1.0))
    assert scatter_gather(spark, blocks, ok).count() == 3
    missing = ok.filter(F.col("vertex") != 1)  # drop one partition vertex
    with _pytest.raises(Exception, match="frontier vertex set"):
        scatter_gather(spark, blocks, missing).collect()


def test_random_walks_deterministic_replay(spark, G, edges_df):
    """Walks replay exactly in pure Python: next = sorted_nbrs[H(walk|step)
    % degree] with the portable md5-prefix hash; rerunning gives identical
    output (deterministic corpus generation)."""
    import hashlib

    from cuttana_spark.analytics.walks import random_walks

    starts = spark.createDataFrame(
        [(v, v) for v in sorted(G.nodes())[:10]], "walk_id long, vertex long"
    )
    out1 = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in random_walks(spark, edges_df, starts, walk_length=3).collect()
    )
    out2 = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in random_walks(spark, edges_df, starts, walk_length=3).collect()
    )
    assert out1 == out2

    def h64(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    want = []
    for w in sorted(G.nodes())[:10]:
        v = w
        want.append((w, 0, v))
        for step in range(1, 4):
            nbrs = sorted(G.neighbors(v))
            if not nbrs:
                break
            v = nbrs[h64(f"{w}|{step}") % len(nbrs)]
            want.append((w, step, v))
    assert out1 == sorted(want)


def test_iterative_checkpoints_do_not_accumulate(spark):
    """Superseded localCheckpoints must be unpersisted as the loop advances:
    a 25-superstep pagerank (5 checkpoint generations) and a CC run leave
    only the final generation pinned, not one RDD per round. (Leaked pinned
    blocks were the round-2 run-to-run variance root cause.)"""
    from pyspark.sql import functions as F

    from cuttana_spark.analytics.components import connected_components
    from cuttana_spark.analytics.pagerank import pagerank

    sc = spark.sparkContext
    n_pinned = lambda: len(sc._jsc.getPersistentRDDs())

    edges = spark.createDataFrame(
        [(i, (i + 1) % 60, 1.0) for i in range(60)], "src long, dst long, weight double"
    )
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    before = n_pinned()
    pagerank(spark, sym, max_iter=25, tol=0.0).collect()
    assert n_pinned() - before <= 2  # final checkpoint only (+1 slack)

    before = n_pinned()
    connected_components(spark, edges).collect()
    assert n_pinned() - before <= 3  # final edge fixpoint + nodes cache


def test_cycler_spares_upstream_cache_filled_inside_checkpoint_job(spark):
    """An upstream .cache() registers its RDD lazily during its FIRST job —
    which here is the first checkpoint's eager materialization. The cycler
    must not attribute that cached RDD to a checkpoint generation (it would
    be blocking-unpersisted two checkpoints later, silently de-caching a
    live input for every remaining round — the k-core peel regression)."""
    from pyspark.sql import functions as F

    from cuttana_spark.plans.checkpoints import CheckpointCycler

    sc = spark.sparkContext
    pinned = lambda: set(sc._jsc.getPersistentRDDs().keys())

    base = spark.range(500).select(F.col("id").alias("v")).cache()  # lazy
    ck = CheckpointCycler(spark)
    before = pinned()
    state = ck.checkpoint(base.select("v"))  # cache fill happens in this job
    cache_ids = (pinned() - before) - ck._gens[0]
    assert cache_ids, "expected the lazily-filled cache to register here"
    assert ck._gens[0], "checkpoint generation must track its own RDD"
    for i in range(4):  # enough rounds to retire generation 0 twice over
        state = ck.checkpoint(state.select((F.col("v") + 1).alias("v")))
    assert cache_ids <= pinned(), "upstream cache was unpersisted by the cycler"
    state.collect()
    base.unpersist(True)


def test_cycler_close_releases_every_generation(spark):
    """close() retires ALL tracked generations (used by the CC contraction
    pre-pass after the result is re-checkpointed through another cycler)."""
    from pyspark.sql import functions as F

    from cuttana_spark.plans.checkpoints import CheckpointCycler

    sc = spark.sparkContext
    pinned = lambda: set(sc._jsc.getPersistentRDDs().keys())
    before = pinned()
    ck = CheckpointCycler(spark, keep_generations=1)
    state = ck.checkpoint(spark.range(100).select(F.col("id").alias("v")))
    state = ck.checkpoint(state.select((F.col("v") + 1).alias("v")))
    tracked = set().union(*ck._gens)
    assert tracked & pinned(), "expected live checkpoint generations"
    ck.close()
    assert not ck._gens
    assert not (tracked & pinned()), "close() left checkpoint blocks pinned"


def test_pagerank_csr_resident_bit_identical(spark, G, edges_df, tmp_path):
    """The executor-resident block store (blockstore.py) must produce
    BIT-identical scores to the cogroup CSR path — both run the shared
    csr.pr_partials kernel; only the block transport differs."""
    from cuttana_spark.partition import cuttana_partition

    adj = [(v, sorted(G.neighbors(v))) for v in sorted(G.nodes())]
    vp = cuttana_partition(adj, 4).to_spark_df(spark).select("vertex", "partition_id")
    a = {
        r.vertex: r.score
        for r in pagerank_csr(spark, _sym(edges_df), vp, max_iter=6, tol=0.0).collect()
    }
    b = {
        r.vertex: r.score
        for r in pagerank_csr(
            spark,
            _sym(edges_df),
            vp,
            max_iter=6,
            tol=0.0,
            block_store=str(tmp_path / "store"),
        ).collect()
    }
    assert a == b  # exact float equality, not approx


def test_lpa_and_kcore_resident_match_cogroup(spark, tmp_path):
    from cuttana_spark.analytics.kcore import k_core_csr
    from cuttana_spark.analytics.labelprop import label_propagation_csr
    from cuttana_spark.partition import cuttana_partition
    import networkx as nx

    Gm = _ba_graph(n=120, m=2, seed=11)
    rows = [(int(u), int(v)) for u, v in Gm.edges()]
    df = spark.createDataFrame(rows, "src long, dst long")
    adj = [(v, sorted(Gm.neighbors(v))) for v in sorted(Gm.nodes())]
    vp = cuttana_partition(adj, 4).to_spark_df(spark).select("vertex", "partition_id")

    lpa_a = {
        r.vertex: r.label
        for r in label_propagation_csr(spark, df, vp, max_iter=4).collect()
    }
    lpa_b = {
        r.vertex: r.label
        for r in label_propagation_csr(
            spark, df, vp, max_iter=4, block_store=str(tmp_path / "lpa")
        ).collect()
    }
    assert lpa_a == lpa_b

    kc_a = {r.vertex for r in k_core_csr(spark, df, vp, k=3).collect()}
    kc_b = {
        r.vertex
        for r in k_core_csr(
            spark, df, vp, k=3, block_store=str(tmp_path / "kc")
        ).collect()
    }
    assert kc_a == kc_b
    assert kc_a == {v for v, c in nx.core_number(Gm).items() if c >= 3}


def test_block_store_arena_sharing_and_invalidation(spark, tmp_path, monkeypatch):
    """Driver-side unit test of the node-shared arena: the first touch of a
    partition decodes parquet once into the arena; later touches — including
    from a FRESH process cache (another worker) — mmap the arena without
    re-reading parquet; rewriting a store under the same path (new _SUCCESS
    mtime) re-keys the arena; drop_block_store removes every generation."""
    import os as _os
    import time as _time

    import cuttana_spark.analytics.blockstore as B

    monkeypatch.setenv("CUTTANA_BLOCK_ARENA", str(tmp_path / "arena"))
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (3, 0, 1.0)],
        "src long, dst long, weight double",
    ).withColumnRenamed("weight", "p")
    vp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "vertex long, partition_id int"
    )
    path = str(tmp_path / "store")
    B.write_block_store(edges, vp, path)
    B._CACHE.clear()
    calls = {"n": 0}
    real = __import__("pyarrow.parquet", fromlist=["read_table"]).read_table

    def counting(p, *a, **k):
        calls["n"] += 1
        return real(p, *a, **k)

    monkeypatch.setattr("pyarrow.parquet.read_table", counting)
    b1 = B.load_blocks(path, 0)
    assert calls["n"] == 1 and len(b1) == 1
    b2 = B.load_blocks(path, 0)
    assert calls["n"] == 1 and b2 is b1  # handle-cache hit, no re-read
    assert B.load_blocks(path, 99) == []  # missing pid dir -> empty

    # ANOTHER worker (fresh process cache) must hit the shared arena — the
    # parquet decode happens once per NODE, not once per process
    B._CACHE.clear()
    b3 = B.load_blocks(path, 0)
    assert calls["n"] == 1  # no parquet re-read: mmap'd from the arena
    assert [(x["n_verts"], x["v_min"], x["v_max"]) for x in b3] == [
        (x["n_verts"], x["v_min"], x["v_max"]) for x in b1
    ]
    import numpy as _np

    for a in ("src_idx", "ud", "inv", "ps"):
        assert _np.array_equal(_np.asarray(b3[0][a]), _np.asarray(b1[0][a]))

    # rewrite under same path -> new _SUCCESS mtime -> new arena generation
    _time.sleep(0.05)
    B.write_block_store(edges, vp, path)
    _os.utime(_os.path.join(path, "_SUCCESS"))
    before = calls["n"]
    B.load_blocks(path, 0)
    assert calls["n"] == before + 1  # stale key+arena missed, re-decoded

    # drop_block_store removes the store and every arena generation
    B.drop_block_store(path)
    assert not _os.path.exists(path)
    assert _os.listdir(str(tmp_path / "arena")) == []


def test_resident_superstep_plan_has_no_block_scan(spark, tmp_path):
    """The resident superstep's physical plan must contain only the O(V)
    frontier — no parquet scan of block binaries, and exactly the two hash
    exchanges (frontier routing + partial-sum agg)."""
    from cuttana_spark.analytics.blockstore import (
        scatter_gather_resident,
        write_block_store,
    )

    edges = spark.createDataFrame(
        [(0, 1, 0.5), (1, 2, 1.0), (2, 0, 1.0)], "src long, dst long, p double"
    )
    vp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1)], "vertex long, partition_id int"
    )
    path = str(tmp_path / "store")
    write_block_store(edges, vp, path)
    scores = spark.createDataFrame(
        [(0, 0.3, 0), (1, 0.3, 0), (2, 0.4, 1)],
        "vertex long, score double, partition_id int",
    )
    out = scatter_gather_resident(spark, path, scores)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan
    assert plan.count("Exchange") <= 2
    got = {r.dst: r.contrib for r in out.collect()}
    assert got == {1: pytest.approx(0.3 * 0.5), 2: pytest.approx(0.3), 0: pytest.approx(0.4)}


def test_csr_frontier_interior_mismatch_guard(spark):
    """Round-6 ADVICE: a frontier with the same count/min/max as the packed
    partition but a DIFFERENT interior vertex set (packed {0,1,3} vs
    frontier {0,2,3}) must be caught by the v_digest check, never silently
    misattribute scores through the positional gather."""
    import pytest as _pytest

    from cuttana_spark.analytics.csr import pack_blocks, scatter_gather

    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 3, 1.0), (3, 0, 1.0)], "src long, dst long, p double"
    )
    vp = spark.createDataFrame(
        [(0, 0), (1, 0), (3, 0)], "vertex long, partition_id int"
    )
    blocks = pack_blocks(edges, vp).cache()
    bad = spark.createDataFrame(  # same n/min/max envelope, wrong interior
        [(0, 1.0, 0), (2, 1.0, 0), (3, 1.0, 0)],
        "vertex long, score double, partition_id int",
    )
    with _pytest.raises(Exception, match="frontier vertex set"):
        scatter_gather(spark, blocks, bad).collect()
    blocks.unpersist(False)


def test_block_store_fingerprint_repack(spark, tmp_path, monkeypatch):
    """Round-6 ADVICE: ensure_block_store must not reuse a store packed from
    DIFFERENT inputs over the same path — the _CUTTANA_STORE_FP plan-hash
    marker forces a re-pack; matching inputs reuse without rewriting."""
    import os as _os

    import cuttana_spark.analytics.blockstore as B

    monkeypatch.setenv("CUTTANA_BLOCK_ARENA", str(tmp_path / "arena"))
    e1 = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, p double"
    )
    e2 = spark.createDataFrame(  # same vertex set, different edges/weights
        [(0, 2, 0.5), (1, 2, 0.5)], "src long, dst long, p double"
    )
    vp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0)], "vertex long, partition_id int"
    )
    path = str(tmp_path / "store")
    B.ensure_block_store(e1, vp, path)
    k1 = B._store_key(path)
    B.ensure_block_store(e1, vp, path)  # identical inputs -> reused
    assert B._store_key(path) == k1
    B.ensure_block_store(e2, vp, path)  # different inputs -> re-packed
    k2 = B._store_key(path)
    assert k2 != k1
    B._CACHE.clear()
    scores = vp.withColumn("score", F.lit(1.0))
    got = {
        r.dst: r.contrib
        for r in B.scatter_gather_resident(spark, path, scores).collect()
    }
    assert got == {2: pytest.approx(1.0)}  # e2's graph, not e1's
    B.drop_block_store(path)


def test_block_store_arena_budget_eviction(spark, tmp_path, monkeypatch):
    """Round-6: under a tiny injected CUTTANA_ARENA_BYTES budget the arena
    LRU-evicts whole-partition groups instead of growing without bound, and
    supersteps stay correct throughout (evicted partitions are rebuilt on
    demand)."""
    import glob as _glob
    import os as _os

    import numpy as _np

    import cuttana_spark.analytics.blockstore as B

    monkeypatch.setenv("CUTTANA_BLOCK_ARENA", str(tmp_path / "arena"))
    # ~6.4k edges per partition x 16B/edge ~= 100KB/partition across 4 pids
    n = 25600
    edges = spark.range(n).select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % n).alias("dst"),
        F.lit(1.0).alias("p"),
    )
    vp = spark.range(n).select(
        F.col("id").alias("vertex"),
        (F.col("id") % 4).cast("int").alias("partition_id"),
    )
    path = str(tmp_path / "store")
    B.write_block_store(edges, vp, path)
    # budget fits roughly 2 of the 4 partition groups
    monkeypatch.setenv("CUTTANA_ARENA_BYTES", str(220_000))
    B._CACHE.clear()
    expect = {pid: None for pid in range(4)}
    for sweep in range(3):
        for pid in range(4):
            B._CACHE.clear()  # force arena (not handle-cache) hits
            blocks = B.load_blocks(path, pid)
            tot = float(sum(b["ps"].sum() for b in blocks))
            if expect[pid] is None:
                expect[pid] = tot
            assert tot == expect[pid]  # rebuilt content identical
            assert int(sum(b["src_idx"].shape[0] for b in blocks)) == n // 4
    groups = _glob.glob(str(tmp_path / "arena" / "*" / "*.meta.json"))
    assert 0 < len(groups) < 4  # eviction actually happened
    usage = sum(sz for _, sz, _ in B._arena_groups(str(tmp_path / "arena")))
    assert usage <= 220_000
    B.drop_block_store(path)


def test_cc_accel_releases_tail_checkpoints(spark):
    """Round-6 ADVICE: the contraction pre-pass must not leave the recursive
    star-loop tail's checkpoints (or its nodes cache) pinned once the O(V)
    result is re-checkpointed — residency after the call is the result's own
    generation plus whatever was pinned before."""
    import networkx as nx

    from cuttana_spark.analytics.components import connected_components

    G = nx.random_lobster(600, 0.6, 0.3, seed=7)
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in G.edges()], "src long, dst long"
    )
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    before = set(jmap.keys())
    out = connected_components(
        spark, edges, accel_rounds=2, accel_min_edges=1, accel_partitions=4
    )
    got = {r.vertex: r.component for r in out.collect()}
    want = {
        int(v): int(min(c))
        for c in nx.connected_components(G)
        for v in c
    }
    assert got == want
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    new = set(jmap.keys()) - before
    # exactly one new pinned generation: the returned result's checkpoint
    assert len(new) <= 1, f"accel CC leaked {len(new)} persistent RDDs"


def test_kcore_self_loops_consistent(spark):
    """Round-6 ADVICE: inputs containing self-loops must produce the same
    k-core from the join-based and CSR entry points (both drop src==dst, the
    simple-graph convention)."""
    import networkx as nx

    from cuttana_spark.analytics.kcore import k_core, k_core_csr

    G = nx.gnm_random_graph(60, 150, seed=11)
    rows = [(int(a), int(b)) for a, b in G.edges()]
    rows += [(5, 5), (17, 17), (59, 59)]  # self-loops
    edges = spark.createDataFrame(rows, "src long, dst long")
    verts = sorted({v for r in rows for v in r})  # vp must equal the graph's
    vp = spark.createDataFrame(  # exact vertex set (frontier contract)
        [(v, v % 3) for v in verts], "vertex long, partition_id int"
    )
    a = {r.vertex for r in k_core(spark, edges, k=3).collect()}
    b = {r.vertex for r in k_core_csr(spark, edges, vp, k=3).collect()}
    assert a == b
    assert a == {v for v, c in nx.core_number(G).items() if c >= 3}


def test_shared_block_store_serves_kcore_lpa_cc(spark, tmp_path, monkeypatch):
    """Round 6 (VERDICT item 6): k-core, LPA and CC built over the SAME
    edges DataFrame through the canonical sym-unit payload
    (graphstore.sym_unit_graph) share ONE block store — the fingerprint
    matches, so only the first caller packs (store mtime_ns unchanged
    afterwards) — and all three results stay oracle-correct."""
    import networkx as nx

    import cuttana_spark.analytics.blockstore as B
    from cuttana_spark.analytics.components import connected_components
    from cuttana_spark.analytics.kcore import k_core, k_core_csr
    from cuttana_spark.analytics.labelprop import (
        label_propagation,
        label_propagation_csr,
    )

    monkeypatch.setenv("CUTTANA_BLOCK_ARENA", str(tmp_path / "arena"))
    # BA core (min degree 2 -> 2-core converges fast) + a short tail chain
    # that peels round-by-round + a separate component for CC
    G = nx.barabasi_albert_graph(150, 2, seed=13)
    G.add_edges_from(zip(range(900, 906), range(901, 907)))
    G.add_edge(905, 17)
    G.add_edges_from([(2000, 2001), (2001, 2002)])
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in G.edges()], "src long, dst long"
    ).cache()
    store = str(tmp_path / "shared")

    kc = {
        r.vertex
        for r in k_core_csr(
            spark, edges, None, k=2, block_store=store, hash_partitions=4
        ).collect()
    }
    key_after_kcore = B._store_key(store)
    lp = {
        r.vertex: r.label
        for r in label_propagation_csr(
            spark, edges, None, max_iter=3, block_store=store, hash_partitions=4
        ).collect()
    }
    cc = {
        r.vertex: r.component
        for r in connected_components(
            spark,
            edges,
            accel_rounds=2,
            accel_min_edges=1,
            accel_partitions=4,
            block_store=store,
        ).collect()
    }
    # ONE pack: neither LPA nor CC re-wrote the store
    assert B._store_key(store) == key_after_kcore

    assert kc == {r.vertex for r in k_core(spark, edges, k=2).collect()}
    assert lp == {
        r.vertex: r.label
        for r in label_propagation(spark, edges, max_iter=3).collect()
    }
    want = {int(v): int(min(c)) for c in nx.connected_components(G) for v in c}
    assert cc == want
    B.drop_block_store(store)
    edges.unpersist(False)


def test_pagerank_trans_store_shared_across_runs(spark, tmp_path, monkeypatch):
    """Round 7 (VERDICT r6 item 6): pagerank_csr(hash_partitions=) packs the
    canonical transition payload (graphstore.trans_graph) ONCE; a second run
    over the same edges DataFrame reuses the store fingerprint-checked (no
    repack), and scores equal both the vertex_partitions mode and the
    df-join pagerank."""
    import networkx as nx

    import cuttana_spark.analytics.blockstore as B
    from cuttana_spark.analytics.graphstore import hash_partition_expr
    from cuttana_spark.analytics.pagerank import pagerank, pagerank_csr
    from pyspark.sql import functions as F

    monkeypatch.setenv("CUTTANA_BLOCK_ARENA", str(tmp_path / "arena"))
    G = nx.barabasi_albert_graph(120, 2, seed=7)
    und = spark.createDataFrame(
        [(int(a), int(b), 1) for a, b in G.edges()], "src long, dst long, weight long"
    )
    sym = und.unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    ).cache()
    store = str(tmp_path / "trans")

    r1 = {
        r.vertex: r.score
        for r in pagerank_csr(
            spark, sym, None, max_iter=4, tol=0.0,
            block_store=store, hash_partitions=4,
        ).collect()
    }
    key = B._store_key(store)
    with open(f"{store}/{B._FP_MARKER}") as fh:
        assert fh.read().split("|")[1] == "trans"  # payload-kind field
    r2 = {
        r.vertex: r.score
        for r in pagerank_csr(
            spark, sym, None, max_iter=4, tol=0.0,
            block_store=store, hash_partitions=4,
        ).collect()
    }
    assert B._store_key(store) == key, "trans store was re-packed"
    assert r1 == r2
    # same scores as the explicit-map mode and the df-join reference
    pid_of = hash_partition_expr(4)
    vp = (
        sym.select(F.col("src").alias("vertex"))
        .unionAll(sym.select(F.col("dst").alias("vertex")))
        .distinct()
        .select("vertex", pid_of(F.col("vertex")).alias("partition_id"))
    )
    r3 = {
        r.vertex: r.score
        for r in pagerank_csr(spark, sym, vp, max_iter=4, tol=0.0).collect()
    }
    rdf = {
        r.vertex: r.score for r in pagerank(spark, sym, max_iter=4, tol=0.0).collect()
    }
    assert r1 == r3
    assert set(r1) == set(rdf)
    for v, s in r1.items():
        assert abs(s - rdf[v]) < 1e-12
    B.drop_block_store(store)
    sym.unpersist(False)
