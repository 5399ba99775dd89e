"""Canonical shared pack payload for the CSR block store.

k-core, label propagation and connected components all gather over the SAME
logical graph — the symmetric, self-loop-free, unit-weight view of the edge
table — yet through round 5 each entry point built its own (trans, vp) with
slightly different plans, so `blockstore.store_fingerprint` could never
match across algorithms and every caller re-packed its own store. This
module is the descriptor that makes one pack serve all three: callers that
build their payload through `sym_unit_graph` over the SAME edges DataFrame
and the same partition count produce semantically identical plans, so
`ensure_block_store` reuses the existing pack (fingerprint equality) and a
pipeline like pagerank → k-core → CC pays the O(E) routing shuffle once.

The partition map is an EXPRESSION (pmod(xxhash64(v), k)) rather than a
joined table: routing the edges needs no O(E)⋈O(V) join (csr.pack_blocks
src_pid=), per-round frontier updates recompute partition_id in codegen for
free (components.py's joinless update), and two algorithms agree on the map
by construction. Partition quality (Cuttana map) only affects locality,
never results — callers that want Cuttana locality pass vertex_partitions
explicitly and forgo cross-algorithm sharing.

PageRank packs transition WEIGHTS (p = w/deg), a different payload that
correctly hashes to its own store — `trans_graph` (round 7) is its
canonical descriptor over the SAME hash routing family, so a
pagerank → k-core → LPA → CC pipeline pays exactly TWO packs (sym-unit +
trans), each reused fingerprint-checked by every consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_partition_expr(n_partitions: int):
    """Column-expression partition map: vertex → pmod(xxhash64(v), k)."""

    def pid_of(col):
        return F.pmod(F.xxhash64(col), F.lit(n_partitions)).cast("int")

    return pid_of


def sym_unit_graph(edges: DataFrame, n_partitions: int):
    """Canonical (trans, vp, pid_of) for the shared sym-unit store.

    trans: both directions of every edge, self-loops dropped (the simple-
    graph convention all three consumers share), p = 1.0.
    vp: EVERY endpoint of `edges` (including vertices whose only edges were
    self-loops — they must stay in the frontier: the packed blocks carry the
    vp vertex set and the kernel's digest guard demands frontier ≡ packed
    set). Their gathered count/partials are simply empty.
    """
    pid_of = hash_partition_expr(n_partitions)
    sym = (
        edges.select("src", "dst")
        .unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
    )
    trans = sym.withColumn("p", F.lit(1.0))
    nodes = (
        edges.select(F.col("src").alias("vertex"))
        .unionAll(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    vp = nodes.select("vertex", pid_of(F.col("vertex")).alias("partition_id"))
    return trans, vp, pid_of


def trans_graph(edges: DataFrame, n_partitions: int):
    """Canonical (trans, vp, pid_of) for the transition-weighted store —
    PageRank's payload — over the SAME hash routing family as
    sym_unit_graph (round 7, VERDICT r6 item 6).

    trans: column-stochastic p = w / Σ_src w over the DIRECTED edge table
    exactly as pagerank_csr builds it (window over src — bit-identical p on
    count-weighted graphs); vp: every endpoint, expression-mapped. Two
    callers passing the SAME edges DataFrame and k produce semantically
    identical plans, so `ensure_block_store` reuses one pack across repeated
    PageRank runs, and a pagerank → k-core → LPA → CC pipeline pays exactly
    two packs total (this one + sym_unit_graph's)."""
    from pyspark.sql import Window

    pid_of = hash_partition_expr(n_partitions)
    e = edges.select("src", "dst", F.col("weight").cast("double"))
    trans = e.select(
        "src",
        "dst",
        (F.col("weight") / F.sum("weight").over(Window.partitionBy("src"))).alias("p"),
    )
    nodes = (
        e.select(F.col("src").alias("vertex"))
        .unionAll(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    vp = nodes.select("vertex", pid_of(F.col("vertex")).alias("partition_id"))
    return trans, vp, pid_of
