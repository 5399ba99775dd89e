"""Edge derivation vs the pure-Python oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from cuttana_spark import transcripts
from cuttana_spark.operators import edges as E


def test_transcript_edges_match_oracle(spark, transcripts_small):
    df = spark.read.parquet(transcripts_small)
    keys = E.transcript_edge_keys(df)
    got = {(r.src_key, r.dst_key) for r in keys.collect()}
    assert got == transcripts.expected_edges(200)
    # weights: every pair is unique in this fixture → all weights 1
    assert keys.filter("weight != 1").count() == 0


def test_dense_ids_bijective(spark, transcripts_small):
    df = spark.read.parquet(transcripts_small)
    nodes, eids = E.transcript_edges(df, mode="sort")
    n = nodes.count()
    assert nodes.select("vid").distinct().count() == n
    mm = nodes.agg(F.min("vid").alias("lo"), F.max("vid").alias("hi")).first()
    assert mm.lo == 0 and mm.hi == n - 1
    assert eids.filter("src >= dst").count() == 0  # canonical order, no self-loops


def test_hash_ids_no_collisions(spark, transcripts_small):
    df = spark.read.parquet(transcripts_small)
    keys = E.transcript_edge_keys(df)
    nodes = E.node_ids(keys, mode="hash")
    assert E.check_hash_collisions(nodes) == 0


def test_adjacency_symmetric(spark, transcripts_small):
    df = spark.read.parquet(transcripts_small)
    _, eids = E.transcript_edges(df)
    adj = E.adjacency(eids)
    # sum of degrees == 2 * undirected edge count
    total = adj.agg(F.sum(F.size("nbrs")).alias("s")).first().s
    assert total == 2 * eids.count()


def test_events_sequence_edges(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = E.events_sequence_edges(ev)
    assert e.count() > 0
    assert e.filter("src_key > dst_key").count() == 0


def test_densify_edges_dense_contiguous_ids(spark):
    """densify_edges assigns each distinct vertex a unique dense id 0..n-1
    (sorted order) and remaps edges faithfully."""
    from cuttana_spark.operators.edges import densify_edges

    rows = [(100, 7, 2), (7, 4212, 1), (100, 4212, 3)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight long")
    vmap, dense = densify_edges(edges)
    m = {r.orig: r.vid for r in vmap.collect()}
    assert sorted(m.values()) == [0, 1, 2]
    assert m[7] < m[100] < m[4212]  # sorted assignment
    got = sorted((r.src, r.dst, r.weight) for r in dense.collect())
    want = sorted((m[s], m[d], w) for s, d, w in rows)
    assert got == want
