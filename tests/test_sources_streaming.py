"""Adjacency sources (reference S1/S2 parity) + streaming edge derivation."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cuttana_spark.sources import adjacency as A


def test_from_csv_space_delimited(spark, tmp_path):
    p = tmp_path / "g.adj"
    p.write_text("0 1 2\n\n1 0\n2 0\n")  # blank line skipped (stream.rs:32-34)
    df = A.from_csv(spark, str(p)).orderBy("src")
    rows = [(r.src, r.nbrs) for r in df.collect()]
    assert rows == [(0, [1, 2]), (1, [0]), (2, [0])]


def test_from_csv_comma_delimited(spark, tmp_path):
    p = tmp_path / "g.csv"
    p.write_text("5, 6 ,7\n6,5\n7,5\n")
    df = A.from_csv(spark, str(p), delimiter=",").orderBy("src")
    rows = [(r.src, sorted(r.nbrs)) for r in df.collect()]
    assert rows == [(5, [6, 7]), (6, [5]), (7, [5])]


def test_csv_to_partitioner_end_to_end(spark, tmp_path):
    """The reference unit-test flow (tests/partition_tests.rs) through the
    Spark source: CSV → adjacency DF → partitioner."""
    from cuttana_spark.partition import cuttana_partition_df

    p = tmp_path / "g.adj"
    p.write_text("0 1 2\n1 0\n2 0\n")
    adj = A.from_csv(spark, str(p))
    res = cuttana_partition_df(adj, 16)
    assert res.vertex_count == 3 and res.edge_count == 4


def test_to_edges_roundtrip(spark):
    adj = A.from_adjacency_list(spark, [(0, [1, 2]), (1, [0]), (2, [0])])
    e = {(r.src, r.dst, r.weight) for r in A.to_edges(adj).collect()}
    assert e == {(0, 1, 1), (0, 2, 1)}


def test_streaming_edges_equal_batch(spark, sf_dir, tmp_path):
    """Structured-Streaming incremental edges == batch window-lag derivation
    after aggregation (availableNow trigger → deterministic, bounded)."""
    from cuttana_spark.streaming.edge_stream import materialize_stream, run_batch_equivalent

    src_dir = str(tmp_path / "events_in")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.write.mode("overwrite").parquet(src_dir)

    out_dir = str(tmp_path / "edges_out")
    materialize_stream(spark, src_dir, str(tmp_path / "ckpt"), out_dir)

    streamed = (
        spark.read.parquet(out_dir)
        .groupBy("src_key", "dst_key")
        .agg(F.sum("weight").alias("weight"))
    )
    batch = run_batch_equivalent(spark, ev)
    got = {(r.src_key, r.dst_key, r.weight) for r in streamed.collect()}
    want = {(r.src_key, r.dst_key, r.weight) for r in batch.collect()}
    assert got == want
