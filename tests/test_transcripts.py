"""Fixture generator invariants (FIXTURES.md §1) and the per-row invariant
from BASELINE.json input_hint: per-turn text equality under stable
(conv_id, turn_idx) ordering."""

from __future__ import annotations

from cuttana_spark import transcripts


def test_deterministic():
    a = transcripts.generate_table(50)
    b = transcripts.generate_table(50)
    assert a.equals(b)


def test_golden_graph_counts():
    """N_CONV=2000 must reproduce the measured baseline graph
    (BASELINE.md: 42,193 vertices / 52,726 undirected edges)."""
    edges = transcripts.expected_edges(2000)
    vertices = {v for e in edges for v in e}
    assert len(vertices) == 42193
    assert len(edges) == 52726


def test_text_equality_roundtrip(spark, transcripts_small):
    """Read back via Spark sorted by (conv_id, turn_idx): text must equal
    the pure function of (conv_id, turn_idx) row for row."""
    df = spark.read.parquet(transcripts_small).orderBy("conv_id", "turn_idx")
    rows = df.select("conv_id", "turn_idx", "text").collect()
    expected = sorted(
        ((r["conv_id"], r["turn_idx"]) for r in transcripts.generate_rows(200)),
    )
    assert [(r.conv_id, r.turn_idx) for r in rows] == expected
    for r in rows:
        assert r.text == transcripts.turn_text(r.conv_id, r.turn_idx)


def test_schema_matches_input_hint(spark, transcripts_small):
    df = spark.read.parquet(transcripts_small)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert fields == {
        "conv_id": "string",
        "turn_idx": "int",
        "role": "string",
        "text": "string",
        "tool": "string",
        "ts": "timestamp",
    }
