"""Adjacency-list sources — parity with the reference's VertexStream.

The reference reads `v n1 n2 …` lines (space or comma delimited), skipping
blanks (/root/reference/src/stream.rs:23-55), or wraps an in-memory list
(stream.rs:57-61). Here both become DataFrames with the engine's canonical
adjacency schema (src: long, nbrs: array<long>) — parsed JVM-side with
split/transform, no Python per line — plus converters to/from the canonical
edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def from_csv(spark: SparkSession, path: str, delimiter: str = " ") -> DataFrame:
    """Adjacency file → DataFrame[src, nbrs]. delimiter: " " or ","."""
    lines = spark.read.text(path)
    pat = "\\s+" if delimiter == " " else "\\s*,\\s*"
    toks = F.split(F.trim(F.col("value")), pat)
    return (
        lines.filter(F.trim(F.col("value")) != "")
        .select(
            F.element_at(toks, 1).cast("long").alias("src"),
            F.transform(F.slice(toks, 2, F.size(toks) - 1), lambda x: x.cast("long")).alias(
                "nbrs"
            ),
        )
    )


def from_adjacency_list(spark: SparkSession, data: list[tuple[int, list[int]]]) -> DataFrame:
    """In-memory adjacency (reference stream.rs:57-61) → DataFrame."""
    return spark.createDataFrame(data, "src long, nbrs array<long>")


def to_edges(adj: DataFrame) -> DataFrame:
    """Adjacency → canonical undirected edge table (src < dst, weight).

    A symmetric adjacency lists every undirected edge twice, so weight =
    count/2; if the input lists an edge an odd number of times (asymmetric
    input, or genuine odd multiplicity), halving would floor to 0 and emit
    zero-weight edges that break weighted PageRank downstream — clamp with
    greatest(1, ceil(count/2)) instead.
    """
    e = adj.select("src", F.explode("nbrs").alias("dst"))
    return (
        e.select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(
            F.greatest(F.lit(1), F.ceil(F.count(F.lit(1)) / 2)).cast("long").alias("weight")
        )
    )
