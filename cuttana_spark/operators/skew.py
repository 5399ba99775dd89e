"""Explicit skew handling: salted two-stage aggregation and skew-aware joins.

AQE's skew-join splitting handles *join* skew at runtime; hub-vertex
*aggregation* skew (a 10^8-degree vertex funneling into one reducer) is
handled here structurally: salt the hot key into `salt` sub-keys, partially
aggregate, then aggregate the partials — the hot reducer receives `salt`
rows instead of 10^8. The CSR PageRank path gets this for free (per-block
partial aggregation); this module provides it for arbitrary DataFrame aggs,
e.g. degree counting over a raw 10^12-row edge stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key: str | list[str],
    value: Column | str,
    out: str = "sum_value",
    salt: int = 64,
) -> DataFrame:
    """groupBy(key).sum(value) computed as a salted two-stage aggregation.

    Stage 1 groups by (key, pmod(xxhash64(rand-ish deterministic cols), salt))
    with map-side combine; stage 2 sums the ≤`salt` partials per key. Results
    are identical to the direct aggregation (tested) — only the shuffle shape
    changes.
    """
    keys = [key] if isinstance(key, str) else list(key)
    value = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.sum(value).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out))


def salted_count(
    df: DataFrame, key: str | list[str], out: str = "count", salt: int = 64
) -> DataFrame:
    return salted_sum(df, key, F.lit(1), out=out, salt=salt)


def skew_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join a huge skewed fact against a small dimension by broadcasting the
    dimension — no shuffle of the big side, skew irrelevant."""
    return big.join(F.broadcast(small), on, how)


def top_hubs(edges: DataFrame, threshold: int = 10_000) -> DataFrame:
    """(vertex, degree) for vertices above a degree threshold — the hot-key
    dictionary to broadcast into salting decisions."""
    deg = (
        edges.select(F.col("src").alias("vertex"))
        .unionAll(edges.select(F.col("dst").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.filter(F.col("degree") >= threshold)
