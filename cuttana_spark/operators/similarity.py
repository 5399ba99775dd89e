"""Similarity search over embedding columns (array<float>).

brute_force_topk — exact cosine top-k: query×corpus join with the dot
product computed by JVM-side higher-order functions (zip_with + aggregate)
— no Python in the loop. The baseline and the verifier for the ANN path.

lsh_topk — random-hyperplane LSH: b deterministic hyperplanes (seeded
numpy, shipped as literal arrays) → sign-bit bucket key → candidates share
a bucket (multi-probe over single-bit flips optional) → exact cosine re-rank
within buckets. Scale path: the corpus is hashed once (one narrow column),
queries shuffle only to matching buckets; bucket sizes ~ |corpus|/2^b keep
the re-rank bounded.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    ca, cb = F.col(a).cast("array<double>"), F.col(b).cast("array<double>")
    return df.withColumn(out, _dot(ca, cb) / (_norm(ca) * _norm(cb)))


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10
) -> DataFrame:
    """queries(vec_id, embedding) × corpus(vec_id, embedding) → exact cosine
    top-k per query: (query_id, match_id, cosine, rank). Excludes self."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = corpus.select(F.col("vec_id").alias("match_id"), F.col("embedding").alias("ce"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn(
            "cosine",
            _dot(F.col("qe").cast("array<double>"), F.col("ce").cast("array<double>"))
            / (
                _norm(F.col("qe").cast("array<double>"))
                * _norm(F.col("ce").cast("array<double>"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket(df: DataFrame, dim: int, n_planes: int = 8, seed: int = 42) -> DataFrame:
    """Adds `bucket`: sign-bit key over n_planes random hyperplanes."""
    planes = _hyperplanes(dim, n_planes, seed)
    e = F.col("embedding").cast("array<double>")
    bucket = None
    for j, p in enumerate(planes):
        lit_p = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(e, lit_p) >= 0, F.lit(2**j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn("bucket", bucket.cast("int"))


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank within shared LSH buckets.

    multiprobe=1 probes, for every query, its own bucket plus all buckets at
    Hamming distance 1 (single-bit flips) — the standard recall boost that
    costs (n_planes+1)× candidate lookups instead of more tables."""
    qb = lsh_bucket(queries, dim, n_planes, seed).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), "bucket"
    )
    if multiprobe >= 1:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)],
        )
        qb = qb.select(
            "query_id", "qe", F.explode(probes).alias("bucket")
        )
    cb = lsh_bucket(corpus, dim, n_planes, seed).select(
        F.col("vec_id").alias("match_id"), F.col("embedding").alias("ce"), "bucket"
    )
    scored = (
        qb.join(cb, "bucket")
        .filter(F.col("query_id") != F.col("match_id"))
        .dropDuplicates(["query_id", "match_id"])  # multiprobe can re-find a pair
        .withColumn(
            "cosine",
            _dot(F.col("qe").cast("array<double>"), F.col("ce").cast("array<double>"))
            / (
                _norm(F.col("qe").cast("array<double>"))
                * _norm(F.col("ce").cast("array<double>"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def probe_buckets(bucket, n_planes: int, multiprobe: int):
    """Probe set for a bucket key: the bucket itself, plus all keys at
    Hamming distance <= multiprobe (bit flips). multiprobe=0 -> [bucket]."""
    probes = [bucket]
    if multiprobe >= 1:
        probes += [bucket.bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)]
    if multiprobe >= 2:
        probes += [
            bucket.bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    return F.array(*probes)


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 4,
    multiprobe: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold (vec_a < vec_b),
    LSH-bucketed: each vector hashes to a sign-bit bucket over n_planes
    seeded hyperplanes; side A additionally probes every bucket within
    Hamming distance `multiprobe`; exact cosine verifies candidates that
    share a probed bucket. Work is sum over buckets of |A_bucket|*|B_bucket|
    — sub-quadratic for spread buckets — instead of the all-pairs product.

    Approximate by construction: a pair whose keys differ in more than
    `multiprobe` bits is never compared (recall is a function of
    threshold/planes; near-dup thresholds ~0.9+ keep it near 1). The driver
    oracle replicates the same planes/probes in SQL, so correctness is
    checked against the declared semantics, not against brute force.
    """
    dim = len(df.select("embedding").first()[0])
    base = lsh_bucket(df, dim, n_planes, seed)
    a = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.explode(probe_buckets(F.col("bucket"), n_planes, multiprobe)).alias("bucket"),
    )
    b = base.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])  # probes can re-find a pair
        .withColumn(
            "cosine",
            _dot(F.col("ea").cast("array<double>"), F.col("eb").cast("array<double>"))
            / (
                _norm(F.col("ea").cast("array<double>"))
                * _norm(F.col("eb").cast("array<double>"))
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )
