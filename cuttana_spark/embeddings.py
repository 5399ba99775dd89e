"""Deterministic clustered embedding fixture for ANN benchmarking.

The driver testdata embeddings (sf*) are near-uniform random vectors — top-k
neighbors there have cosine ~0.4 and hyperplane/IVF ANN cannot beat a scan
at high recall (a property of random data, not of the index). Real corpora
(text/image embeddings) are strongly clustered, which is what ANN indexes
exploit. This generator produces that shape at bench scale: `n_clusters`
unit-norm centers, each vector a center plus Gaussian noise, so each
vector's true neighbors share its cluster and land in the same LSH bucket /
IVF cell with high probability.

Deterministic (seeded numpy), written with pyarrow directly — no Spark
needed, same pattern as the transcripts fixture.
"""

from __future__ import annotations

import numpy as np


def clustered_embeddings(
    n: int = 100_000, dim: int = 64, n_clusters: int = 1024, noise: float = 0.25, seed: int = 42
) -> np.ndarray:
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = np.arange(n) % n_clusters
    X = centers[assign] + noise * rng.standard_normal((n, dim))
    return X.astype(np.float32)


def write_parquet(
    path: str,
    n: int = 100_000,
    dim: int = 64,
    n_clusters: int = 1024,
    noise: float = 0.25,
    seed: int = 42,
) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    X = clustered_embeddings(n, dim, n_clusters, noise, seed)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(X.reshape(-1), type=pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
        }
    )
    pq.write_table(table, path)
    return path
