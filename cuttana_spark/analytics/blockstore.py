"""Executor-resident CSR block store — frontier-only Arrow transfer.

The bucketed-table mode of the CSR path (csr.py, pagerank_csr) elides the
O(E) SHUFFLE each superstep, but still re-scans the block table and re-feeds
every block binary through the Arrow pipe into the Python workers on EVERY
superstep. Measured on a 32M-edge band digraph at local[32]
(jobs/bench_density.py): that transfer dominates — the cogroup superstep is
3-8x slower than the plain DataFrame join even under a perfect partition
map. At 10^12-edge scale the per-superstep O(E) executor→Python transfer is
the bottleneck the whole frontier-only design exists to avoid.

This module fixes it structurally, the way a long-lived cluster would:

* ``write_block_store`` packs the blocks ONCE (csr.pack_blocks — the same
  one-shuffle routing) and lays them out as a parquet dataset partitioned by
  ``partition_id`` — one directory per Cuttana partition, readable without
  Spark by any worker (local disk here; DFS/object store on a cluster).
* ``scatter_gather_resident`` / ``gather_label_counts_resident`` run the
  SAME kernels as csr.py (imported, not copied — bit-identical scores), but
  the superstep is ``applyInPandas`` over the frontier ALONE, grouped by
  partition_id. Blocks never enter the plan: each Python worker loads its
  group's blocks from the store on first touch and keeps the DECODED numpy
  arrays in a process-level LRU cache. Spark reuses Python workers across
  tasks and supersteps (``spark.python.worker.reuse`` defaults to true), so
  after warmup a superstep moves O(V) rows through Arrow and zero block
  bytes — gather·multiply·bincount against memory-resident arrays.

Cache coherence: the cache key includes the store's ``_SUCCESS`` mtime, so
rewriting a store under the same path invalidates stale entries naturally.
Per-worker memory is bounded by ``CUTTANA_BLOCK_CACHE_BYTES`` (default
2 GiB) with LRU eviction; at 1000-executor scale each executor holds only
the partitions it repeatedly serves — the same working-set behavior as a
JVM-cached edge RDD in GraphX, without shipping edges through Python.

The reference (Jacob-Chmura/cuttana, src/partitioner.rs) is the partitioner
that PRODUCES the vertex→partition map; this store is how the analytics
layer monetizes that map's locality at scale.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuttana_spark.analytics.csr import (
    _EMPTY_CONTRIB,
    _check_frontier,
    _sorted_frontier,
    lpa_partials,
    pack_blocks,
    pr_partials,
)

_DEFAULT_CACHE_BYTES = 2 << 30


def write_block_store(
    trans: DataFrame, vertex_partitions: DataFrame, path: str
) -> None:
    """Pack CSR blocks (one edge shuffle, csr.pack_blocks) and write them as
    a parquet dataset partitioned by partition_id. ``trans``: (src, dst, p).
    Overwrites ``path``; the _SUCCESS marker's mtime versions the store for
    every worker-side cache."""
    pack_blocks(trans, vertex_partitions).write.partitionBy(
        "partition_id"
    ).mode("overwrite").parquet(path)


def ensure_block_store(
    trans: DataFrame, vertex_partitions: DataFrame, path: str
) -> None:
    """write_block_store unless ``path`` already holds a completed store.
    Reuse is keyed by path alone (mirrors the bucketed_table contract):
    the caller owns the store's lifecycle, and the kernel's frontier guard
    rejects a store whose vertex set no longer matches the graph."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_block_store(trans, vertex_partitions, path)


# ---------------------------------------------------------------------------
# worker-side block cache (lives in each reused Python worker process)
# ---------------------------------------------------------------------------

_CACHE: "OrderedDict[tuple, tuple[list, int]]" = OrderedDict()
_CACHE_BYTES = 0


def _cache_cap() -> int:
    return int(os.environ.get("CUTTANA_BLOCK_CACHE_BYTES", _DEFAULT_CACHE_BYTES))


def _store_key(path: str) -> tuple:
    p = os.path.abspath(path)
    try:
        mtime = os.path.getmtime(os.path.join(p, "_SUCCESS"))
    except OSError:
        mtime = -1.0
    return (p, mtime)


def _decode_table(tbl) -> tuple[list, int]:
    cols = tbl.to_pydict()
    blocks, nbytes = [], 0
    for i in range(tbl.num_rows):
        b = {
            "n_verts": int(cols["n_verts"][i]),
            "v_min": int(cols["v_min"][i]),
            "v_max": int(cols["v_max"][i]),
            "src_idx": np.frombuffer(cols["src_idx"][i], np.int32),
            "ud": np.frombuffer(cols["ud"][i], np.int64),
            "inv": np.frombuffer(cols["inv"][i], np.int32),
            "ps": np.frombuffer(cols["ps"][i], np.float64),
        }
        nbytes += (
            b["src_idx"].nbytes + b["ud"].nbytes + b["inv"].nbytes + b["ps"].nbytes
        )
        blocks.append(b)
    return blocks, nbytes


def load_blocks(path: str, pid: int) -> list:
    """Decoded CSR blocks for one partition, via the process-level LRU.
    Missing partition directory (a partition with vertices but no edges, or
    the pid=-1 dangling bucket) → []. Chunk-row order within a partition is
    irrelevant to the kernels (cross-chunk merge is np.unique-keyed)."""
    global _CACHE_BYTES
    key = (_store_key(path), int(pid))
    hit = _CACHE.get(key)
    if hit is not None:
        _CACHE.move_to_end(key)
        return hit[0]
    part_dir = os.path.join(path, f"partition_id={int(pid)}")
    if os.path.isdir(part_dir):
        import pyarrow.parquet as pq

        blocks, nbytes = _decode_table(pq.read_table(part_dir))
    else:
        blocks, nbytes = [], 0
    _CACHE[key] = (blocks, nbytes)
    _CACHE_BYTES += nbytes
    while _CACHE_BYTES > _cache_cap() and len(_CACHE) > 1:
        _, (_, old_bytes) = _CACHE.popitem(last=False)
        _CACHE_BYTES -= old_bytes
    return blocks


# ---------------------------------------------------------------------------
# resident supersteps — frontier-only Arrow transfer
# ---------------------------------------------------------------------------


def scatter_gather_resident(
    spark: SparkSession, store_path: str, scores: DataFrame
) -> DataFrame:
    """One PageRank-style superstep against the resident store. Same math as
    csr.scatter_gather (shared pr_partials kernel); the plan's only inputs
    are the O(V) frontier (one hash exchange on partition_id) and the
    partial-sum exchange of the final groupBy(dst) — block bytes never enter
    the plan."""

    def step(key, pdf: pd.DataFrame):
        blocks = load_blocks(store_path, int(key[0]))
        if not blocks or pdf.empty:
            return pd.DataFrame(_EMPTY_CONTRIB)
        sv, ss = _sorted_frontier(pdf, "score", np.float64)
        for b in blocks:
            _check_frontier(b, sv)
        return pr_partials(blocks, ss)

    partials = scores.groupby("partition_id").applyInPandas(
        step, "dst long, contrib double"
    )
    return partials.groupBy("dst").agg(F.sum("contrib").alias("contrib"))


def gather_label_counts_resident(
    spark: SparkSession, store_path: str, labels: DataFrame
) -> DataFrame:
    """One label-propagation gather against the resident store (shared
    lpa_partials kernel; see csr.gather_label_counts for semantics)."""

    def step(key, pdf: pd.DataFrame):
        blocks = load_blocks(store_path, int(key[0]))
        if not blocks or pdf.empty:
            return pd.DataFrame(
                {
                    "dst": pd.Series(dtype="int64"),
                    "label": pd.Series(dtype="int64"),
                    "cnt": pd.Series(dtype="int64"),
                }
            )
        lv, lb = _sorted_frontier(pdf, "label", np.int64)
        for b in blocks:
            _check_frontier(b, lv)
        return lpa_partials(blocks, lb)

    return labels.groupby("partition_id").applyInPandas(
        step, "dst long, label long, cnt long"
    )
