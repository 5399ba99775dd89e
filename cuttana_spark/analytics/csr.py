"""CSR-packed per-partition adjacency blocks + the gather-scatter kernel.

pack_blocks: edges are routed to the Cuttana partition of their SOURCE
vertex (one shuffle, done once) and packed into numpy CSR-ish arrays stored
as binary columns — several chunk rows per partition so a single row never
exceeds ~32 MB even at 10^12-edge scale. Round 5: the two per-superstep
sorts are hoisted to pack time — each chunk stores

  * ``src_idx`` (int32): the position of every edge's source in the
    partition's SORTED vertex array (replaces a per-superstep
    ``searchsorted`` over all edges),
  * ``ud`` (int64) + ``inv`` (int32): the sorted distinct dst array and
    each edge's index into it (replaces a per-superstep ``np.unique`` —
    a full sort of the dst array — per chunk),

so a superstep kernel is just gather + multiply + bincount (all linear,
no sorting), and block bytes drop 24 → 16 per edge — less executor memory
AND less DRAM traffic per superstep, which is the profiled scaling
bottleneck on many-core boxes. ``inv`` is identical to what the old kernel
computed on the fly, and bincount accumulates in the same edge order, so
scores are BIT-IDENTICAL to the unpacked formulation.

The frontier contract this bakes in: every superstep must present exactly
the packed partition's vertex set (sorted by vertex, any arrival order).
Each chunk carries (n_verts, v_min, v_max, v_digest) — v_digest is a
crc32 of the sorted vertex array's bytes, computed at pack time — and the
kernel recomputes the frontier's digest and raises on any mismatch rather
than risk a silently wrong positional lookup. (Count/min/max alone would
admit a frontier with the same envelope but a different interior set,
e.g. packed {0,1,3} vs frontier {0,2,3}; the digest closes that hole.)

scatter_gather: one PageRank-style superstep. Frontier scores (vertex,
score, partition_id) are hash-cogrouped with the cached blocks on
partition_id — the only shuffled side is the O(V) frontier; the O(E) blocks
are cached executor-side. Each block emits at most one row per distinct dst
(map-side combine), which is what bounds hub-vertex skew: the final
groupBy(dst) receives ≤ #blocks rows per hub, never one per edge.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_EDGES = 2_000_000

# bump when the chunk layout changes — blockstore's fingerprint includes it,
# so stores packed by an older layout are repacked, never misread
PACK_VERSION = 2

BLOCK_SCHEMA = (
    "partition_id int, n_verts long, v_min long, v_max long, v_digest long, "
    "src_idx binary, ud binary, inv binary, ps binary"
)

_EMPTY_CONTRIB = {
    "dst": pd.Series(dtype="int64"),
    "contrib": pd.Series(dtype="float64"),
}


def pack_blocks(
    trans: DataFrame, vertex_partitions: DataFrame, src_pid=None
) -> DataFrame:
    """trans: (src, dst, p). Returns chunked CSR blocks per partition_id.

    vertex_partitions must map EXACTLY the graph's vertex set (the Cuttana
    partitioner over the same graph's adjacency does): edges whose source
    has no mapping are dropped by the routing join, and a partition map
    with extra vertices would later fail the kernel's frontier guard.

    src_pid: optional Column computing the source's partition id directly
    from the ``src`` column (e.g. ``pmod(xxhash64(src), k)`` for a synthetic
    hash map). When given, the O(E)⋈O(V) routing join is skipped entirely —
    the caller GUARANTEES the expression equals vertex_partitions' mapping
    (connected_components' contraction pre-pass does: both sides derive
    from the same expression)."""

    def pack(key, edge_pdf: pd.DataFrame, vp_pdf: pd.DataFrame):
        empty = pd.DataFrame(
            {
                "partition_id": pd.Series(dtype="int32"),
                "n_verts": pd.Series(dtype="int64"),
                "v_min": pd.Series(dtype="int64"),
                "v_max": pd.Series(dtype="int64"),
                "v_digest": pd.Series(dtype="int64"),
                "src_idx": pd.Series(dtype=object),
                "ud": pd.Series(dtype=object),
                "inv": pd.Series(dtype=object),
                "ps": pd.Series(dtype=object),
            }
        )
        if edge_pdf.empty:
            return empty
        pid = int(key[0])
        verts = np.sort(vp_pdf["vertex"].to_numpy(np.int64))
        srcs = edge_pdf["src"].to_numpy(np.int64)
        order = np.argsort(srcs, kind="stable")
        srcs = srcs[order]
        dsts = edge_pdf["dst"].to_numpy(np.int64)[order]
        ps = edge_pdf["p"].to_numpy(np.float64)[order]
        pos = np.searchsorted(verts, srcs)
        if pos.size and (
            pos.max() >= verts.shape[0] or not np.array_equal(verts[pos], srcs)
        ):
            raise ValueError(
                f"partition {pid}: edge sources not covered by "
                "vertex_partitions — the partition map must span the graph's "
                "full vertex set"
            )
        pos = pos.astype(np.int32)
        dg = _vertex_digest(verts)
        rows = []
        for lo in range(0, srcs.shape[0], CHUNK_EDGES):
            hi = lo + CHUNK_EDGES
            ud, inv = np.unique(dsts[lo:hi], return_inverse=True)
            rows.append(
                {
                    "partition_id": pid,
                    "n_verts": verts.shape[0],
                    "v_min": int(verts[0]),
                    "v_max": int(verts[-1]),
                    "v_digest": dg,
                    "src_idx": pos[lo:hi].tobytes(),
                    "ud": ud.tobytes(),
                    "inv": inv.astype(np.int32).tobytes(),
                    "ps": ps[lo:hi].tobytes(),
                }
            )
        return pd.DataFrame(rows)

    # alias the routing key so the cogroup's two sides don't share the same
    # partition_id attribute (vertex_partitions feeds both — Spark rejects
    # the ambiguous self-reference otherwise)
    if src_pid is not None:
        routed = trans.select(src_pid.alias("pid"), "src", "dst", "p")
    else:
        routed = trans.join(
            vertex_partitions.withColumnRenamed("vertex", "src"), "src"
        ).select(F.col("partition_id").alias("pid"), "src", "dst", "p")
    return (
        routed.groupby("pid")
        .cogroup(vertex_partitions.groupby("partition_id"))
        .applyInPandas(pack, BLOCK_SCHEMA)
    )


def _vertex_digest(sorted_verts: np.ndarray) -> int:
    """crc32 of the sorted int64 vertex array's bytes — a process-stable,
    O(V) digest that distinguishes interior set differences (count/min/max
    alone cannot). Computed once per partition at pack time and once per
    cogroup call at superstep time; both sides see the identical sorted
    layout, so equal sets ⟺ equal digests (and unequal sets collide with
    crc32's ~2^-32 probability — a guard, not a security boundary)."""
    return int(zlib.crc32(np.ascontiguousarray(sorted_verts, np.int64).tobytes()))


def _sorted_frontier(pdf: pd.DataFrame, value_col: str, dtype) -> tuple:
    sv = pdf["vertex"].to_numpy(np.int64)
    vals = pdf[value_col].to_numpy(dtype)
    order = np.argsort(sv, kind="stable")
    return sv[order], vals[order]


def _check_frontier(row, sv: np.ndarray, sv_digest: int | None = None) -> None:
    if sv_digest is None:
        sv_digest = _vertex_digest(sv)
    if (
        row["n_verts"] != sv.shape[0]
        or row["v_min"] != sv[0]
        or row["v_max"] != sv[-1]
        or row["v_digest"] != sv_digest
    ):
        raise ValueError(
            "frontier vertex set does not match the packed blocks "
            f"(expected {row['n_verts']} verts in [{row['v_min']}, "
            f"{row['v_max']}] digest {row['v_digest']}, got {sv.shape[0]} in "
            f"[{sv[0]}, {sv[-1]}] digest {sv_digest}) — every superstep must "
            "present exactly the full partition vertex set"
        )


def decode_block(row) -> dict:
    """Arrow/parquet row (binary columns) → dict of numpy views. Shared by
    the cogroup steps below and blockstore's resident cache, so both paths
    run the identical kernel bytes."""
    return {
        "n_verts": int(row["n_verts"]),
        "v_min": int(row["v_min"]),
        "v_max": int(row["v_max"]),
        "v_digest": int(row["v_digest"]),
        "src_idx": np.frombuffer(row["src_idx"], np.int32),
        "ud": np.frombuffer(row["ud"], np.int64),
        "inv": np.frombuffer(row["inv"], np.int32),
        "ps": np.frombuffer(row["ps"], np.float64),
    }


def pr_partials(blocks: list, ss: np.ndarray) -> pd.DataFrame:
    """PageRank gather kernel over decoded blocks: per-chunk gather ·
    multiply · bincount, then an order-insensitive np.unique merge of chunk
    partials. ``ss``: frontier scores sorted by vertex (the blocks' order)."""
    outs: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    for b in blocks:
        contrib = ss[b["src_idx"]] * b["ps"]
        ud = b["ud"]
        outs.append(ud)
        out_c.append(
            np.bincount(b["inv"], weights=contrib, minlength=ud.shape[0])
        )
    ud = np.concatenate(outs)
    uc = np.concatenate(out_c)
    if len(outs) > 1:  # merge chunk partials
        ud2, inv = np.unique(ud, return_inverse=True)
        uc = np.bincount(inv, weights=uc)
        ud = ud2
    return pd.DataFrame({"dst": ud, "contrib": uc})


def lpa_partials(blocks: list, lb: np.ndarray) -> pd.DataFrame:
    """Label-count gather kernel over decoded blocks: lexsort by (inv,
    label) + run-length counts — at most one row per (chunk, dst, label).
    ``lb``: frontier labels sorted by vertex."""
    dd, ll, cc = [], [], []
    for b in blocks:
        sl = lb[b["src_idx"]]
        inv, ud = b["inv"], b["ud"]
        idx = np.lexsort((sl, inv))
        d, l = inv[idx], sl[idx]
        brk = np.empty(d.shape[0], bool)
        brk[0] = True
        brk[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
        starts = np.flatnonzero(brk)
        cnts = np.diff(np.append(starts, d.shape[0]))
        dd.append(ud[d[starts]])
        ll.append(l[starts])
        cc.append(cnts)
    return pd.DataFrame(
        {
            "dst": np.concatenate(dd),
            "label": np.concatenate(ll),
            "cnt": np.concatenate(cc),
        }
    )


def min_partials(blocks: list, lb: np.ndarray) -> pd.DataFrame:
    """Min-label gather kernel over decoded blocks: per-dst MINIMUM of the
    gathered source labels — one row per (chunk, dst). Lexsort by (label,
    inv) then keep the first row of each inv run: that row's label is the
    run minimum. Empty-edge chunks contribute nothing. ``lb``: frontier
    labels sorted by vertex. Used by connected_components' contraction
    pre-pass (components.py) — min is duplicate-insensitive, so duplicate
    edges in the packed blocks are harmless."""
    dd, mm = [], []
    for b in blocks:
        sl = lb[b["src_idx"]]
        inv, ud = b["inv"], b["ud"]
        if inv.shape[0] == 0:
            continue
        idx = np.lexsort((sl, inv))
        d, l = inv[idx], sl[idx]
        first = np.empty(d.shape[0], bool)
        first[0] = True
        first[1:] = d[1:] != d[:-1]
        dd.append(ud[d[first]])
        mm.append(l[first])
    if not dd:
        return pd.DataFrame(
            {"dst": pd.Series(dtype="int64"), "mlab": pd.Series(dtype="int64")}
        )
    return pd.DataFrame({"dst": np.concatenate(dd), "mlab": np.concatenate(mm)})


def gather_min(spark, blocks: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-propagation gather: labels (vertex, label, partition_id) ×
    blocks → per-block (dst, mlab) partials. Only the O(V) label frontier is
    shuffled; the global merge is groupBy(dst).min(mlab), which receives at
    most one row per (block, dst) — hub fan-in is bounded exactly as in
    scatter_gather."""

    def step(key, block_pdf: pd.DataFrame, label_pdf: pd.DataFrame):
        empty = pd.DataFrame(
            {"dst": pd.Series(dtype="int64"), "mlab": pd.Series(dtype="int64")}
        )
        if block_pdf.empty or label_pdf.empty:
            return empty
        lv, lb = _sorted_frontier(label_pdf, "label", np.int64)
        dg = _vertex_digest(lv)
        blocks = [decode_block(row) for _, row in block_pdf.iterrows()]
        for b in blocks:
            _check_frontier(b, lv, dg)
        return min_partials(blocks, lb)

    return (
        blocks.groupby("partition_id")
        .cogroup(labels.groupby("partition_id"))
        .applyInPandas(step, "dst long, mlab long")
    )


def gather_label_counts(spark, blocks: DataFrame, labels: DataFrame) -> DataFrame:
    """One label-propagation gather: labels (vertex, label, partition_id) ×
    blocks → per-block (dst, label, cnt) partials, pre-aggregated inside the
    Arrow kernel by lexsort + run-length (no per-edge rows leave the block).
    Only the O(V) label frontier is shuffled; the subsequent global
    groupBy(dst, label) receives ≤ one row per (block, dst, label) — after a
    few supersteps labels collapse and the partial set is ≈O(V), not O(E).
    The ``ps`` weights in the blocks are ignored (LPA counts edges); the
    lexsort groups by ``inv`` instead of raw dsts (same grouping — ud is
    ascending so inv order ≡ dst order — but int32 sorts faster)."""

    def step(key, block_pdf: pd.DataFrame, label_pdf: pd.DataFrame):
        empty = pd.DataFrame(
            {
                "dst": pd.Series(dtype="int64"),
                "label": pd.Series(dtype="int64"),
                "cnt": pd.Series(dtype="int64"),
            }
        )
        if block_pdf.empty or label_pdf.empty:
            return empty
        lv, lb = _sorted_frontier(label_pdf, "label", np.int64)
        dg = _vertex_digest(lv)
        blocks = [decode_block(row) for _, row in block_pdf.iterrows()]
        for b in blocks:
            _check_frontier(b, lv, dg)
        return lpa_partials(blocks, lb)

    return (
        blocks.groupby("partition_id")
        .cogroup(labels.groupby("partition_id"))
        .applyInPandas(step, "dst long, label long, cnt long")
    )


def scatter_gather(spark, blocks: DataFrame, scores: DataFrame) -> DataFrame:
    """One superstep: scores (vertex, score, partition_id) × blocks →
    per-dst partial contributions, pre-aggregated per block. Sort-free:
    score lookup is a precomputed int32 gather, dst grouping a precomputed
    bincount segment-sum (see module docstring; bit-identical to the
    on-the-fly formulation)."""

    def step(key, block_pdf: pd.DataFrame, score_pdf: pd.DataFrame):
        if block_pdf.empty or score_pdf.empty:
            return pd.DataFrame(_EMPTY_CONTRIB)
        sv, ss = _sorted_frontier(score_pdf, "score", np.float64)
        dg = _vertex_digest(sv)
        blocks = [decode_block(row) for _, row in block_pdf.iterrows()]
        for b in blocks:
            _check_frontier(b, sv, dg)
        return pr_partials(blocks, ss)

    partials = (
        blocks.groupby("partition_id")
        .cogroup(scores.groupby("partition_id"))
        .applyInPandas(step, "dst long, contrib double")
    )
    return partials.groupBy("dst").agg(F.sum("contrib").alias("contrib"))
