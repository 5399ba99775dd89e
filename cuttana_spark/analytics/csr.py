"""CSR-packed per-partition adjacency blocks + the gather-scatter kernel.

pack_blocks: edges are routed to the Cuttana partition of their SOURCE
vertex (one shuffle, done once) and packed into numpy CSR-ish arrays stored
as binary columns — several chunk rows per partition so a single row never
exceeds ~16 MB even at 10^12-edge scale.

scatter_gather: one PageRank-style superstep. Frontier scores (vertex,
score, partition_id) are hash-cogrouped with the cached blocks on
partition_id — the only shuffled side is the O(V) frontier; the O(E) blocks
are cached executor-side. Inside the Arrow UDF everything is numpy:
searchsorted score lookup, vectorized multiply, bincount segment-sum. Each
block emits at most one row per distinct dst (map-side combine), which is
what bounds hub-vertex skew: the final groupBy(dst) receives ≤ #blocks rows
per hub, never one per edge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_EDGES = 2_000_000

BLOCK_SCHEMA = (
    "partition_id int, srcs binary, dsts binary, ps binary"
)


def pack_blocks(trans: DataFrame, vertex_partitions: DataFrame) -> DataFrame:
    """trans: (src, dst, p). Returns chunked CSR blocks per partition_id."""

    def pack(key, pdf: pd.DataFrame):
        pid = int(key[0])
        srcs = pdf["src"].to_numpy(np.int64)
        order = np.argsort(srcs, kind="stable")
        srcs = srcs[order]
        dsts = pdf["dst"].to_numpy(np.int64)[order]
        ps = pdf["p"].to_numpy(np.float64)[order]
        rows = []
        for lo in range(0, srcs.shape[0], CHUNK_EDGES):
            hi = lo + CHUNK_EDGES
            rows.append(
                {
                    "partition_id": pid,
                    "srcs": srcs[lo:hi].tobytes(),
                    "dsts": dsts[lo:hi].tobytes(),
                    "ps": ps[lo:hi].tobytes(),
                }
            )
        return pd.DataFrame(rows)

    routed = trans.join(
        vertex_partitions.withColumnRenamed("vertex", "src"), "src"
    ).select("partition_id", "src", "dst", "p")
    return routed.groupBy("partition_id").applyInPandas(pack, BLOCK_SCHEMA)


def gather_label_counts(spark, blocks: DataFrame, labels: DataFrame) -> DataFrame:
    """One label-propagation gather: labels (vertex, label, partition_id) ×
    blocks → per-block (dst, label, cnt) partials, pre-aggregated inside the
    Arrow kernel by lexsort + run-length (no per-edge rows leave the block).
    Only the O(V) label frontier is shuffled; the subsequent global
    groupBy(dst, label) receives ≤ one row per (block, dst, label) — after a
    few supersteps labels collapse and the partial set is ≈O(V), not O(E).
    The `ps` weights in the blocks are ignored (LPA counts edges)."""

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
        lv = label_pdf["vertex"].to_numpy(np.int64)
        lb = label_pdf["label"].to_numpy(np.int64)
        order = np.argsort(lv, kind="stable")
        lv, lb = lv[order], lb[order]
        dd, ll, cc = [], [], []
        for _, row in block_pdf.iterrows():
            srcs = np.frombuffer(row["srcs"], np.int64)
            dsts = np.frombuffer(row["dsts"], np.int64)
            sl = lb[np.searchsorted(lv, srcs)]
            idx = np.lexsort((sl, dsts))
            d, l = dsts[idx], sl[idx]
            brk = np.empty(d.shape[0], bool)
            brk[0] = True
            brk[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
            starts = np.flatnonzero(brk)
            cnts = np.diff(np.append(starts, d.shape[0]))
            dd.append(d[starts])
            ll.append(l[starts])
            cc.append(cnts)
        return pd.DataFrame(
            {
                "dst": np.concatenate(dd),
                "label": np.concatenate(ll),
                "cnt": np.concatenate(cc),
            }
        )

    return (
        blocks.groupby("partition_id")
        .cogroup(labels.groupby("partition_id"))
        .applyInPandas(step, "dst long, label long, cnt long")
    )


def scatter_gather(spark, blocks: DataFrame, scores: DataFrame) -> DataFrame:
    """One superstep: scores (vertex, score, partition_id) × blocks →
    per-dst partial contributions, pre-aggregated per block."""

    def step(key, block_pdf: pd.DataFrame, score_pdf: pd.DataFrame):
        if block_pdf.empty or score_pdf.empty:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"), "contrib": pd.Series(dtype="float64")})
        sv = score_pdf["vertex"].to_numpy(np.int64)
        ss = score_pdf["score"].to_numpy(np.float64)
        order = np.argsort(sv, kind="stable")
        sv, ss = sv[order], ss[order]
        outs: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for _, row in block_pdf.iterrows():
            srcs = np.frombuffer(row["srcs"], np.int64)
            dsts = np.frombuffer(row["dsts"], np.int64)
            ps = np.frombuffer(row["ps"], np.float64)
            s = ss[np.searchsorted(sv, srcs)]
            contrib = s * ps
            ud, inv = np.unique(dsts, return_inverse=True)
            outs.append(ud)
            out_c.append(np.bincount(inv, weights=contrib))
        ud = np.concatenate(outs)
        uc = np.concatenate(out_c)
        if len(outs) > 1:  # merge chunk partials
            ud2, inv = np.unique(ud, return_inverse=True)
            uc = np.bincount(inv, weights=uc)
            ud = ud2
        return pd.DataFrame({"dst": ud, "contrib": uc})

    partials = (
        blocks.groupby("partition_id")
        .cogroup(scores.groupby("partition_id"))
        .applyInPandas(step, "dst long, contrib double")
    )
    return partials.groupBy("dst").agg(F.sum("contrib").alias("contrib"))
