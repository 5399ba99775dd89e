"""Vectorized mini-batch Cuttana partitioner — the throughput/scale path.

Same algorithm as core.CuttanaPartitioner (FENNEL global pick + local
sub-partition pick + buffered deferral + refinement), but the buffer drain —
where virtually all assignment work happens at the default config
(buffer_degree_threshold=100 buffers everything below 100-degree,
/root/reference/src/cuttana.rs:33-38) — processes the top-`batch_size`
buffered vertices per step against a state *snapshot*, with every inner step
a numpy array operation. No per-vertex Python in the drain.

Exactness notes vs the sequential core:
  * insert score + incremental bumps telescope: score_at_drain =
    θ·(assigned_nbrs_now/deg) + deg/threshold exactly (each neighbor
    assignment bumps θ/deg — /root/reference/src/buffer.rs:150-168), so
    computing scores lazily at drain start is EXACT while no evictions
    happen mid-stream; when the buffered population exceeds
    cfg.max_buffer_size the whole buffer is drained mid-stream with running
    metrics at that position (the reference evicts ONE vertex per overflowing
    insert — batched semantics drain the full buffer at the same trigger
    point, an approximation in the same spirit as batch-snapshot scoring);
  * within a batch, sizes/neighbor assignments are frozen at the snapshot —
    the B vertices of a batch don't see each other (quality validated
    against the golden bands in tests, which is also how we validate the
    sequential core against the reference's RNG nondeterminism);
  * seed fallback (no scored candidate) water-fills the smallest
    partitions/sub-partitions in stable size order, which reproduces the
    sequential argmin-then-increment behavior whenever ties are dense;
  * streaming cut_count misses edges internal to one batch (both endpoints
    unassigned at the snapshot) — the exact post-hoc cut from
    metrics.exact_metrics is authoritative in batch mode;
  * sub↔sub edge weights are rebuilt *exactly* from the final assignment in
    one vectorized pass at finish (strictly better input to refinement than
    the reference's stream-time accumulation, which misses cross-partition
    weights entirely — /root/reference/src/partition.rs:50-62).
"""

from __future__ import annotations

import numpy as np

from cuttana_spark.partition.config import CuttanaConfig
from cuttana_spark.partition.core import PartitionResult
from cuttana_spark.partition.refine import RefineInput, run_refinement


def _gather_flat(indptr: np.ndarray, indices: np.ndarray, verts: np.ndarray):
    """CSR gather: neighbors of `verts` flattened + segment ids."""
    lens = indptr[verts + 1] - indptr[verts]
    total = int(lens.sum())
    seg = np.repeat(np.arange(verts.shape[0]), lens)
    # ranges trick: start offsets repeated + within-segment arange
    starts = indptr[verts]
    pos = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens) + np.repeat(starts, lens)
    return indices[pos], seg, lens


class BatchedCuttanaPartitioner:
    def __init__(
        self,
        num_partitions: int,
        config: CuttanaConfig | None = None,
        batch_size: int = 1024,
    ):
        self.k = num_partitions
        self.cfg = config or CuttanaConfig()
        self.S = self.cfg.num_sub_partitions
        self.slack1 = self.cfg.phase1_slack
        self.batch_size = batch_size
        self.rng = np.random.default_rng(self.cfg.seed)
        self._src_chunks: list[np.ndarray] = []
        self._len_chunks: list[np.ndarray] = []
        self._val_chunks: list[np.ndarray] = []

    # -- ingest ---------------------------------------------------------------

    def add_batch(self, src: np.ndarray, offsets: np.ndarray, values: np.ndarray) -> None:
        self._src_chunks.append(np.asarray(src, np.int64))
        self._len_chunks.append(np.diff(np.asarray(offsets, np.int64)))
        self._val_chunks.append(np.asarray(values, np.int64))

    # -- run ------------------------------------------------------------------

    def finish(self) -> PartitionResult:
        k, S, cfg = self.k, self.S, self.cfg
        stream_src = np.concatenate(self._src_chunks) if self._src_chunks else np.empty(0, np.int64)
        lens = np.concatenate(self._len_chunks) if self._len_chunks else np.empty(0, np.int64)
        flat_vals = np.concatenate(self._val_chunks) if self._val_chunks else np.empty(0, np.int64)
        n_stream = stream_src.shape[0]

        # densify ids (vectorized; first-seen order is irrelevant to the
        # algorithm — only score ties depend on id order, and those are RNG
        # in the reference)
        uniq = np.unique(np.concatenate([stream_src, flat_vals]))
        n = uniq.shape[0]
        vs = np.searchsorted(uniq, stream_src)
        indices = np.searchsorted(uniq, flat_vals)
        indptr = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)

        assign = np.full(n, -1, np.int32)
        sub_assign = np.full(n, -1, np.int32)
        sizes = np.zeros(k, np.int64)
        sub_sizes = np.zeros(k * S, np.int64)
        deg = np.zeros(n, np.int64)
        deg[vs] = lens

        vc_total = n_stream
        ec_total = int(lens.sum())
        self.vertex_count, self.edge_count = vc_total, ec_total
        cut_count = 0

        # ---- stream phase: immediate partitioning of high-degree vertices
        # with *running* metrics (they're rare; per-vertex numpy is fine)
        high = lens >= cfg.buffer_degree_threshold
        cum_v = np.arange(1, n_stream + 1)
        cum_e = np.cumsum(lens)
        gamma = cfg.gamma

        def _assign_high(i: int) -> None:
            nonlocal cut_count
            vi = vs[i]
            ni = indices[indptr[i] : indptr[i + 1]]
            vc, ec = int(cum_v[i]), int(cum_e[i])
            thr = (1.0 + self.slack1) * vc / k
            parts = assign[ni]
            ap = parts[parts >= 0]
            counts = np.bincount(ap, minlength=k)
            ag = (k ** (gamma - 1.0) * vc / ec**gamma) * gamma if ec else 0.0
            cost = ag * sizes.astype(np.float64) ** (gamma - 1.0)
            room = sizes < thr
            if not room.any():
                raise RuntimeError("Partition capacity exceeded.")
            scores = np.where(room & (counts > 0), counts - cost, -np.inf)
            seed = int(np.argmin(sizes))
            best = int(np.argmax(scores))
            if scores[best] <= -cost[seed]:
                best = seed
            assign[vi] = best
            sizes[best] += 1
            cut_count += int(ap.shape[0] - counts[best])
            # local pick for hubs: most-connected sub with room, else smallest
            ssz = sub_sizes[best * S : (best + 1) * S]
            subs = sub_assign[ni[(parts == best)]]
            subs = subs[subs >= 0]
            v_eff = vc // k
            sub_thr = (1.0 + self.slack1) * v_eff / S
            bs = -1
            if subs.shape[0]:
                sv, sc = np.unique(subs, return_counts=True)
                okm = ssz[sv] < sub_thr
                if okm.any():
                    bs = int(sv[okm][np.argmax(sc[okm])])
            if bs < 0:
                bs = int(np.argmin(ssz))
            sub_assign[vi] = bs
            ssz[bs] += 1

        # ---- drain machinery: batched top-score eviction over whatever is
        # currently buffered, with FENNEL metrics frozen at (vc_now, ec_now)
        buffered = np.zeros(n, bool)
        buf_score = np.full(n, -np.inf)

        # map dense vertex -> stream row (for CSR slices during drain)
        row_of = np.full(n, -1, np.int64)
        row_of[vs] = np.arange(n_stream)

        def _score_buffered(rows: np.ndarray) -> None:
            """Exact drain-start scores for newly-buffered stream rows (the
            telescoped formula — see module docstring)."""
            if rows.shape[0] == 0:
                return
            bvs = vs[rows]
            nb, seg, blens = _gather_flat(indptr, indices, rows)
            assigned = (assign[nb] >= 0).astype(np.int64)
            n_assigned = np.zeros(rows.shape[0], np.int64)
            np.add.at(n_assigned, seg, assigned)
            safe = np.maximum(blens, 1)
            buf_score[bvs] = (
                cfg.theta * (n_assigned / safe) + blens / cfg.buffer_degree_threshold
            )

        def _drain(vc_now: int, ec_now: int) -> None:
            nonlocal cut_count, sizes
            thr_v = (1.0 + self.slack1) * vc_now / k
            v_eff = vc_now // k
            sub_thr = (1.0 + self.slack1) * v_eff / S
            ag = (k ** (gamma - 1.0) * vc_now / ec_now**gamma) * gamma if ec_now else 0.0

            n_buf = int(buffered.sum())
            # adaptive batch: staleness is relative (B/n), so large graphs can
            # take proportionally larger batches at equal quality
            B = max(self.batch_size, n_buf // 128)
            while n_buf > 0:
                b = min(B, n_buf)
                # select top-b among *buffered only* (argpartition over the
                # compacted candidate set, not the full vertex range)
                cand_idx = np.flatnonzero(buffered)
                if b < cand_idx.shape[0]:
                    sub = np.argpartition(-buf_score[cand_idx], b - 1)[:b]
                    cand = cand_idx[sub]
                else:
                    cand = cand_idx
                    b = cand.shape[0]
                rows = row_of[cand]
                nb, seg, _ = _gather_flat(indptr, indices, rows)

                parts = assign[nb]
                valid = parts >= 0
                C = np.zeros((b, k), np.int64)
                np.add.at(C, (seg[valid], parts[valid]), 1)

                cost = ag * sizes.astype(np.float64) ** (gamma - 1.0)
                room = sizes < thr_v
                if not room.any():
                    raise RuntimeError("Partition capacity exceeded.")
                scores = np.where(room[None, :] & (C > 0), C - cost[None, :], -np.inf)
                best = np.argmax(scores, axis=1).astype(np.int32)
                row_max = scores[np.arange(b), best]
                seed_cost = -cost[np.argmin(sizes)]
                fallback = row_max < seed_cost  # no candidate beats the seed
                if fallback.any():
                    # water-fill the smallest partitions *with room* (stable),
                    # emulating sequential argmin-increment
                    roomy = np.flatnonzero(room)
                    order = roomy[np.argsort(sizes[roomy], kind="stable")]
                    fb = np.flatnonzero(fallback)
                    best[fb] = order[np.arange(fb.shape[0]) % order.shape[0]].astype(np.int32)

                vset = cand
                assign[vset] = best
                sizes += np.bincount(best, minlength=k)

                # streaming cut (batch-internal edges not visible — see docstring)
                nv = np.zeros(b, np.int64)
                np.add.at(nv, seg[valid], 1)
                cut_count += int((nv - C[np.arange(b), best]).sum())

                # ---- sub-partition pick
                subs_nb = sub_assign[nb]
                gvalid = valid & (subs_nb >= 0)
                same = gvalid & (parts == best[seg])
                chosen = np.full(b, -1, np.int64)
                if same.any():
                    keys = seg[same].astype(np.int64) * S + subs_nb[same]
                    ukeys, ucnt = np.unique(keys, return_counts=True)
                    useg = ukeys // S
                    usub = ukeys % S
                    has_room = sub_sizes[best[useg].astype(np.int64) * S + usub] < sub_thr
                    ukeys, ucnt, useg, usub = (
                        ukeys[has_room],
                        ucnt[has_room],
                        useg[has_room],
                        usub[has_room],
                    )
                    if ukeys.shape[0]:
                        # per-seg argmax count (ties → smallest sub id)
                        o = np.lexsort((usub, -ucnt, useg))
                        first = np.concatenate([[True], useg[o][1:] != useg[o][:-1]])
                        chosen[useg[o][first]] = usub[o][first]
                fb = np.flatnonzero(chosen < 0)
                if fb.shape[0]:
                    # per-partition water-fill over smallest subs
                    for p in np.unique(best[fb]).tolist():
                        rows_p = fb[best[fb] == p]
                        ssz = sub_sizes[p * S : (p + 1) * S]
                        m = rows_p.shape[0]
                        if m < S:
                            # partial selection of the m smallest subs (stable by
                            # (size, index)), cheaper than a full 4096-sort
                            part = np.argpartition(ssz, m)[: 2 * m if 2 * m < S else S]
                            order = part[np.lexsort((part, ssz[part]))][:m]
                            picks = order
                        else:
                            order = np.argsort(ssz, kind="stable")
                            picks = np.tile(order, int(np.ceil(m / S)))[:m]
                        chosen[rows_p] = picks
                sub_assign[vset] = chosen.astype(np.int32)
                np.add.at(sub_sizes, best.astype(np.int64) * S + chosen, 1)

                # ---- evict from buffer + rescore buffered neighbors (θ/deg each)
                buffered[vset] = False
                buf_score[vset] = -np.inf
                nb_buf = nb[buffered[nb]]
                if nb_buf.shape[0]:
                    np.add.at(buf_score, nb_buf, cfg.theta / deg[nb_buf])
                n_buf -= b

        # ---- drive: process the stream in segments bounded by
        # cfg.max_buffer_size — when the buffered population would exceed the
        # cap, drain everything buffered so far with RUNNING metrics at that
        # stream position (the reference's forced mid-stream eviction,
        # /root/reference/src/cuttana.rs:39-44 — batched here: one drain of
        # the full buffer instead of one eviction per insert). With the
        # default 1M cap and smaller graphs there are no mid-stream drains
        # and the path is identical to a single end-of-stream drain.
        low_stream = np.flatnonzero(~high)
        hi_stream = np.flatnonzero(high)
        cap = int(cfg.max_buffer_size) if cfg.max_buffer_size else 0
        if cap and low_stream.shape[0] > cap:
            boundaries = low_stream[cap::cap].tolist()
        else:
            boundaries = []
        seg_start = 0
        for b_pos in boundaries + [n_stream]:
            for i in hi_stream[(hi_stream >= seg_start) & (hi_stream < b_pos)].tolist():
                _assign_high(i)
            lows = low_stream[(low_stream >= seg_start) & (low_stream < b_pos)]
            buffered[vs[lows]] = True
            _score_buffered(lows)
            if b_pos < n_stream:
                _drain(int(cum_v[b_pos - 1]), int(cum_e[b_pos - 1]))
            else:
                _drain(vc_total, ec_total)
            seg_start = b_pos

        # ---- exact sub↔sub edge rebuild from the final assignment
        # (neighbor-only vertices that never appeared as a stream source are
        # unassigned, as in the reference — their edges are skipped)
        e_src = vs[np.repeat(np.arange(n_stream), lens)]
        mask = (assign[e_src] >= 0) & (assign[indices] >= 0)
        g_src = assign[e_src[mask]].astype(np.int64) * S + sub_assign[e_src[mask]]
        g_dst = assign[indices[mask]].astype(np.int64) * S + sub_assign[indices[mask]]
        mask2 = g_src != g_dst
        pair_keys = g_src[mask2] * (k * S) + g_dst[mask2]
        up, uw = np.unique(pair_keys, return_counts=True)
        refiner = run_refinement(
            RefineInput(
                k=k,
                S=S,
                vertex_count=vc_total,
                balance_slack=cfg.balance_slack,
                info_gain_threshold=cfg.info_gain_threshold,
                sizes=sizes,
                sub_size_flat=sub_sizes,
                edge_src=(up // (k * S)).astype(np.int64),
                edge_dst=(up % (k * S)).astype(np.int64),
                edge_w=uw.astype(np.int64),
            )
        )

        done = assign >= 0
        gsub = assign[done].astype(np.int64) * S + sub_assign[done]
        final_parts = refiner.parents[gsub].astype(np.int32)
        return PartitionResult(
            vertices=uniq[done],
            partitions=final_parts,
            sub_partitions=gsub.astype(np.int32),
            partition_sizes=np.bincount(final_parts, minlength=k).astype(np.int64),
            vertex_count=vc_total,
            edge_count=ec_total,
            cut_count=cut_count,
            num_partitions=k,
            moves=refiner.moves,
        )


def cuttana_partition_batched(
    adjacency: list[tuple[int, list[int]]] | None,
    num_partitions: int,
    config: CuttanaConfig | None = None,
    batch_size: int = 1024,
) -> PartitionResult:
    """Batched partitioning of an in-memory adjacency list."""
    p = BatchedCuttanaPartitioner(num_partitions, config, batch_size)
    src = np.array([v for v, _ in adjacency], np.int64)
    lens = np.array([len(nb) for _, nb in adjacency], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    values = np.array([x for _, nb in adjacency for x in nb], np.int64)
    p.add_batch(src, offsets, values)
    return p.finish()


def cuttana_partition_df_batched(
    adj_df,
    num_partitions: int,
    config: CuttanaConfig | None = None,
    batch_size: int = 1024,
    streaming: bool = False,
) -> PartitionResult:
    """Batched partitioning of a Spark adjacency DataFrame (plain or
    hub-chunked — a `chunk` column triggers sorted-merge ingest)."""
    from cuttana_spark.partition.core import (
        iter_adjacency_batches,
        iter_merged_adjacency_batches,
        prepare_chunked_adjacency,
    )

    adj_df, chunked = prepare_chunked_adjacency(adj_df)
    it = (iter_merged_adjacency_batches if chunked else iter_adjacency_batches)(
        adj_df, streaming=streaming
    )
    p = BatchedCuttanaPartitioner(num_partitions, config, batch_size)
    for src, offsets, values in it:
        offsets = np.asarray(offsets, np.int64)
        p.add_batch(src, offsets, values)
    return p.finish()
