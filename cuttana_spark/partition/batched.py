"""Vectorized mini-batch Cuttana partitioner — the throughput/scale path.

Same algorithm as core.CuttanaPartitioner (FENNEL global pick + local
sub-partition pick + buffered deferral + refinement), but the buffer drain —
where virtually all assignment work happens at the default config
(buffer_degree_threshold=100 buffers everything below 100-degree,
/root/reference/src/cuttana.rs:33-38) — processes the top-`batch_size`
buffered vertices per step against a state *snapshot*, with every inner step
a numpy array operation. No per-vertex Python in the drain.

Execution model (round 3): the stream is processed as DRAIN SEGMENTS — runs
of consecutive stream rows holding exactly cfg.max_buffer_size low-degree
vertices (the reference's forced mid-stream eviction trigger,
/root/reference/src/cuttana.rs:39-44) — by a _SegmentedEngine whose
persistent state is strictly O(V) per-vertex arrays; all O(E) adjacency data
is only touched within the segment that carries it. Two feeders share the
engine:

  * in-memory (BatchedCuttanaPartitioner): the whole stream is resident, as
    before — fastest at sandbox scale, identical numbers to round 2;
  * out-of-core (cuttana_partition_df_spill): the adjacency is spooled to
    parquet ONCE and streamed three times — (A) id densification, (B) the
    segment loop, (C) the exact sub↔sub edge rebuild — so driver residency is
    O(V) state + ONE segment of edges (~max_buffer_size x avg-low-degree +
    the largest single neighbor list), independent of |E|. Segment
    boundaries are identical to the in-memory feeder's, so both modes
    produce BIT-IDENTICAL results (tested). This removes the O(V+E)
    driver-RAM ceiling that was the round-2 100-TB blocker: 10^12 edges no
    longer need ~8 TB of driver RAM, only the O(V) vertex state (~33 B/vertex
    with pre-densified ids, ~41 B with the id-union pass) plus a bounded
    segment.

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


class _SegmentedEngine:
    """Per-vertex O(V) partitioning state + the vectorized stream/drain
    kernels, fed one drain segment at a time. A drain segment is a run of
    stream rows holding exactly cfg.max_buffer_size low-degree vertices (the
    final segment holds the remainder); the engine drains the whole buffer at
    every segment end with running (vertex, edge) totals at that stream
    position."""

    def __init__(self, k: int, cfg: CuttanaConfig, batch_size: int, n: int):
        self.k, self.cfg, self.batch_size = k, cfg, batch_size
        self.S = cfg.num_sub_partitions
        self.slack1 = cfg.phase1_slack
        self.gamma = cfg.gamma
        self.assign = np.full(n, -1, np.int32)
        self.sub_assign = np.full(n, -1, np.int32)
        self.sizes = np.zeros(k, np.int64)
        self.sub_sizes = np.zeros(k * self.S, np.int64)
        self.buffered = np.zeros(n, bool)
        self.buf_score = np.full(n, -np.inf)
        self.deg = np.zeros(n, np.int64)
        self.row_of = np.full(n, -1, np.int64)
        self.vc_done = 0
        self.ec_done = 0
        self.cut_count = 0
        self.max_resident_edges = 0

    # -- segment-boundary state (checkpoint/resume) ---------------------------
    # Between segments the buffer is empty (every segment drains fully) and
    # deg/row_of are per-segment scratch, so the complete carry-over state is
    # the assignment arrays + running totals below.

    def state_dict(self) -> dict:
        return {
            "assign": self.assign,
            "sub_assign": self.sub_assign,
            "sizes": self.sizes,
            "sub_sizes": self.sub_sizes,
            "vc_done": np.int64(self.vc_done),
            "ec_done": np.int64(self.ec_done),
            "cut_count": np.int64(self.cut_count),
            "max_resident_edges": np.int64(self.max_resident_edges),
        }

    def load_state(self, st: dict) -> None:
        self.assign = np.asarray(st["assign"], np.int32)
        self.sub_assign = np.asarray(st["sub_assign"], np.int32)
        self.sizes = np.asarray(st["sizes"], np.int64)
        self.sub_sizes = np.asarray(st["sub_sizes"], np.int64)
        self.vc_done = int(st["vc_done"])
        self.ec_done = int(st["ec_done"])
        self.cut_count = int(st["cut_count"])
        self.max_resident_edges = int(st["max_resident_edges"])

    # -- per-segment driver ---------------------------------------------------

    def run_segment(self, vs: np.ndarray, lens: np.ndarray, indices: np.ndarray) -> None:
        n_rows = vs.shape[0]
        if n_rows == 0:
            return
        cfg = self.cfg
        indptr = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        self.max_resident_edges = max(self.max_resident_edges, int(indices.shape[0]))
        self.deg[vs] = lens
        self.row_of[vs] = np.arange(n_rows)
        high = lens >= cfg.buffer_degree_threshold
        cum_v = self.vc_done + np.arange(1, n_rows + 1)
        cum_e = self.ec_done + np.cumsum(lens)

        for i in np.flatnonzero(high).tolist():
            self._assign_high(i, vs, indices, indptr, int(cum_v[i]), int(cum_e[i]))

        lows = np.flatnonzero(~high)
        self.buffered[vs[lows]] = True
        self._score_buffered(lows, vs, lens, indices, indptr)

        self.vc_done = int(cum_v[-1])
        self.ec_done = int(cum_e[-1])
        # sorted: preserves the ascending-id candidate order the former
        # flatnonzero(bitmap) scan produced, so tie-breaks are unchanged
        self._drain(self.vc_done, self.ec_done, indices, indptr, np.sort(vs[lows]))

    # -- stream phase: immediate partitioning of high-degree vertices with
    # *running* metrics (they're rare; per-vertex numpy is fine) -------------

    def _assign_high(self, i, vs, indices, indptr, vc, ec):
        k, S, gamma = self.k, self.S, self.gamma
        assign, sub_assign, sizes, sub_sizes = (
            self.assign,
            self.sub_assign,
            self.sizes,
            self.sub_sizes,
        )
        vi = vs[i]
        ni = indices[indptr[i] : indptr[i + 1]]
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
        self.cut_count += int(ap.shape[0] - counts[best])
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

    def _score_buffered(self, rows, vs, lens, indices, indptr):
        """Exact drain-start scores for newly-buffered stream rows (the
        telescoped formula — see module docstring)."""
        if rows.shape[0] == 0:
            return
        cfg = self.cfg
        bvs = vs[rows]
        nb, seg, blens = _gather_flat(indptr, indices, rows)
        assigned = (self.assign[nb] >= 0).astype(np.int64)
        n_assigned = np.zeros(rows.shape[0], np.int64)
        np.add.at(n_assigned, seg, assigned)
        safe = np.maximum(blens, 1)
        self.buf_score[bvs] = (
            cfg.theta * (n_assigned / safe) + blens / cfg.buffer_degree_threshold
        )

    def _drain(self, vc_now: int, ec_now: int, indices, indptr, seg_lows: np.ndarray) -> None:
        k, S, cfg, gamma = self.k, self.S, self.cfg, self.gamma
        assign, sub_assign, sizes, sub_sizes = (
            self.assign,
            self.sub_assign,
            self.sizes,
            self.sub_sizes,
        )
        buffered, buf_score, row_of, deg = (
            self.buffered,
            self.buf_score,
            self.row_of,
            self.deg,
        )
        thr_v = (1.0 + self.slack1) * vc_now / k
        v_eff = vc_now // k
        sub_thr = (1.0 + self.slack1) * v_eff / S
        ag = (k ** (gamma - 1.0) * vc_now / ec_now**gamma) * gamma if ec_now else 0.0

        # the buffered set is EXACTLY this segment's low rows (every prior
        # segment drains to empty before the next begins), so candidate
        # selection iterates the explicit per-segment list — per drain batch
        # this is O(segment), never an O(V) scan of the global bitmap (which
        # would make total drain cost quadratic in V at 10^9 vertices)
        active = seg_lows[buffered[seg_lows]]
        n_buf = active.shape[0]
        # adaptive batch: staleness is relative (B/n), so large graphs can
        # take proportionally larger batches at equal quality
        B = max(self.batch_size, n_buf // 128)
        while n_buf > 0:
            b = min(B, n_buf)
            cand_idx = active
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
            self.cut_count += int((nv - C[np.arange(b), best]).sum())

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
            active = active[buffered[active]]
            n_buf = active.shape[0]

    # -- finish ---------------------------------------------------------------

    def refine_and_result(self, pair_keys: np.ndarray, pair_w: np.ndarray, vertices: np.ndarray) -> PartitionResult:
        """Run refinement over the exact rebuilt sub↔sub edges and assemble
        the result. `vertices[i]` is the original id of dense vertex i."""
        k, S, cfg = self.k, self.S, self.cfg
        refiner = run_refinement(
            RefineInput(
                k=k,
                S=S,
                vertex_count=self.vc_done,
                balance_slack=cfg.balance_slack,
                info_gain_threshold=cfg.info_gain_threshold,
                sizes=self.sizes,
                sub_size_flat=self.sub_sizes,
                edge_src=(pair_keys // (k * S)).astype(np.int64),
                edge_dst=(pair_keys % (k * S)).astype(np.int64),
                edge_w=pair_w.astype(np.int64),
                enable_eviction_plans=cfg.enable_eviction_plans,
            )
        )
        assign = self.assign
        done = assign >= 0
        gsub = assign[done].astype(np.int64) * S + self.sub_assign[done]
        final_parts = refiner.parents[gsub].astype(np.int32)
        return PartitionResult(
            vertices=vertices[done],
            partitions=final_parts,
            sub_partitions=gsub.astype(np.int32),
            partition_sizes=np.bincount(final_parts, minlength=k).astype(np.int64),
            vertex_count=self.vc_done,
            edge_count=self.ec_done,
            cut_count=self.cut_count,
            num_partitions=k,
            moves=refiner.moves,
        )


def _iter_drain_segments(batches, cap: int, threshold: int):
    """Cut a (vs, lens, values) batch stream into drain segments: each
    yielded segment ends right before the row that would make it hold cap+1
    low-degree vertices (matching the reference's max_buffer_size overflow
    trigger position exactly); the final segment holds the remainder."""
    parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    n_lows = 0

    def assemble():
        vs = np.concatenate([p[0] for p in parts])
        lens = np.concatenate([p[1] for p in parts])
        vals = np.concatenate([p[2] for p in parts])
        return vs, lens, vals

    for vs, lens, values in batches:
        indptr = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        start = 0
        low_pos = np.flatnonzero(lens < threshold)
        taken_lows = 0  # lows of this batch already emitted/accumulated
        while True:
            quota = cap - n_lows
            rest = low_pos[taken_lows:]
            if cap > 0 and rest.shape[0] > quota:
                cut = int(rest[quota])  # row index of the (cap+1)-th low
                if cut > start:
                    parts.append(
                        (vs[start:cut], lens[start:cut], values[indptr[start] : indptr[cut]])
                    )
                if parts:
                    yield assemble()
                parts = []
                n_lows = 0
                taken_lows = int(np.searchsorted(low_pos, cut))  # lows before cut
                start = cut
            else:
                if vs.shape[0] > start:
                    parts.append(
                        (vs[start:], lens[start:], values[indptr[start] :])
                    )
                n_lows += rest.shape[0]
                break
    if parts:
        yield assemble()


class BatchedCuttanaPartitioner:
    """In-memory feeder: accumulate Arrow batches, densify once, run the
    segmented engine over the resident stream (identical segment boundaries
    to the spill feeder, so identical results — tested)."""

    def __init__(
        self,
        num_partitions: int,
        config: CuttanaConfig | None = None,
        batch_size: int = 1024,
    ):
        self.k = num_partitions
        self.cfg = config or CuttanaConfig()
        self.batch_size = batch_size
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
        k, cfg = self.k, self.cfg
        stream_src = np.concatenate(self._src_chunks) if self._src_chunks else np.empty(0, np.int64)
        lens = np.concatenate(self._len_chunks) if self._len_chunks else np.empty(0, np.int64)
        flat_vals = np.concatenate(self._val_chunks) if self._val_chunks else np.empty(0, np.int64)
        n_stream = stream_src.shape[0]

        # densify ids (vectorized; first-seen order is irrelevant to the
        # algorithm — only score ties depend on id order, and those are RNG
        # in the reference). return_inverse yields both dense id arrays from
        # the ONE sort np.unique already does — the former two searchsorted
        # passes over uniq re-did a binary search per element (~1.3 s of the
        # 5.5 s engine wall at the 1.05M-vertex bench fixture, round-7
        # profile) for positions the sort already knew.
        uniq, inv = np.unique(
            np.concatenate([stream_src, flat_vals]), return_inverse=True
        )
        n = uniq.shape[0]
        vs = inv[: stream_src.shape[0]]
        indices = inv[stream_src.shape[0] :]

        engine = _SegmentedEngine(k, cfg, self.batch_size, n)
        cap = int(cfg.max_buffer_size) if cfg.max_buffer_size else 0
        for seg in _iter_drain_segments(
            iter([(vs, lens, indices)]), cap, cfg.buffer_degree_threshold
        ):
            engine.run_segment(*seg)
        self.vertex_count, self.edge_count = engine.vc_done, engine.ec_done

        # ---- exact sub↔sub edge rebuild from the final assignment
        # (neighbor-only vertices that never appeared as a stream source are
        # unassigned, as in the reference — their edges are skipped)
        up, uw = _pair_counts(
            engine.assign, engine.sub_assign, k, cfg.num_sub_partitions,
            vs, lens, indices,
        )
        return engine.refine_and_result(up, uw, uniq)


def _pair_counts(assign, sub_assign, k, S, vs, lens, indices):
    """Exact (gsub_src, gsub_dst) weighted pair counts for one batch of
    stream rows (dense ids). Returns (pair_keys, weights)."""
    n_stream = vs.shape[0]
    e_src = vs[np.repeat(np.arange(n_stream), lens)]
    mask = (assign[e_src] >= 0) & (assign[indices] >= 0)
    g_src = assign[e_src[mask]].astype(np.int64) * S + sub_assign[e_src[mask]]
    g_dst = assign[indices[mask]].astype(np.int64) * S + sub_assign[indices[mask]]
    mask2 = g_src != g_dst
    pair_keys = g_src[mask2] * (k * S) + g_dst[mask2]
    return np.unique(pair_keys, return_counts=True)


def _merge_pairs(acc_keys, acc_w, new_keys, new_w):
    """Sum-merge two sorted (key, weight) pair sets."""
    keys = np.concatenate([acc_keys, new_keys])
    w = np.concatenate([acc_w, new_w])
    order = np.argsort(keys, kind="stable")
    keys, w = keys[order], w[order]
    if keys.shape[0] == 0:
        return keys, w
    first = np.concatenate([[True], keys[1:] != keys[:-1]])
    starts = np.flatnonzero(first)
    return keys[first], np.add.reduceat(w, starts)


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


class SpillIngestCheckpoint:
    """Segment-boundary checkpoint for the spill partitioner's O(V) state.

    Same atomicity discipline as plans/warehouse.Warehouse (the Iceberg-
    shaped snapshot store): the .npz is written to a tmp name and moved into
    place with os.replace, so a crash mid-save leaves the previous committed
    state intact and a reader never observes a half-written file. One state
    file suffices — each save strictly supersedes the last (pass B is the
    one intentionally-sequential stage; segments are a linear history).

    The fingerprint (k, batch size, config repr, dense_ids, n) guards
    against resuming onto a different graph or configuration: segment
    boundaries and scores are functions of those, so a mismatch would
    silently corrupt the output — it raises instead.
    """

    def __init__(self, path: str, fingerprint: str):
        import os

        self.dir = path
        self.file = os.path.join(path, "spill_state.npz")
        self.fingerprint = fingerprint
        os.makedirs(path, exist_ok=True)

    def load(self) -> tuple[int, dict] | None:
        """-> (segments_done, state arrays) or None if no checkpoint."""
        import os

        if not os.path.exists(self.file):
            return None
        with np.load(self.file, allow_pickle=False) as z:
            st = {k: z[k] for k in z.files}
        saved_fp = str(st.pop("fingerprint"))
        if saved_fp != self.fingerprint:
            raise ValueError(
                "SpillIngestCheckpoint: fingerprint mismatch — checkpoint was "
                f"written by a different graph/config ({saved_fp!r} != "
                f"{self.fingerprint!r}); refusing to resume"
            )
        return int(st.pop("segments_done")), st

    def save(self, segments_done: int, state: dict) -> None:
        import os

        tmp = self.file + ".tmp.npz"  # .npz suffix: savez appends it otherwise
        np.savez(
            tmp,
            segments_done=np.int64(segments_done),
            fingerprint=np.str_(self.fingerprint),
            **state,
        )
        # Durability to match the "atomic commit point" promise: fsync the
        # tmp file's bytes, then the rename, then the directory entry — a
        # power/OS crash can no longer commit a truncated npz (process-crash
        # atomicity alone came from os.replace).
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
        os.replace(tmp, self.file)  # atomic commit point
        dfd = os.open(self.dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def clear(self) -> None:
        import os

        if os.path.exists(self.file):
            os.remove(self.file)


def cuttana_partition_df_spill(
    adj_df,
    num_partitions: int,
    config: CuttanaConfig | None = None,
    batch_size: int = 1024,
    dense_ids: bool = False,
    stats: dict | None = None,
    spool_path: str | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 1,
) -> PartitionResult:
    """Out-of-core batched partitioning — the beyond-driver-RAM path.

    The adjacency DataFrame is spooled to parquet once (executors write in
    parallel) and STREAMED three times; the driver never holds more than the
    O(V) per-vertex state plus one drain segment of edges:

      pass A  id space — with ``dense_ids=True`` (ids already 0..n-1, e.g.
              from edges.densify_edges) only the max id is tracked;
              otherwise a sorted id-union array is built incrementally
              (O(V) resident, same dense mapping np.unique would produce);
      pass B  the segment loop — segments end after every
              cfg.max_buffer_size-th low-degree row, the same boundaries as
              the in-memory feeder, so results are bit-identical to
              cuttana_partition_df_batched (tested);
      pass C  exact sub↔sub edge rebuild for refinement, accumulated as
              sum-merged (pair, weight) arrays per batch.

    Driver residency: n·33 B vertex state (+ n·8 B for the id union when
    dense_ids=False) + one segment (≈ max_buffer_size × avg-low-degree × 8 B
    + the largest merged neighbor list). `stats` (optional dict) receives
    max_resident_edges / n_segments for ceiling audits.

    Hub-chunked adjacency (a `chunk` column) is merged stream-side exactly as
    in the in-memory feeder.

    ``spool_path``: where the adjacency is spooled. On any non-local master
    this MUST be shared storage visible to both executors (who write the
    part files) and the driver (whose pyarrow reader streams them back) —
    e.g. an HDFS/S3/NFS path; a driver-local tempdir would silently read
    only driver-local fragments. When omitted, a local tempdir is used and a
    local[*] master is asserted. A caller-provided path is left in place
    (the caller owns its lifecycle — it is also what a mid-ingest resume
    would re-stream); the auto tempdir is removed on exit.

    ``checkpoint_path``: enable segment-boundary checkpoint/resume for pass
    B, the one intentionally-sequential stage (at 10^12-edge ingests it is
    days of wall — a driver crash should not restart it from zero). After
    every ``checkpoint_every``-th completed segment the O(V) state arrays
    are committed atomically (SpillIngestCheckpoint); a rerun with the same
    checkpoint_path + spool_path restores them and skips the committed
    segments, producing BIT-IDENTICAL output to an uninterrupted run
    (tested). Requires an explicit spool_path (the spool must survive the
    crash — it is re-streamed, not re-written, when its _SUCCESS marker
    exists). Reusing the paths across DIFFERENT inputs/configs is guarded
    twice: the checkpoint state fingerprint covers k/batch/config/n AND the
    input plan's semanticHash, and the spool itself carries a
    ``_CUTTANA_SPOOL_FP`` marker with the same plan hash — a spool written
    by a different input plan is re-spooled (overwritten), never silently
    reused, and a checkpoint written against a different input refuses to
    resume. Limitation (documented, not detectable cheaply): the hash is
    plan-level, so the SAME plan re-read over underlying files that were
    mutated in place between runs is not caught — at that point the caller
    must clean the spool/checkpoint dirs.
    """
    import os
    import shutil
    import tempfile

    from cuttana_spark.partition.core import (
        iter_spool_batches,
        merge_chunk_runs,
        prepare_chunked_adjacency,
    )

    cfg = config or CuttanaConfig()
    adj_df, chunked = prepare_chunked_adjacency(adj_df)
    if checkpoint_path is not None and spool_path is None:
        raise ValueError(
            "cuttana_partition_df_spill: checkpoint_path requires an explicit "
            "spool_path — resume re-streams the spool, so it must outlive the "
            "crashed process"
        )
    if spool_path is None:
        master = adj_df.sparkSession.sparkContext.master or ""
        if not master.startswith("local"):
            raise ValueError(
                "cuttana_partition_df_spill: on a non-local master "
                f"({master!r}) pass spool_path= on shared storage — a "
                "driver-local tempdir would read only driver-local fragments"
            )
        tmp, own_tmp = tempfile.mkdtemp(prefix="cuttana_spill_"), True
    else:
        tmp, own_tmp = spool_path, False

    # Input identity for spool/checkpoint reuse guards: the analyzed plan's
    # semanticHash (no job, stable across sessions for the same source +
    # transformations). "na" (internal API unavailable) never matches, which
    # degrades to always-re-spool — safe.
    try:
        input_fp = str(adj_df._jdf.queryExecution().analyzed().semanticHash())
    except Exception:
        input_fp = "na"
    fp_marker = os.path.join(tmp, "_CUTTANA_SPOOL_FP")

    def _spool_fp_matches() -> bool:
        if input_fp == "na" or not os.path.exists(fp_marker):
            return False
        with open(fp_marker) as f:
            return f.read().strip() == input_fp

    try:
        reuse_spool = (
            checkpoint_path is not None
            and os.path.exists(os.path.join(tmp, "_SUCCESS"))
            and _spool_fp_matches()
        )
        if not reuse_spool:
            adj_df.write.mode("overwrite").parquet(tmp)
            with open(fp_marker, "w") as f:
                f.write(input_fp)

        def raw_batches():
            for src, offsets, values in iter_spool_batches(tmp):
                yield src, np.diff(np.asarray(offsets, np.int64)), values

        def merged_batches():
            if not chunked:
                yield from raw_batches()
                return
            for src, offsets, values in merge_chunk_runs(iter_spool_batches(tmp)):
                yield src, np.diff(np.asarray(offsets, np.int64)), values

        # ---- pass A: id space
        if dense_ids:
            max_id = -1
            for src, lens, values in raw_batches():
                if src.shape[0]:
                    max_id = max(max_id, int(src.max()))
                if values.shape[0]:
                    max_id = max(max_id, int(values.max()))
            n = max_id + 1
            uniq = None
            vertices = np.arange(n, dtype=np.int64)
        else:
            uniq = np.empty(0, np.int64)
            for src, lens, values in raw_batches():
                chunk_ids = np.unique(np.concatenate([src, values]))
                uniq = np.union1d(uniq, chunk_ids)
            n = uniq.shape[0]
            vertices = uniq

        to_dense = (lambda a: a) if uniq is None else (lambda a: np.searchsorted(uniq, a))

        # ---- pass B: segment loop (checkpoint/resume at segment boundaries)
        engine = _SegmentedEngine(num_partitions, cfg, batch_size, n)
        ck = None
        seg_done = 0
        if checkpoint_path is not None:
            fp = (
                f"k={num_partitions};batch={batch_size};cfg={cfg!r};"
                f"dense={dense_ids};n={n};input={input_fp}"
            )
            ck = SpillIngestCheckpoint(checkpoint_path, fp)
            loaded = ck.load()
            if loaded is not None:
                seg_done, st = loaded
                engine.load_state(st)
        cap = int(cfg.max_buffer_size) if cfg.max_buffer_size else 0
        n_segments = 0
        dense_stream = (
            (to_dense(src), lens, to_dense(values)) for src, lens, values in merged_batches()
        )
        for seg in _iter_drain_segments(dense_stream, cap, cfg.buffer_degree_threshold):
            if n_segments >= seg_done:  # committed segments are skipped
                engine.run_segment(*seg)
                if ck is not None and (n_segments + 1) % max(1, checkpoint_every) == 0:
                    ck.save(n_segments + 1, engine.state_dict())
            n_segments += 1

        # ---- pass C: exact sub↔sub edge rebuild, merged incrementally
        S = cfg.num_sub_partitions
        acc_keys = np.empty(0, np.int64)
        acc_w = np.empty(0, np.int64)
        for src, lens, values in raw_batches():
            up, uw = _pair_counts(
                engine.assign, engine.sub_assign, num_partitions, S,
                to_dense(src), lens, to_dense(values),
            )
            acc_keys, acc_w = _merge_pairs(acc_keys, acc_w, up, uw)

        if stats is not None:
            stats["max_resident_edges"] = engine.max_resident_edges
            stats["n_segments"] = n_segments
            stats["n_vertices_state"] = n
            stats["resumed_from_segment"] = seg_done
        res = engine.refine_and_result(acc_keys, acc_w, vertices)
        if ck is not None:
            ck.clear()  # completed: a rerun starts fresh
        return res
    finally:
        if own_tmp:
            shutil.rmtree(tmp, ignore_errors=True)
