"""Sub-partition refinement — balance fixing + quality moves.

Structure follows the reference Refiner (/root/reference/src/refine.rs:32-182)
— same capacities (max_parent, max_sub, refine_capacity), same
fix_balance → refine → fix_balance choreography — but the *scoring* is
implemented from the CUTTANA paper (arXiv:2312.08356), because the
reference's plan scores are placeholders ((u64::MAX, 0) at refine.rs:91,118,
136, making its refine() a structural no-op).

Gain of moving global sub-partition g from partition f to t, with
cut[g, p] = total_adjacent_weight(g) − weight(g → subs in p)
(/root/reference/src/state.rs:169-189):

    gain(g, t) = cut[g, t] − cut[g, f] = W[g, f] − W[g, t]

(negative = cut improves). The reference plans segment trees for move-score
maintenance (TODO stubs at state.rs:12, refine.rs:259-264); at k·4096 scale a
dense weight matrix over the *active* sub-partitions plus a lazy-invalidation
heap is simpler and O(deg·k) per move. The reference's incremental cut update
at refine.rs:200-204 has the sign inverted (never observable there because no
moves are ever scored) — we apply the correct sign.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

MAX_MOVES = 200_000


@dataclass
class RefineInput:
    """Neutral view of partitioner state (shared by the sequential and the
    batched cores)."""

    k: int
    S: int
    vertex_count: int
    balance_slack: float
    info_gain_threshold: int
    sizes: np.ndarray  # (k,) partition vertex counts
    sub_size_flat: np.ndarray  # (k*S,) per-gsub vertex counts
    # symmetric aggregated sub↔sub edges (each direction present once)
    edge_src: np.ndarray  # (E,) gsub ids
    edge_dst: np.ndarray  # (E,) gsub ids
    edge_w: np.ndarray  # (E,) weights
    # 2-move eviction plans (paper Case 2): measured ±0.3% cut on the BA
    # goldens for up to 9× the refinement wall (BENCH_EVICTIONS_r3.json) —
    # default OFF; parity tests flip it on to exercise the full semantics
    enable_eviction_plans: bool = False


class Refiner:
    def __init__(self, inp: RefineInput) -> None:
        self.inp = inp
        k, S = inp.k, inp.S
        self.k, self.S = k, S
        nG = k * S

        # full parent map (gsub -> partition) used for the final result
        self.parents = (np.arange(nG, dtype=np.int64) // S).astype(np.int32)

        active = np.unique(
            np.concatenate([np.flatnonzero(inp.sub_size_flat > 0), inp.edge_src])
        ).astype(np.int64)
        self.g_act = active
        nact = active.shape[0]
        self.amap = np.full(nG, -1, np.int64)  # gsub -> active row
        self.amap[active] = np.arange(nact)
        self.p_act = (active // S).astype(np.int32)
        self.sub_size = inp.sub_size_flat[active].astype(np.int64)

        self.sizes = inp.sizes.astype(np.int64).copy()
        self.num_sub = np.full(k, S, np.int64)

        n = inp.vertex_count
        # capacities per /root/reference/src/refine.rs:40-57
        self.max_parent = int(n / k * (1.0 + inp.balance_slack)) + 1
        self.max_sub = int(nG / k * 1.5) + 1
        self.refine_capacity = int(self.max_parent * 1.1)
        self.gain_threshold = -float(inp.info_gain_threshold)

        # CSR adjacency over active subs + dense weight matrix W[a, p]
        a_src = self.amap[inp.edge_src]
        order = np.argsort(a_src, kind="stable")
        self._adj_dst = self.amap[inp.edge_dst[order]]
        self._adj_w = inp.edge_w[order].astype(np.int64)
        counts = np.bincount(a_src, minlength=nact)
        self._adj_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

        flat = a_src * k + self.p_act[self.amap[inp.edge_dst]].astype(np.int64)
        self.W = np.bincount(flat, weights=inp.edge_w, minlength=nact * k).astype(
            np.int64
        ).reshape(nact, k)

        self.moves: list[tuple[int, int, int]] = []

    # ------------------------------------------------------------------

    def _apply(self, a: int, t: int) -> None:
        g = int(self.g_act[a])
        f = int(self.p_act[a])
        lo, hi = self._adj_ptr[a], self._adj_ptr[a + 1]
        if hi > lo:
            hs = self._adj_dst[lo:hi]
            ws = self._adj_w[lo:hi]
            np.add.at(self.W[:, f], hs, -ws)
            np.add.at(self.W[:, t], hs, ws)
        ssz = int(self.sub_size[a])
        self.sizes[f] -= ssz
        self.sizes[t] += ssz
        self.num_sub[f] -= 1
        self.num_sub[t] += 1
        self.p_act[a] = t
        self.parents[g] = t
        self.moves.append((g, f, t))

    # ------------------------------------------------------------------

    def fix_balance(self) -> int:
        """Move subs out of oversized partitions (size > max_parent) into
        partitions with room, minimizing cut increase; to fixpoint.
        (Reference structure: /root/reference/src/refine.rs:59-65,78-105.)"""
        moves = 0
        while moves < MAX_MOVES:
            over = np.flatnonzero(self.sizes > self.max_parent)
            if over.shape[0] == 0:
                break
            f = int(over[np.argmax(self.sizes[over])])
            rows = np.flatnonzero((self.p_act == f) & (self.sub_size > 0))
            if rows.shape[0] == 0:
                break
            # gain of each (sub in f) × (target t): W[a, f] − W[a, t]
            gains = self.W[rows, f][:, None].astype(np.float64) - self.W[rows]
            t_open = (self.sizes < self.max_parent) & (self.num_sub < self.max_sub)
            t_open[f] = False
            gains[:, ~t_open] = np.inf
            fits = (self.sizes[None, :] + self.sub_size[rows][:, None]) <= self.max_parent
            gains[~fits] = np.inf
            ai, t = np.unravel_index(np.argmin(gains), gains.shape)
            if not np.isfinite(gains[ai, t]):
                break  # oversized but no feasible move — leave as-is
            self._apply(int(rows[ai]), int(t))
            moves += 1
        return moves

    # ------------------------------------------------------------------

    def _row_best(self, a: int) -> tuple[float, int]:
        """Best feasible strictly-improving move for active sub a."""
        f = self.p_act[a]
        gains = float(self.W[a, f]) - self.W[a].astype(np.float64)
        gains[f] = np.inf
        gains[self.num_sub >= self.max_sub] = np.inf
        gains[self.sizes + self.sub_size[a] > self.refine_capacity] = np.inf
        t = int(np.argmin(gains))
        return float(gains[t]), t

    def refine(self) -> int:
        """Greedy best-first strictly-improving single-sub moves under
        refine_capacity (reference structure refine.rs:67-76,107-129,
        scoring from the paper), via a lazy-invalidation heap keyed by each
        active sub's best gain."""
        thr = self.gain_threshold
        nact = self.g_act.shape[0]
        ver = np.zeros(nact, np.int64)

        # vectorized initial row-bests (unconstrained upper bound on gain)
        own = self.W[np.arange(nact), self.p_act].astype(np.float64)
        g0 = own[:, None] - self.W
        g0[np.arange(nact), self.p_act] = np.inf
        g0[self.sub_size == 0, :] = np.inf
        best0 = g0.min(axis=1)
        heap = [(float(b), int(a), 0) for a, b in enumerate(best0) if b < thr]
        heapq.heapify(heap)

        moves = 0
        while heap and moves < MAX_MOVES:
            gain, a, v = heapq.heappop(heap)
            if ver[a] != v:
                continue
            gain2, t = self._row_best(a)  # re-check against current state
            if gain2 >= thr:
                continue
            self._apply(a, t)
            moves += 1
            # rows whose W changed: a itself and g's neighbors — recompute
            # their best gains in one vectorized shot
            lo, hi = self._adj_ptr[a], self._adj_ptr[a + 1]
            dirty = np.concatenate([[a], self._adj_dst[lo:hi]])
            dirty = dirty[self.sub_size[dirty] > 0]
            if dirty.shape[0]:
                ver[dirty] += 1
                pd = self.p_act[dirty]
                gains = self.W[dirty, pd][:, None].astype(np.float64) - self.W[dirty]
                gains[np.arange(dirty.shape[0]), pd] = np.inf
                gains[:, self.num_sub >= self.max_sub] = np.inf
                gains[self.sizes[None, :] + self.sub_size[dirty][:, None] > self.refine_capacity] = np.inf
                bg = gains.min(axis=1)
                for i in np.flatnonzero(bg < thr).tolist():
                    heapq.heappush(heap, (float(bg[i]), int(dirty[i]), int(ver[dirty[i]])))
        return moves


    # ------------------------------------------------------------------

    def _edge_w_to(self, a: int, rows: np.ndarray) -> np.ndarray:
        """Edge weight between active sub a and each active row in `rows`."""
        lo, hi = self._adj_ptr[a], self._adj_ptr[a + 1]
        out = np.zeros(rows.shape[0], np.int64)
        if hi > lo:
            hs = self._adj_dst[lo:hi]
            ws = self._adj_w[lo:hi]
            pos = {int(h): int(w) for h, w in zip(hs, ws)}
            for i, b in enumerate(rows.tolist()):
                out[i] = pos.get(int(b), 0)
        return out

    def refine_evictions(self, max_rounds: int = 64) -> int:
        """2-move eviction plans (reference Case 2,
        /root/reference/src/refine.rs:131-147, scoring from the paper): when
        the best single move a: f→t is blocked ONLY by refine_capacity,
        consider evicting some sub b: t→e to make room. Exact combined cut
        delta (derived; accounts for the a–b edge both ways):

            delta = (W[a,f] − W[a,t] + w_ab) + (W[b,t] − W[b,e] + w_ab·[e==f])

        The a-term adds w_ab back because W[a,t] counts b while b is leaving;
        the b-term adds it when e == f because W[b,f] counts a while a is
        leaving f (the reference's `from == evict` flag at refine.rs:139-141).
        Greedy best-first over capacity-blocked candidates; both moves are
        applied only when the final state satisfies refine_capacity and
        max_sub. Returns number of applied MOVES (2 per plan)."""
        thr = self.gain_threshold
        nact = self.g_act.shape[0]
        total_moves = 0
        for _ in range(max_rounds):
            own = self.W[np.arange(nact), self.p_act].astype(np.float64)
            raw = own[:, None] - self.W
            raw[np.arange(nact), self.p_act] = np.inf
            raw[self.sub_size == 0, :] = np.inf
            raw[:, self.num_sub >= self.max_sub] = np.inf
            # keep only capacity-BLOCKED improving targets (feasible ones are
            # single moves, already taken by refine())
            fits = (
                self.sizes[None, :] + self.sub_size[:, None] <= self.refine_capacity
            )
            raw[fits] = np.inf
            cand = np.argwhere(raw < thr)
            if cand.shape[0] == 0:
                return total_moves
            order = np.argsort(raw[cand[:, 0], cand[:, 1]])
            best = None  # (delta, a, t, b, e)
            for idx in order[:64].tolist():
                a, t = int(cand[idx, 0]), int(cand[idx, 1])
                f = int(self.p_act[a])
                gain_a = float(self.W[a, f] - self.W[a, t])
                rows_b = np.flatnonzero(
                    (self.p_act == t) & (self.sub_size > 0) & (np.arange(nact) != a)
                )
                if rows_b.shape[0] == 0:
                    continue
                # b must free enough room in t for a
                need = self.sub_size[a] + self.sizes[t] - self.refine_capacity
                rows_b = rows_b[self.sub_size[rows_b] >= need]
                if rows_b.shape[0] == 0:
                    continue
                w_ab = self._edge_w_to(a, rows_b).astype(np.float64)
                # eviction targets: e != t, room for b, sub slot open
                e_open = (self.num_sub < self.max_sub).copy()
                e_open[t] = False
                gb = self.W[rows_b, t][:, None].astype(np.float64) - self.W[rows_b]
                gb[:, ~e_open] = np.inf
                e_fits = (
                    self.sizes[None, :] + self.sub_size[rows_b][:, None]
                    <= self.refine_capacity
                )
                # e == f gets a's size back simultaneously — allow that slack
                e_fits[:, f] = (
                    self.sizes[f] - self.sub_size[a] + self.sub_size[rows_b]
                    <= self.refine_capacity
                )
                gb[~e_fits] = np.inf
                # pair correction: +w_ab always on the a-term; +w_ab on the
                # b-term only when e == f
                delta = gain_a + w_ab[:, None] + gb
                delta[:, f] += w_ab
                bi, e = np.unravel_index(np.argmin(delta), delta.shape)
                d = float(delta[bi, e])
                if np.isfinite(d) and d < thr and (best is None or d < best[0]):
                    best = (d, a, t, int(rows_b[bi]), int(e))
            if best is None:
                return total_moves
            _, a, t, b, e = best
            self._apply(b, e)  # evict first so capacity bookkeeping stays sane
            self._apply(a, t)
            total_moves += 2
        return total_moves


def run_refinement(inp: RefineInput) -> Refiner:
    """fix_balance → (refine ⇄ eviction plans) → fix_balance
    (/root/reference/src/cuttana.rs:54-56; Case-2 eviction plans from
    refine.rs:131-147). Eviction plans can unlock further single moves, so
    the two alternate until neither improves. With eviction plans disabled
    (the default — see RefineInput.enable_eviction_plans) the loop is a
    single refine() pass, which the measurement says loses nothing."""
    r = Refiner(inp)
    r.fix_balance()
    if inp.enable_eviction_plans:
        for _ in range(4):
            r.refine()
            if r.refine_evictions() == 0:
                break
    else:
        r.refine()
    r.fix_balance()
    return r
