"""Unit tests for sub-partition refinement, incl. 2-move eviction plans
(reference Case 2, /root/reference/src/refine.rs:131-147 — scoring stubbed
there, implemented here from the CUTTANA paper)."""

from __future__ import annotations

import numpy as np

from cuttana_spark.partition.refine import Refiner, RefineInput, run_refinement


def _cut(parents, edges):
    return sum(w for a, b, w in edges if parents[a] != parents[b])


def _mk_input():
    """k=2, S=2, n=20. Subs: g0(4), g1(6) in p0; g2(7), g3(3) in p1.
    Edges: g0-g1 w1, g1-g2 w10, g1-g3 w8, g2-g3 w2.
    max_parent = int(10*1.05)+1 = 11; refine_capacity = int(11*1.1) = 12.

    Every improving SINGLE move is capacity-blocked (any sub moving into a
    size-10 partition exceeds 12 except none qualify); the 2-move plan
    [g1: 0->1, evict g2: 1->0] is feasible and improves the cut 18 -> 13
    (exact delta -5 = (1-18+10) + (2-10+10))."""
    edges = [(0, 1, 1), (1, 2, 10), (1, 3, 8), (2, 3, 2)]
    src = np.array([a for a, b, w in edges] + [b for a, b, w in edges], np.int64)
    dst = np.array([b for a, b, w in edges] + [a for a, b, w in edges], np.int64)
    w = np.array([x for _, _, x in edges] * 2, np.int64)
    return (
        RefineInput(
            k=2,
            S=2,
            vertex_count=20,
            balance_slack=0.05,
            info_gain_threshold=1,
            sizes=np.array([10, 10], np.int64),
            sub_size_flat=np.array([4, 6, 7, 3], np.int64),
            edge_src=src,
            edge_dst=dst,
            edge_w=w,
        ),
        edges,
    )


def test_single_move_refine_is_stuck():
    inp, edges = _mk_input()
    r = Refiner(inp)
    assert r.fix_balance() == 0  # balanced: nothing oversized
    assert r.refine() == 0  # every improving single move is capacity-blocked
    assert _cut(r.parents, edges) == 18


def test_eviction_plan_unblocks_the_move():
    inp, edges = _mk_input()
    r = Refiner(inp)
    r.fix_balance()
    assert r.refine() == 0
    moved = r.refine_evictions()
    assert moved == 2  # one 2-move plan
    # g1 joined p1 (with its w10+w8 neighbors), g2 evicted to p0
    assert r.parents[1] == 1 and r.parents[2] == 0
    assert _cut(r.parents, edges) == 13
    # capacities hold in the final state
    assert r.sizes.tolist() == [11, 9]
    assert (r.sizes <= r.refine_capacity).all()


def test_run_refinement_end_to_end_applies_eviction_plans():
    import dataclasses

    inp, edges = _mk_input()
    # eviction plans default OFF (±0.3% cut for up to 9× wall on the BA
    # goldens): the capacity-blocked fixture stays at cut 18
    assert _cut(run_refinement(inp).parents, edges) == 18
    inp = dataclasses.replace(inp, enable_eviction_plans=True)
    r = run_refinement(inp)
    assert _cut(r.parents, edges) == 13
    # W matrix bookkeeping stayed exact through both moves: recompute from
    # scratch and compare
    nact = r.g_act.shape[0]
    W2 = np.zeros((nact, r.k), np.int64)
    for a, b, w in edges:
        W2[r.amap[a], r.p_act[r.amap[b]]] += w
        W2[r.amap[b], r.p_act[r.amap[a]]] += w
    assert (r.W == W2).all()
