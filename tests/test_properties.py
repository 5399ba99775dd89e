"""Property-based invariants (SURVEY §5d) — no Spark session needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from cuttana_spark.partition import CuttanaConfig, cuttana_partition
from cuttana_spark.partition.batched import cuttana_partition_batched


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    density = draw(st.floats(min_value=0.0, max_value=0.3))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    adj = {v: set() for v in range(n)}
    m = int(density * n * (n - 1) / 2)
    for _ in range(m):
        a, b = rng.randint(0, n), rng.randint(0, n)
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return [(v, sorted(ns)) for v, ns in adj.items()]


@settings(max_examples=30, deadline=None)
@given(adj=graphs(), k=st.integers(min_value=1, max_value=8))
def test_sequential_invariants(adj, k):
    res = cuttana_partition(adj, k, CuttanaConfig(num_sub_partitions=16))
    n = len(adj)
    # every streamed vertex assigned exactly once
    assert res.vertices.shape[0] == n
    assert np.unique(res.vertices).shape[0] == n
    assert ((res.partitions >= 0) & (res.partitions < k)).all()
    # sizes consistent
    assert res.partition_sizes.sum() == n
    assert np.array_equal(
        np.bincount(res.partitions, minlength=k), res.partition_sizes
    )
    # balance: fix_balance enforces max_parent = (n/k)(1+slack)+1
    assert res.partition_sizes.max() <= int(n / k * 1.05) + 1
    # metric bounds
    assert 0.0 <= res.edge_cut_ratio <= 1.0
    assert res.edge_count == sum(len(nbrs) for _, nbrs in adj)


@settings(max_examples=15, deadline=None)
@given(adj=graphs(), k=st.integers(min_value=1, max_value=8))
def test_batched_invariants(adj, k):
    res = cuttana_partition_batched(
        adj, k, CuttanaConfig(num_sub_partitions=16), batch_size=7
    )
    n = len(adj)
    assert res.vertices.shape[0] == n
    assert res.partition_sizes.sum() == n
    assert res.partition_sizes.max() <= int(n / k * 1.05) + 1
    assert ((res.partitions >= 0) & (res.partitions < k)).all()


@settings(max_examples=10, deadline=None)
@given(adj=graphs())
def test_determinism_property(adj):
    a = cuttana_partition(adj, 4, CuttanaConfig(num_sub_partitions=16))
    b = cuttana_partition(adj, 4, CuttanaConfig(num_sub_partitions=16))
    assert np.array_equal(a.partitions, b.partitions)
    assert a.cut_count == b.cut_count


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=20))
def test_lpa_oracle_total(labels_texts):
    """LPA oracle assigns every vertex a label that exists in the graph."""
    from cuttana_spark.analytics.labelprop import label_propagation_oracle

    n = len(labels_texts)
    adj = {i: [j for j in range(n) if j != i and (i + j) % 3 == 0] for i in range(n)}
    out = label_propagation_oracle(adj, max_iter=3)
    assert set(out) == set(adj)
    assert all(lb in adj for lb in out.values())


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized oracle: asof_join over seeded random (key, ts) data equals
    pandas.merge_asof(by=key, direction='backward') exactly — including
    duplicate left timestamps and keys missing from the right side."""
    import numpy as np
    import pandas as pd

    from cuttana_spark.operators.asof import asof_join

    rng = np.random.RandomState(11)
    left_pd = pd.DataFrame(
        {
            "k": rng.randint(0, 6, 300),
            "ts": rng.randint(0, 1000, 300),
            "lid": np.arange(300),
        }
    )
    # unique (k, ts) on the right — the operator's determinism contract
    right_pd = (
        pd.DataFrame(
            {
                "k": rng.randint(0, 5, 120),  # key 5 never on the right
                "ts": rng.randint(0, 1000, 120),
                "px": rng.randn(120).round(6),
            }
        )
        .drop_duplicates(["k", "ts"])
        .reset_index(drop=True)
    )

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    got = (
        asof_join(left, right, on="ts", by="k", right_cols=["px"])
        .orderBy("lid")
        .toPandas()
    )

    want = pd.merge_asof(
        left_pd.sort_values("ts", kind="stable"),
        right_pd.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction="backward",
    ).sort_values("lid")
    got_px = got.sort_values("lid")["px_asof"].to_numpy()
    want_px = want["px"].to_numpy()
    both_nan = np.isnan(got_px) & np.isnan(want_px)
    assert (both_nan | (got_px == want_px)).all()


def test_asof_join_bucketed_matches_pandas_merge_asof(spark):
    """Same randomized pandas.merge_asof oracle for the hot-key-safe bucketed
    variant, swept over bucket counts (1 bucket = one window per key;
    many buckets = most buckets empty, matches carried across bucket gaps)."""
    import numpy as np
    import pandas as pd

    from cuttana_spark.operators.asof import asof_join_bucketed

    rng = np.random.RandomState(23)
    left_pd = pd.DataFrame(
        {
            "k": rng.randint(0, 6, 300),
            "ts": rng.randint(0, 1000, 300),
            "lid": np.arange(300),
        }
    )
    right_pd = (
        pd.DataFrame(
            {
                "k": rng.randint(0, 5, 120),
                "ts": rng.randint(0, 1000, 120),
                "px": rng.randn(120).round(6),
            }
        )
        .drop_duplicates(["k", "ts"])
        .reset_index(drop=True)
    )
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    want = pd.merge_asof(
        left_pd.sort_values("ts", kind="stable"),
        right_pd.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction="backward",
    ).sort_values("lid")
    want_px = want["px"].to_numpy()

    for n_buckets in (1, 7, 64, 997):
        got = (
            asof_join_bucketed(
                left, right, on="ts", by="k", right_cols=["px"], n_buckets=n_buckets
            )
            .orderBy("lid")
            .toPandas()
        )
        got_px = got.sort_values("lid")["px_asof"].to_numpy()
        both_nan = np.isnan(got_px) & np.isnan(want_px)
        assert (both_nan | (got_px == want_px)).all(), f"n_buckets={n_buckets}"
