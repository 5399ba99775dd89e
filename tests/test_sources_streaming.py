"""Adjacency sources (reference S1/S2 parity) + streaming edge derivation."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cuttana_spark.sources import adjacency as A


def test_from_csv_space_delimited(spark, tmp_path):
    p = tmp_path / "g.adj"
    p.write_text("0 1 2\n\n1 0\n2 0\n")  # blank line skipped (stream.rs:32-34)
    df = A.from_csv(spark, str(p)).orderBy("src")
    rows = [(r.src, r.nbrs) for r in df.collect()]
    assert rows == [(0, [1, 2]), (1, [0]), (2, [0])]


def test_from_csv_comma_delimited(spark, tmp_path):
    p = tmp_path / "g.csv"
    p.write_text("5, 6 ,7\n6,5\n7,5\n")
    df = A.from_csv(spark, str(p), delimiter=",").orderBy("src")
    rows = [(r.src, sorted(r.nbrs)) for r in df.collect()]
    assert rows == [(5, [6, 7]), (6, [5]), (7, [5])]


def test_csv_to_partitioner_end_to_end(spark, tmp_path):
    """The reference unit-test flow (tests/partition_tests.rs) through the
    Spark source: CSV → adjacency DF → partitioner."""
    from cuttana_spark.partition import cuttana_partition_df

    p = tmp_path / "g.adj"
    p.write_text("0 1 2\n1 0\n2 0\n")
    adj = A.from_csv(spark, str(p))
    res = cuttana_partition_df(adj, 16)
    assert res.vertex_count == 3 and res.edge_count == 4


def test_to_edges_roundtrip(spark):
    adj = A.from_adjacency_list(spark, [(0, [1, 2]), (1, [0]), (2, [0])])
    e = {(r.src, r.dst, r.weight) for r in A.to_edges(adj).collect()}
    assert e == {(0, 1, 1), (0, 2, 1)}


def test_streaming_edges_equal_batch(spark, sf_dir, tmp_path):
    """Structured-Streaming incremental edges == batch window-lag derivation
    after aggregation (availableNow trigger → deterministic, bounded)."""
    from cuttana_spark.streaming.edge_stream import materialize_stream, run_batch_equivalent

    src_dir = str(tmp_path / "events_in")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.write.mode("overwrite").parquet(src_dir)

    out_dir = str(tmp_path / "edges_out")
    materialize_stream(spark, src_dir, str(tmp_path / "ckpt"), out_dir)

    streamed = (
        spark.read.parquet(out_dir)
        .groupBy("src_key", "dst_key")
        .agg(F.sum("weight").alias("weight"))
    )
    batch = run_batch_equivalent(spark, ev)
    got = {(r.src_key, r.dst_key, r.weight) for r in streamed.collect()}
    want = {(r.src_key, r.dst_key, r.weight) for r in batch.collect()}
    assert got == want


def test_iter_adjacency_batches_rebases_sliced_offsets(spark):
    """A >65536-row adjacency forces toArrow().to_batches to SLICE the list
    column: sliced ListArrays keep raw offsets (offsets[0] > 0) into the full
    child array. The seam must rebase each batch to zero-based contiguous
    (offsets, values) or every batch after the first silently reads wrong
    neighbor slices (round-1 ADVICE, batched.add_batch corruption)."""
    import numpy as np

    from cuttana_spark.partition.core import iter_adjacency_batches

    n = 70_000  # > 65536 so at least two sliced batches
    df = spark.range(n).coalesce(1).selectExpr(
        "id AS src", "array(id + 1, id * 2) AS nbrs"
    )
    seen = 0
    batches = 0
    for src, offsets, values in iter_adjacency_batches(df):
        batches += 1
        assert offsets[0] == 0
        assert offsets[-1] == values.shape[0]
        lens = np.diff(offsets)
        assert (lens == 2).all()
        # each row's slice must be exactly (src+1, src*2)
        assert (values[0::2] == src + 1).all()
        assert (values[1::2] == src * 2).all()
        seen += src.shape[0]
    assert batches >= 2
    assert seen == n


def test_batched_partitioner_same_result_sliced_vs_whole(spark):
    """Batched partitioner fed per-Arrow-batch chunks (sliced path) must
    produce the identical assignment to one monolithic add_batch call."""
    import numpy as np

    from cuttana_spark.partition.batched import BatchedCuttanaPartitioner
    from cuttana_spark.partition.core import iter_adjacency_batches

    n = 70_000
    df = spark.range(n).coalesce(1).selectExpr(
        "id AS src", "array((id + 1) % 70000, (id * 7 + 3) % 70000) AS nbrs"
    )
    chunks = list(iter_adjacency_batches(df))

    p1 = BatchedCuttanaPartitioner(4)
    for src, offsets, values in chunks:
        p1.add_batch(src, offsets, values)
    r1 = p1.finish()

    src_all = np.concatenate([c[0] for c in chunks])
    vals_all = np.concatenate([c[2] for c in chunks])
    lens_all = np.concatenate([np.diff(c[1]) for c in chunks])
    offs_all = np.concatenate([[0], np.cumsum(lens_all)])
    p2 = BatchedCuttanaPartitioner(4)
    p2.add_batch(src_all, offs_all, vals_all)
    r2 = p2.finish()

    assert (r1.vertices == r2.vertices).all()
    assert (r1.partitions == r2.partitions).all()
    assert (r1.sub_partitions == r2.sub_partitions).all()
    assert r1.edge_cut_ratio == r2.edge_cut_ratio


def test_streaming_out_of_order_cross_batch(spark, tmp_path):
    """A late event (within the watermark) arriving in a later micro-batch
    must be merged BEFORE the stored event, and the state must not regress:
    history a(100) b(200), then late c(150), then d(250) must emit
    (a,b), (b,c) [late chained into stored], then (b,d) — with the buggy
    last-wins state, d would have chained off c instead."""
    import datetime as dt

    from cuttana_spark.streaming.edge_stream import materialize_stream

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    # one source dir, one appended file per micro-batch round
    src.mkdir()
    b1 = [(1, t(10), 7, "a", 0.0, ""), (2, t(20), 7, "b", 0.0, "")]
    b2 = [(3, t(15), 7, "c", 0.0, "")]  # late: between a and b
    b3 = [(4, t(25), 7, "d", 0.0, "")]
    d = str(src)
    for i, rows in enumerate([b1, b2, b3]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(d)
        materialize_stream(spark, d, ckpt, out)

    got = sorted(
        (r.src_key, r.dst_key) for r in spark.read.parquet(out).collect()
    )
    assert got == [("a", "b"), ("b", "c"), ("b", "d")]


def test_streaming_sessions_cross_batch(spark, tmp_path):
    """Closed sessions emitted by the stream equal the numpy oracle's closed
    sessions, including a session spanning two micro-batches (state carries
    the open session's aggregates across the batch boundary)."""
    import datetime as dt

    import numpy as np

    from cuttana_spark.streaming.sessions import GAP_SEC, materialize_sessions

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    t0 = dt.datetime(2024, 1, 1)
    sec = lambda s: t0 + dt.timedelta(seconds=s)
    # user 7: session A (0s, 100s), session B (3000s, 3100s | 3200s in batch2),
    # session C (9000s) — B SPANS the batch boundary; C stays open (never emitted)
    b1 = [
        (1, sec(0), 7, "click", 1.5, ""),
        (2, sec(100), 7, "view", 2.25, ""),
        (3, sec(3000), 7, "click", 4.0, ""),
        (4, sec(3100), 7, "view", 0.5, ""),
    ]
    b2 = [
        (5, sec(3200), 7, "click", 1.0, ""),
        (6, sec(9000), 7, "purchase", 8.0, ""),
    ]
    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ck")
    src.mkdir()
    for rows in (b1, b2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(src))
        materialize_sessions(spark, str(src), ckpt, out)

    got = sorted(
        (r.user_id, r.session_start, r.n_events, r.sum_value_e6)
        for r in spark.read.parquet(out).collect()
    )
    base = t0.timestamp()
    want = [
        (7, base + 0.0, 2, int(np.round(1.5 * 1e6)) + int(np.round(2.25 * 1e6))),
        (7, base + 3000.0, 3, int(np.round(4.0 * 1e6)) + int(np.round(0.5 * 1e6)) + int(np.round(1.0 * 1e6))),
    ]
    assert got == want
    assert GAP_SEC == 1800.0


def test_streaming_sessions_fully_late_batch_keeps_watermark(spark):
    """A micro-batch whose rows are ALL older than the stored last_ts must not
    regress the high-water mark: the late rows fold into the open session and
    a subsequent in-order batch still measures its gap from the true max ts
    (no spurious session split). Unit-level: drive _sessions with a fake
    GroupState."""
    import pandas as pd

    from cuttana_spark.streaming.sessions import GAP_SEC, _sessions

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    t0 = 1_700_000_000.0
    mk = lambda specs: pd.DataFrame(
        {
            "event_id": [i for i, _ in enumerate(specs)],
            "ts": pd.to_datetime([t0 + s for s, _ in specs], unit="s"),
            "user_id": [7] * len(specs),
            "event_type": ["click"] * len(specs),
            "value": [v for _, v in specs],
            "props": [""] * len(specs),
        }
    )
    st = FakeState()
    run = lambda specs: pd.concat(list(_sessions((7,), iter([mk(specs)]), st)))

    out1 = run([(0.0, 1.0), (200.0, 2.0)])
    assert len(out1) == 0 and st.get[0] == t0 + 200.0
    # fully-late batch: ts 150 < stored last_ts 200 -> watermark must HOLD
    out2 = run([(150.0, 4.0)])
    assert len(out2) == 0
    assert st.get[0] == t0 + 200.0  # did not regress
    # in-order continuation within GAP_SEC of the TRUE max: same session
    out3 = run([(200.0 + GAP_SEC - 1, 8.0)])
    assert len(out3) == 0  # still open, no spurious split
    # far-future event closes the one session with all four rows aggregated
    out4 = run([(200.0 + 3 * GAP_SEC, 16.0)])
    assert len(out4) == 1
    r = out4.iloc[0]
    assert r.n_events == 4 and r.sum_value_e6 == int((1 + 2 + 4 + 8) * 1e6)
    assert r.session_start == t0


def test_streaming_sessions_bulk_matches_numpy_oracle(spark, sf_dir, tmp_path):
    """All closed sessions over the sf0.001 events table match a pure-numpy
    sessionizer with identical semantics (per user: sort by ts/event_id,
    close on gap > GAP_SEC, drop the final open session)."""
    import numpy as np

    from cuttana_spark.streaming.sessions import GAP_SEC, materialize_sessions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "src")
    ev.write.mode("overwrite").parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    materialize_sessions(spark, src, ckpt, out)
    got = sorted(
        (r.user_id, r.session_start, r.n_events, r.sum_value_e6)
        for r in spark.read.parquet(out).collect()
    )

    rows = ev.select("user_id", "ts", "event_id", "value").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts.timestamp(), r.event_id, r.value))
    want = []
    for uid, evs in by_user.items():
        evs.sort()
        sess = []
        cur = None
        last = None
        for ts, _, val in evs:
            if cur is None or ts - last > GAP_SEC:
                if cur is not None:
                    sess.append(cur)
                cur = [ts, 0, 0]
            cur[1] += 1
            cur[2] += int(np.round(val * 1e6))
            last = ts
        # final session stays open — not emitted by the stream
        want.extend((uid, s[0], s[1], s[2]) for s in sess)
    assert got == sorted(want)
