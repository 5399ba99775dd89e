"""Incremental sessionization with Structured Streaming.

Custom stateful operator (applyInPandasWithState keyed by user_id): a
session closes when the gap to the next event exceeds `gap_sec`. Closed
sessions are emitted as they close (append mode) with their (start, end)
bounds — `session_end` is the per-session high-water mark, which lets the
driver oracle recompute the append-mode emission frontier from max(ts)
(closed ⟺ end < the user's final-event ts). The running open session lives
in state — (last_ts, session_start, n_events, sum_value_e6) — so a session
spanning micro-batches is aggregated exactly once.

Vectorized inside the operator: gaps via shifted numpy timestamp arrays,
session boundaries via cumsum over the gap mask — no per-row Python.

Equivalence contract (tested): the stream's closed sessions equal the batch
sessionization (operators-style window + running sum) minus each user's
final — still open — session.

Late-data approximation (same contract as streaming/edge_stream.py): rows
arriving with ts at or before the stored per-user high-water mark (last_ts)
are folded into the CURRENT open session — their gap to last_ts is <= 0, so
they never split a session retroactively, and last_ts itself only advances
(never regresses on a fully-late micro-batch). Exact cross-batch aggregation
holds for in-order arrival; under late arrival counts/sums are still exact,
only the session BOUNDARY assignment of late rows is approximate (bounded
state, no retraction — the standard streaming trade-off).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start double, session_end double, "
    "n_events long, sum_value_e6 long"
)
STATE_SCHEMA = "last_ts double, session_start double, n_events long, sum_value_e6 long"
GAP_SEC = 1800.0


def _sessions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    # vectorized epoch-seconds; go through INTEGER microseconds (µs counts
    # stay < 2^53 so the int→float conversion is exact — int64 nanoseconds
    # are not, and ns/1e9 drifts up to ~256 ns from Timestamp.timestamp())
    ts = rows["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64) / 1e6
    vals = np.round(rows["value"].to_numpy(np.float64) * 1e6).astype(np.int64)
    uid = int(key[0])

    if state.exists:
        last_ts, sess_start, n_ev, sum_e6 = state.get
    else:
        last_ts, sess_start, n_ev, sum_e6 = None, None, 0, 0

    # session boundary BEFORE row i: gap from the previous event (stored
    # last_ts for i=0) exceeds GAP_SEC; segment 0 continues the stored open
    # session, segments 1..n start at ts[new_sess]
    prev = np.concatenate([[last_ts if last_ts is not None else -np.inf], ts[:-1]])
    new_sess = (ts - prev) > GAP_SEC
    if last_ts is None:
        new_sess[0] = True
    seg = np.cumsum(new_sess)
    n_segs = int(seg[-1])
    starts = ts[new_sess]
    # session END at each boundary = the high-water mark BEFORE the boundary
    # row (running max, not just the previous row's ts: a fully-late row
    # folded into the open session must not understate its end — the stored
    # last_ts at position 0 dominates any folded late rows)
    ends = np.maximum.accumulate(prev)[new_sess]

    # per-segment aggregates in two bincounts (values < 2^53 stay exact as
    # float64 weights)
    n_per = np.bincount(seg, minlength=n_segs + 1)
    sum_per = np.bincount(seg, weights=vals.astype(np.float64), minlength=n_segs + 1).astype(
        np.int64
    )

    closed_rows = []
    if last_ts is not None:
        open_sess = (sess_start, n_ev + int(n_per[0]), sum_e6 + int(sum_per[0]))
    else:
        open_sess = None
    for s in range(1, n_segs + 1):  # loop is per SESSION, not per row
        if open_sess is not None:
            # the session closing at boundary s ends at ends[s-1]
            closed_rows.append((uid, open_sess[0], float(ends[s - 1]), open_sess[1], open_sess[2]))
        open_sess = (float(starts[s - 1]), int(n_per[s]), int(sum_per[s]))

    # Clamp last_ts FORWARD only (like edge_stream._transitions): if the whole
    # micro-batch is late (ts[-1] < stored last_ts), the stored high-water mark
    # must not regress, or the next batch would measure gaps against a stale
    # earlier timestamp and split the open session spuriously.
    new_last = float(ts[-1]) if last_ts is None else float(max(ts[-1], float(last_ts)))
    state.update((new_last, open_sess[0], int(open_sess[1]), int(open_sess[2])))
    yield pd.DataFrame(
        closed_rows,
        columns=["user_id", "session_start", "session_end", "n_events", "sum_value_e6"],
    )


def streaming_sessions(
    spark: SparkSession, source_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """readStream(parquet events dir) → closed-session stream."""
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .parquet(source_dir)
        .withWatermark("ts", watermark)
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _sessions,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def materialize_sessions(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    q = (
        streaming_sessions(spark, source_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
