"""Incremental edge derivation with Structured Streaming.

The reference's "stream" is a bounded single-pass iterator with no time axis
(/root/reference/src/stream.rs:14-16; SURVEY §2.1 notes watermarks/windows
are absent there). This module adds the genuinely-streaming ingest path our
engine needs at 10^12-turn scale: events arrive as files (or Kafka in
production), and the per-user transition edges are emitted *incrementally*
with a custom stateful operator — applyInPandasWithState keyed by user_id,
whose state is just the last (ts, event_id, event_type) seen per user.

Late data: incoming rows are merged around the stored last event in
(ts, event_id) order — late rows (within the watermark) chain among
themselves and into the stored event, and state only advances forward. A
late segment's splice into history cannot retract the already-emitted edge
(bounded single-event state); exact for in-order-per-user data. A watermark
on ts bounds state (events later than the horizon are dropped by Spark
before reaching the operator).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EDGE_SCHEMA = "src_key string, dst_key string, weight long"
STATE_SCHEMA = "last_ts double, last_event_id long, last_type string"


def _transitions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Vectorized stateful transition emitter (no per-row Python).

    The batch's rows are merged IN (ts, event_id) ORDER around the stored
    last event: rows later than the stored event chain off it as usual; rows
    arriving late (within the watermark but ordered BEFORE the stored event)
    chain among themselves and into the stored event. The state advances
    only to the max(stored, batch) event, never backwards. With one-event
    state this is exact for in-order data; for a late segment it emits the
    segment's edges and its link to the stored event but cannot retract the
    previously-emitted edge that the segment splices into (documented
    bounded-state approximation).
    """
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    # vectorized epoch-seconds; go through INTEGER microseconds (µs counts
    # stay < 2^53 so the int→float conversion is exact — int64 nanoseconds
    # are not, and ns/1e9 drifts up to ~256 ns from Timestamp.timestamp())
    ts = rows["ts"].to_numpy(dtype="datetime64[us]").astype("int64") / 1e6
    eid = rows["event_id"].to_numpy()
    types = rows["event_type"].to_numpy(dtype=object)

    if state.exists:
        s_ts, s_eid, s_type = state.get
        after = (ts > s_ts) | ((ts == s_ts) & (eid > s_eid))
        # merged order: [late rows..., stored event, fresh rows...]
        seq = list(types[~after]) + [s_type] + list(types[after])
        # the first late row's true predecessor is unknown (its edge was
        # already emitted against the stored event in an earlier batch) —
        # consecutive pairs over the merged sequence start at seq[0]->seq[1]
        arr = np.asarray(seq, dtype=object)
        prev, cur = arr[:-1], arr[1:]
        # advance state only forward
        if after.any():
            j = int(np.flatnonzero(after)[-1])
            state.update((float(ts[j]), int(eid[j]), str(types[j])))
    else:
        arr = types
        prev, cur = arr[:-1], arr[1:]
        state.update((float(ts[-1]), int(eid[-1]), str(types[-1])))

    le = prev.astype(str) <= cur.astype(str)
    lo = np.where(le, prev, cur)
    hi = np.where(le, cur, prev)
    yield pd.DataFrame(
        {"src_key": lo, "dst_key": hi, "weight": np.ones(len(lo), dtype="int64")}
    )


def streaming_event_edges(
    spark: SparkSession, source_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """readStream(parquet dir of events) → incremental per-user transition
    edge stream (un-aggregated; aggregate downstream or in the sink)."""
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .parquet(source_dir)
        .withWatermark("ts", watermark)
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _transitions,
        outputStructType=EDGE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_batch_equivalent(spark: SparkSession, events: DataFrame) -> DataFrame:
    """The batch plan the stream converges to (for equivalence tests)."""
    from cuttana_spark.operators.edges import events_sequence_edges

    return events_sequence_edges(events)


def materialize_stream(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    """Run the stream over all currently-available files (availableNow) and
    write the raw edge emissions to parquet; deterministic and bounded —
    used by tests to prove stream ≡ batch."""
    q = (
        streaming_event_edges(spark, source_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
