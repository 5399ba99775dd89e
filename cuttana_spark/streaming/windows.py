"""Event-time windowed aggregation with watermarks (Structured Streaming).

Covers the late-data path of the engine's streaming surface: tumbling
event-time windows over the events stream with a watermark bounding state;
events later than the watermark horizon are dropped, everything else lands
in its event-time window regardless of arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream → watermark → tumbling-window counts per event_type."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            # hash-oracle-safe money convention: scale each value to int64
            # BEFORE aggregating so any SQL engine sums identical integers
            F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sum_value_e6"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "sum_value_e6",
        )
    )


def run_windowed_counts(
    spark: SparkSession, source_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    """availableNow-bounded run writing append-mode window results."""
    q = (
        windowed_event_counts(spark, source_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def batch_equivalent(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The batch plan the stream's closed windows converge to."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("sum_value_e6"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "sum_value_e6",
        )
    )
