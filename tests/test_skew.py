"""Salted two-stage aggregation equals the direct aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from cuttana_spark.operators import skew as K


def test_salted_sum_equals_direct(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    direct = {
        (r.event_type): r.s
        for r in ev.groupBy("event_type").agg(F.sum("value").alias("s")).collect()
    }
    salted = {
        r.event_type: r.sum_value
        for r in K.salted_sum(ev, "event_type", "value", salt=16).collect()
    }
    assert set(direct) == set(salted)
    for k in direct:
        assert abs(direct[k] - salted[k]) < 1e-6


def test_salted_count_hot_key(spark):
    # one extremely hot key + long tail
    df = spark.range(100_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hub")).otherwise(
            F.concat(F.lit("v"), (F.col("id") % 97).cast("string"))
        ).alias("k")
    )
    got = {r.k: r["count"] for r in K.salted_count(df, "k", salt=32).collect()}
    want = {r.k: r["cnt"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == want


def test_top_hubs(spark):
    rows = [(0, i, 1.0) for i in range(1, 200)] + [(1, 2, 1.0)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    hubs = {r.vertex for r in K.top_hubs(edges, threshold=100).collect()}
    assert hubs == {0}
