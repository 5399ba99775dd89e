"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive the event-type transition graph from sf0.001 events
    (window + lag + agg) and return top-20 nodes by weighted degree."""
    from cuttana_spark.operators import edges as E

    ev = _events(spark, "/root/testdata/sf0.001")
    e = E.events_sequence_edges(ev)
    both = e.select(F.col("src_key").alias("node"), "weight").unionAll(
        e.select(F.col("dst_key").alias("node"), "weight")
    )
    return (
        both.groupBy("node")
        .agg(F.sum("weight").alias("weighted_degree"))
        .orderBy(F.desc("weighted_degree"), "node")
        .limit(20)
    )


# --------------------------------------------------------------------------
# queries() / oracle_sql() registry. Each Spark callable and its SQL oracle
# must produce identical column names (driver hashes values sorted by name).
# --------------------------------------------------------------------------


def _q_edges_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cuttana_spark.operators import edges as E

    return E.events_sequence_edges(_events(spark, sf_dir))


_ORACLE_EDGES_FROM_EVENTS = """
WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT least(prev_type, event_type) AS src_key,
       greatest(prev_type, event_type) AS dst_key,
       count(*) AS weight
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def _q_degree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cuttana_spark.operators import edges as E

    e = E.events_sequence_edges(_events(spark, sf_dir))
    both = e.select(F.col("src_key").alias("node"), "weight").unionAll(
        e.select(F.col("dst_key").alias("node"), "weight")
    )
    return (
        both.groupBy("node")
        .agg(F.sum("weight").alias("weighted_degree"))
        .orderBy(F.desc("weighted_degree"), "node")
        .limit(10)
    )


_ORACLE_DEGREE_TOPK = """
WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), e AS (
  SELECT least(prev_type, event_type) AS src_key,
         greatest(prev_type, event_type) AS dst_key,
         count(*) AS weight
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
), deg AS (
  SELECT src_key AS node, weight FROM e
  UNION ALL
  SELECT dst_key AS node, weight FROM e
)
SELECT node, sum(weight) AS weighted_degree
FROM deg GROUP BY node
ORDER BY weighted_degree DESC, node LIMIT 10
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edges_from_events": _q_edges_from_events,
        "degree_topk": _q_degree_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "edges_from_events": _ORACLE_EDGES_FROM_EVENTS,
        "degree_topk": _ORACLE_DEGREE_TOPK,
    }
