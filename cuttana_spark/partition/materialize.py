"""Materialize Cuttana partitions as physical layout.

The partitioner's output (vertex → partition_id/sub_partition_id) only pays
off when it drives the physical layout of downstream tables:

  * ``write_partitioned``   — vertex + edge tables written bucketed by
    partition_id; any later join/cogroup on partition_id reads them with the
    exchange elided (asserted in tests via the physical plan);
  * ``repartition_by_partition`` — in-memory co-location for one-shot jobs;
  * ``co_partitioned_edges``   — edges annotated with src/dst partition ids
    plus the cut/internal split, the working set for superstep engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def co_partitioned_edges(edges: DataFrame, vertex_partitions: DataFrame) -> DataFrame:
    """(src, dst, weight, src_pid, dst_pid, is_cut)."""
    vp_src = vertex_partitions.select(
        F.col("vertex").alias("src"), F.col("partition_id").alias("src_pid")
    )
    vp_dst = vertex_partitions.select(
        F.col("vertex").alias("dst"), F.col("partition_id").alias("dst_pid")
    )
    return (
        edges.join(vp_src, "src")
        .join(vp_dst, "dst")
        .withColumn("is_cut", F.col("src_pid") != F.col("dst_pid"))
    )


def exact_metrics(edges: DataFrame, vertex_partitions: DataFrame, k: int) -> dict:
    """Exact post-hoc partition metrics from the FINAL assignment (the
    streaming metric in PartitionResult is the reference's convention;
    this is the ground truth after refinement). One join+agg (SURVEY P8)."""
    ce = co_partitioned_edges(edges, vertex_partitions)
    row = ce.agg(
        F.count(F.lit(1)).alias("edges"),
        F.sum(F.col("is_cut").cast("long")).alias("cut"),
    ).first()
    n = vertex_partitions.count()
    sizes = (
        vertex_partitions.groupBy("partition_id").count().agg(F.max("count")).first()[0]
    )
    return {
        "edges": row.edges,
        "cut_edges": row.cut,
        "cut_fraction": row.cut / row.edges if row.edges else 0.0,
        "balance": sizes / (n / k) if n else 0.0,
    }


def repartition_by_partition(df: DataFrame, k: int) -> DataFrame:
    """Hash-co-locate any table carrying partition_id into k tasks."""
    return df.repartition(k, "partition_id")


def write_partitioned(
    spark: SparkSession,
    vertex_partitions: DataFrame,
    edges: DataFrame,
    prefix: str,
    k: int,
) -> tuple[DataFrame, DataFrame]:
    """Write vertex + co-partitioned edge tables bucketed by partition_id;
    returns the (re-read) bucketed tables."""
    vtable, etable = f"{prefix}_vertices", f"{prefix}_edges"
    vertex_partitions.write.bucketBy(k, "partition_id").mode("overwrite").saveAsTable(
        vtable
    )
    ce = co_partitioned_edges(edges, vertex_partitions).withColumnRenamed(
        "src_pid", "partition_id"
    )
    ce.write.bucketBy(k, "partition_id").mode("overwrite").saveAsTable(etable)
    return spark.table(vtable), spark.table(etable)
