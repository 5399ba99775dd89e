"""Partition-driven physical layout: bucketing elides exchanges; exact
metrics from the final assignment."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from cuttana_spark.partition import cuttana_partition
from cuttana_spark.partition.materialize import (
    co_partitioned_edges,
    exact_metrics,
    write_partitioned,
)


@pytest.fixture(scope="module")
def graph(spark):
    G = nx.barabasi_albert_graph(500, 3, seed=3)
    edges = spark.createDataFrame(
        [(int(u), int(v), 1) for u, v in G.edges()], "src long, dst long, weight long"
    ).cache()
    adj = [(v, sorted(G.neighbors(v))) for v in sorted(G.nodes())]
    res = cuttana_partition(adj, 4)
    vp = res.to_spark_df(spark).select("vertex", "partition_id").cache()
    return edges, vp, res


def test_exact_metrics_consistent(spark, graph):
    edges, vp, res = graph
    m = exact_metrics(edges, vp, 4)
    assert m["edges"] == edges.count()
    # exact cut fraction over undirected edges == recount oracle
    part = dict((r.vertex, r.partition_id) for r in vp.collect())
    cut = sum(1 for r in edges.collect() if part[r.src] != part[r.dst])
    assert m["cut_edges"] == cut
    # refinement must not be worse than the streaming-reported metric by
    # more than the balance moves allow; and balance within the hard bound
    assert m["balance"] <= 1.05 * 1.01 + 0.01


def test_bucketed_join_elides_exchange(spark, graph, tmp_path):
    import uuid

    edges, vp, _ = graph
    # unique prefix: managed-table locations persist across sessions in the
    # (gitignored) spark-warehouse dir
    vt, et = write_partitioned(spark, vp, edges, f"mat_{uuid.uuid4().hex[:8]}", 4)
    # force a non-broadcast join so the bucketed-scan co-location is what
    # the planner must rely on
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = et.join(vt, "partition_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # both sides bucketed by partition_id → no shuffle exchange
    assert "Exchange hashpartitioning" not in plan, plan[:800]
    assert "SortMergeJoin" in plan


def test_co_partitioned_edges_flags(spark, graph):
    edges, vp, _ = graph
    ce = co_partitioned_edges(edges, vp)
    assert ce.filter("is_cut AND src_pid = dst_pid").count() == 0
    assert ce.count() == edges.count()
