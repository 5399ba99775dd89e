"""Physical-plan quality assertions — the scale contract, checked in CI:
pushed filters, pruned scans, broadcast dimensions, no cartesian products,
bounded exchanges. A plan that silently regresses to a full scan or a
nested-loop join would still pass value checks at fixture scale and only
explode at 100x — these tests pin the plan shape itself."""

from __future__ import annotations

import __spark_entry__ as se

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(se.queries()["pricing_summary"](spark, SF))
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # scan must not read unused columns
    read = plan.split("ReadSchema")[1][:400]
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_star_joins_broadcast_dimensions(spark):
    for name, min_bcast in [("region_revenue", 2), ("supplier_part_revenue", 3)]:
        plan = _plan(se.queries()[name](spark, SF))
        assert plan.count("BroadcastHashJoin") >= min_bcast, name
        assert "CartesianProduct" not in plan, name


def test_bucketed_ann_paths_have_no_cartesian_product(spark):
    for name in ("embedding_near_dups", "lsh_ann", "minhash_sigs", "ngram_jaccard"):
        plan = _plan(se.queries()[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_edge_derivation_exchange_budget(spark):
    # window on conv_id + weight agg: exactly 2 exchanges end-to-end
    plan = _plan(se.queries()["edges_from_transcripts"](spark, SF))
    assert plan.count("Exchange") <= 2, plan.count("Exchange")


def test_whole_stage_codegen_on_relational_paths(spark):
    df = se.queries()["conditional_pivot"](spark, SF)
    df.collect()  # AQE finalizes the plan (and codegen markers) on execution
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # codegen spans render as "*(n) Operator" in the compact plan string
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # map-side partial aggregation before the shuffle
    assert "partial_sum" in plan


def test_asof_bucketed_plan_has_no_global_window(spark):
    """asof_join_bucketed must never fall back to a partition-less window
    (the straggler shape it exists to avoid): every Window in the plan
    carries a partition spec including the bucket column."""
    from cuttana_spark.operators.asof import asof_join_bucketed

    left = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(100)], "lid long, k long, ts double"
    )
    right = spark.createDataFrame(
        [(i % 3, float(i * 2), float(i)) for i in range(50)], "k long, ts double, px double"
    )
    out = asof_join_bucketed(left, right, on="ts", by="k", n_buckets=8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "_b" in spec, f"window without bucket in partition spec: {spec}"
