"""Physical-plan regression tests: the properties that make these
queries survive a 100× scale-up. If a refactor breaks predicate
pushdown, column pruning, broadcast joins, or heap-based top-k, these
fail before any benchmark notices."""

from __future__ import annotations

import pytest

from csdid_pyspark_spark.queries import QUERIES


def _plan(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the 6 needed columns are read from a 16-column table
    rs = next(line for line in plan.splitlines() if "ReadSchema" in line)
    assert "l_orderkey" not in rs and "l_partkey" not in rs
    assert "l_quantity" in rs and "l_returnflag" in rs


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_star_broadcast")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # filter pushed to orders scan


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "global_topk")
    assert "TakeOrderedAndProject" in plan
    plan2 = _plan(spark, sf_dir, "sim_topk_bruteforce")
    assert "TakeOrderedAndProject" in plan2


def test_range_join_broadcast_nested_loop(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_range_bands")
    assert "BroadcastNestedLoopJoin" in plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    # map-side partial aggregation: HashAggregate appears both before
    # and after the exchange
    plan = _plan(spark, sf_dir, "groupby_mean")
    ex = plan.find("Exchange")
    assert ex > 0
    assert "HashAggregate" in plan[:ex] and "HashAggregate" in plan[ex:]


def test_semi_anti_join_plans(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_semi")
    assert "LeftSemi" in plan
    plan = _plan(spark, sf_dir, "join_anti")
    assert "LeftAnti" in plan


def test_q3_pushdown_and_join_strategy(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    # all three table filters reach their scans
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan
    # top-10 via heap, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_q6_is_pure_scan_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    # the plan string elides long filter lists; match the stable prefix
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "Join" not in plan
    rs = next(line for line in plan.splitlines() if "ReadSchema" in line)
    assert "l_returnflag" not in rs  # pruned to the 4 predicate/agg columns


def test_asof_join_single_window_shuffle(spark, sf_dir):
    """As-of join must not expand into a range join: exactly one
    Exchange for the window (plus one for the right-side pre-agg),
    and no nested-loop join anywhere."""
    plan = _plan(spark, sf_dir, "events_asof_join")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Window" in plan
