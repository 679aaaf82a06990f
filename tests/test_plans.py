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
