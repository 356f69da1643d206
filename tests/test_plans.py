"""Physical-plan assertions: lock in the optimizations the engine's
performance story depends on (SURVEY.md §4). If one of these regresses,
the query still returns correct rows — but would fall over at 100 TB."""

import pytest

from govgis_nov2023_slim_spatial_server_spark.catalog import QUERIES


def _plan(spark, sf_dir, name) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_flagship_prunes_and_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "flagship_hybrid_search")
    # column pruning: documents scan must not read the heavy text column
    doc_scan = next(l for l in plan.splitlines() if "documents.parquet" in l)
    assert "text" not in doc_scan.split("ReadSchema")[0].split("FileScan")[1].split("]")[0]
    # the lang filter reaches the scan
    assert "lower(lang" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q5_star_join_all_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_knn_is_takeordered_not_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "knn_topk")
    assert "TakeOrderedAndProject" in plan
    # no full exchange-then-sort for a top-k
    assert "rangepartitioning" not in plan.lower()


def test_q1_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # map-side partial agg before the shuffle (two HashAggregate levels)
    assert plan.count("HashAggregate") >= 2
    # shipdate filter pushed into the scan
    scan = next(l for l in plan.splitlines() if "lineitem.parquet" in l)
    assert "l_shipdate" in scan


def test_semi_join_stays_semi(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_semi_customers_with_orders")
    assert "LeftSemi" in plan


def test_exact_quantiles_pass2_pushdown_and_broadcast(spark, sf_dir):
    """Pass 2 of the two-pass quantile must (a) push the widened
    o_totalprice bin ranges into the parquet scan (row-group min/max
    pruning — the reason the pass is cheap at 100 TB) and (b) probe the
    target bins via broadcast, never a shuffled join."""
    plan = _plan(spark, sf_dir, "exact_quantiles_histogram")
    scan = next(l for l in plan.splitlines() if "orders.parquet" in l)
    assert "o_totalprice" in scan.split("PushedFilters")[1]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_iterations_broadcast_messages(spark, sf_dir):
    """Each PageRank iteration broadcasts the node-sized message table
    into the edge list (3 iterations ⇒ ≥3 broadcast joins); the edge
    self-join is checkpointed, so the lineitem⋈lineitem shape must NOT
    appear repeated per iteration."""
    plan = _plan(spark, sf_dir, "pagerank_power_iters")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "TakeOrderedAndProject" in plan
    # the checkpointed edge list appears as a scan leaf, not a re-run join
    assert plan.count("lineitem.parquet") == 0
