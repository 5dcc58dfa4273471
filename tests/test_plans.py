"""Physical-plan quality guards — the scale properties the engine promises
(SURVEY §4): predicate pushdown + column pruning into the parquet scan,
broadcast joins for small sides, TakeOrderedAndProject for top-k, no
whole-table sort for dedup windows. Regressions here mean a 100 TB plan
got silently worse even if results stay correct."""

from __future__ import annotations

from airbnb_listings_data_pipelines_spark.queries.registry import load_all

from .conftest import SF_SMALL

REG = load_all()


def _plan(spark, name: str) -> str:
    return REG[name].fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    p = _plan(spark, "q02_filter_projection")
    scan = next(line for line in p.splitlines() if "FileScan" in line)
    # filters reach the scan node
    assert "l_returnflag" in scan.split("DataFilters")[-1]
    # only the 6 needed columns are read, not all 11
    assert "l_extendedprice" not in scan


def test_small_dims_broadcast(spark):
    p = _plan(spark, "q03_join_topk_revenue")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_topk_uses_take_ordered(spark):
    # ORDER BY + LIMIT must not global-sort (q21; adhoc b's top-5 pattern)
    assert "TakeOrderedAndProject" in _plan(spark, "q21_global_topk")


def test_scalar_subquery_broadcast_not_shuffle(spark):
    p = _plan(spark, "q06_scalar_subquery")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_lag_window_runs_on_aggregated_rows(spark):
    # q09: the single-partition window must sit ABOVE the hash aggregate
    # (windowing ~84 monthly rows), never over the base table
    p = _plan(spark, "q09_lag_mom_change")
    agg_pos = p.find("HashAggregate")
    win_pos = p.find("Window")
    assert win_pos != -1 and agg_pos != -1
    # executed plans print top-down: Window node appears before (above) the agg
    assert win_pos < agg_pos


def test_quality_features_single_tokenization(spark):
    # the regex split must appear once in the projection, not per metric
    p = _plan(spark, "x03_quality_scores")
    assert p.count("split(") == 1


def test_fact_listing_joins_all_broadcast(spark, tmp_path_factory):
    from airbnb_listings_data_pipelines_spark.plans.pipeline import run_pipeline

    from .fixtures import write_fixtures

    data_dir = write_fixtures(tmp_path_factory.mktemp("plan_fixtures"))
    res = run_pipeline(spark, data_dir, register_views=False)
    p = res.fact_listing._jdf.queryExecution().executedPlan().toString()
    # location lookups (~4.5k rows at reference scale) must broadcast:
    # 2 suburb joins + 2 code-resolution joins, zero sort-merge shuffles
    assert p.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p
