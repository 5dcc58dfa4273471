"""Pivot / unpivot round-trip (q70): the wide revenue matrix unpivots back
to the exact long-form aggregate, and the pivot plan stays a single hash
aggregate (no distinct-values pre-collect, because the value list is
explicit)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.queries.registry import load_all

from .conftest import SF_SMALL

_PRIORITIES = [
    ("1-URGENT", "urgent"),
    ("2-HIGH", "high"),
    ("3-MEDIUM", "medium"),
    ("4-NOT SPECIFIED", "not_specified"),
    ("5-LOW", "low"),
]


def test_unpivot_round_trips_to_long_form(spark):
    reg = load_all()
    wide = reg["q70_pivot_revenue_matrix"].fn(spark, SF_SMALL)
    long = (
        wide.unpivot(
            ids=["order_year"],
            values=[a for _, a in _PRIORITIES],
            variableColumnName="priority_slug",
            valueColumnName="revenue",
        )
        .filter(F.col("revenue") != 0.0)
    )
    # independent long-form aggregate straight from the tables
    from airbnb_listings_data_pipelines_spark.queries.inventory import _cents_sum
    from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

    slug = dict(_PRIORITIES)
    o = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    direct = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.col("o_orderpriority"),
        )
        .agg(_cents_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )
    expect = {
        (r.order_year, slug[r.o_orderpriority]): r.revenue for r in direct.collect()
    }
    got = {(r.order_year, r.priority_slug): r.revenue for r in long.collect()}
    assert got == expect


def test_pivot_plan_is_single_aggregate_no_collect(spark):
    reg = load_all()
    wide = reg["q70_pivot_revenue_matrix"].fn(spark, SF_SMALL)
    plan = wide._jdf.queryExecution().executedPlan().toString()
    # explicit value list -> no extra job; the pivot lowers to hash aggregates
    assert "HashAggregate" in plan
