from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.sources.tpch import load_table
from airbnb_listings_data_pipelines_spark.sources.writers import write_bucketed

from .conftest import SF_SMALL


def test_bucketed_join_is_exchange_free(spark):
    """Both sides bucketed on the join key -> sort-merge join with no
    Exchange on either side (the write-once shuffle amortization)."""
    li = load_table(spark, SF_SMALL, "lineitem")
    o = load_table(spark, SF_SMALL, "orders")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], num_buckets=4)
    write_bucketed(o, "o_bucketed", ["o_orderkey"], num_buckets=4)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_bucketed")
            .join(
                spark.table("o_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("HashAggregate")[-1]  # below the final agg
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_part
        # results still correct
        total = sum(r.n for r in j.collect())
        assert total == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
