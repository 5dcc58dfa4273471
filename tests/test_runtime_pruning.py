"""Runtime join-pruning evidence: dynamic partition pruning + bloom filters.

At 100 TB the dominant cost of a selective fact⋈dim join is scanning fact
partitions/rows that the dim filter would discard anyway. Spark has two
runtime mechanisms that cut that scan without any change to the query:

- **Dynamic partition pruning (DPP)**: when the fact table is
  partition-stored on the join key, the dim side's filter result is turned
  into a partition filter on the fact scan at runtime — whole partitions
  are never opened. Evidence: ``dynamicpruningexpression`` inside the fact
  scan's PartitionFilters.
- **Runtime bloom filters**: for non-partition join keys, Spark builds a
  bloom filter over the (filtered) creation side and injects
  ``might_contain(...)`` on the application side, discarding non-matching
  rows at the scan/shuffle boundary instead of carrying them into the join.

Both are free correctness-preserving scan reductions a 1000-executor job
relies on; these tests pin that our tables/joins are shaped so Spark can
actually apply them (partitioned layout, equi-join on the partition column,
selective dim filter).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

from .conftest import SF_SMALL


def test_dynamic_partition_pruning_injected(spark, tmp_path):
    """Partition-stored fact ⋈ filtered dim on the partition column →
    the fact scan carries a dynamicpruning partition filter, and the
    result only contains the surviving partition's rows."""
    o = load_table(spark, SF_SMALL, "orders")
    fact_dir = str(tmp_path / "fact_by_status")
    o.withColumn("part_status", F.col("o_orderstatus")).write.partitionBy(
        "part_status"
    ).parquet(fact_dir)

    dim = spark.createDataFrame(
        [("O", "open"), ("F", "fulfilled"), ("P", "pending")], ["st", "label"]
    )
    fact = spark.read.parquet(fact_dir)
    j = fact.join(F.broadcast(dim.filter(F.col("label") == "open")), F.col("part_status") == F.col("st"))

    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    rows = j.select("o_orderstatus").distinct().collect()
    assert [r[0] for r in rows] == ["O"]


def test_runtime_bloom_filter_injected(spark, tmp_path):
    """Shuffle join with a selective creation-side filter → Spark injects
    might_contain() on the application side (row-level semi-join
    reduction), and results match the un-pruned join exactly."""
    li = load_table(spark, SF_SMALL, "lineitem")
    o = load_table(spark, SF_SMALL, "orders")
    li.write.parquet(str(tmp_path / "li"))
    o.write.parquet(str(tmp_path / "o"))

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # test-scale thresholds: any application side qualifies, creation
        # side must still be small (the production guard stays meaningful)
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li2 = spark.read.parquet(str(tmp_path / "li"))
        sel = spark.read.parquet(str(tmp_path / "o")).filter(
            F.col("o_totalprice") > 300000
        )
        j = li2.join(sel, F.col("l_orderkey") == F.col("o_orderkey"))
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt.lower(), opt
        pruned_count = j.count()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    expect = li.join(
        o.filter(F.col("o_totalprice") > 300000),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).count()
    assert pruned_count == expect
