"""Custom Python DataSource: executor-side synthetic event generation."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.sources.synthetic import (
    SyntheticEventsDataSource,
    _row,
)


def _load(spark, rows=5000, partitions=4, seed=7):
    spark.dataSource.register(SyntheticEventsDataSource)
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("partitions", partitions)
        .option("seed", seed)
        .load()
    )


def test_rowcount_schema_and_partitioning(spark):
    df = _load(spark, rows=5000, partitions=4)
    assert df.count() == 5000
    assert df.columns == ["event_id", "user_id", "event_type", "value", "ts_epoch"]
    assert df.rdd.getNumPartitions() == 4
    # generation is distributed: every split produced its slice
    per_part = df.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert sorted(r["count"] for r in per_part) == [1250] * 4


def test_deterministic_across_reads_and_parallelism(spark):
    a = _load(spark, rows=2000, partitions=2, seed=11).orderBy("event_id").collect()
    b = _load(spark, rows=2000, partitions=8, seed=11).orderBy("event_id").collect()
    assert a == b  # same seed → same dataset regardless of split count
    c = _load(spark, rows=2000, partitions=2, seed=12).orderBy("event_id").collect()
    assert a != c  # seed actually matters
    # spot-check against the pure row function
    assert tuple(a[123]) == _row(11, 123)


def test_generated_values_within_contract(spark):
    df = _load(spark, rows=3000, partitions=3)
    stats = df.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.countDistinct("event_type").alias("types"),
        F.min("ts_epoch").alias("t0"),
        F.max("ts_epoch").alias("t1"),
    ).first()
    assert 0.0 <= stats.lo and stats.hi < 10_000.0
    assert stats.types == 5
    assert 1_704_067_200 <= stats.t0 and stats.t1 < 1_704_067_200 + 365 * 86_400
