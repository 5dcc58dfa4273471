"""Physical-layout writers — the storage-side levers for 100 TB plans.

- ``write_partitioned``: directory partitioning for pruning + incremental
  monthly appends (the fact table's file_date layout).
- ``write_bucketed``: hash-bucketed, sorted managed tables. Two tables
  bucketed on their join key co-locate: the sort-merge join reads buckets
  pairwise with NO exchange on either side — the shuffle is paid once at
  write time and amortized over every subsequent join/aggregation on that
  key (tests/test_bucketing.py asserts the exchange-free plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.format("parquet").saveAsTable(table)


def table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
