"""Loaders for the driver's deterministic parquet testdata
(``/root/testdata/sf*/{region,nation,customer,supplier,part,orders,lineitem,
events,documents,embeddings}.parquet`` — see TESTDATA.md).

Scale notes: parquet scans here go through the vectorized reader with column
pruning + predicate pushdown; at 100 TB the same code reads a partitioned
table directory instead of one file — nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing quirks so downstream plans see
    clean types.

    - ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
      ``spark.sql.legacy.parquet.nanosAsLong`` Spark surfaces it as a long —
      convert to a microsecond timestamp (UTC session tz).  Aggregations in
      this engine only ever bucket at >= second granularity, so the
      nanosecond truncation is semantics-free.
    """
    if name == "events":
        # runtime-settable; required even when the caller's session builder
        # didn't set it (e.g. the driver's own SparkSession)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division, not float: epoch-ns (~1.7e18) exceeds double's
        # 53-bit exact range, so `/1000` could be off by 1µs near boundaries
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TPCH_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
