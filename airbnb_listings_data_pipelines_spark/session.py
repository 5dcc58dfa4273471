"""SparkSession factory.

Local testing runs on ``local[N]``; the configs below are chosen so the same
logical plans scale to a multi-executor cluster:

- AQE on (runtime coalesce / skew-join / broadcast demotion),
- modest ``spark.sql.shuffle.partitions`` for local runs (AQE coalesces
  anyway; on a real cluster this would be sized to ~2-3x total cores),
- UTC session timezone so date/timestamp semantics are engine-independent
  (the DuckDB oracle runs naive/UTC),
- Arrow enabled for the pandas-UDF extension operators,
- ``nanosAsLong`` because the driver's events.parquet carries
  TIMESTAMP(NANOS) which vanilla Spark 4 refuses to read
  (sources/tpch.py converts the long back to a timestamp).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "airbnb-listings-data-pipelines-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or (int(cpus) if str(cpus).isdigit() else 32)),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
