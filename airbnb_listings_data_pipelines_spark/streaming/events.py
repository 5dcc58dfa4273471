"""Structured Streaming over the events table.

The reference is batch-only (SURVEY §2.9) — this is the capability
extension: the SAME transformation (``tumbling_aggregate``) runs identically
over a batch DataFrame and a ``readStream`` source, which is the Spark
design point: declare the plan once, execute incrementally.

Watermarking bounds state: with ``withWatermark("ts", delay)``, windows
older than max(event time) - delay are finalized and state evicted —
mandatory at 100 TB/day event volumes. ``count(DISTINCT)`` is not
incrementally computable, so the streaming aggregate uses
``approx_count_distinct`` (HLL, mergeable) — the documented exact-vs-sketch
trade-off (SURVEY §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# events.parquet physical schema (round-3 generator: ts is
# TIMESTAMP(MICROS, NTZ); normalized to a session-tz timestamp below, which
# under the UTC session timezone is wall-clock-identical)
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def event_stream(
    spark: SparkSession,
    directory: str,
    glob: str = "events*.parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over a directory of events parquet files (one file
    per micro-batch; in production new files land and are picked up
    incrementally)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(directory)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


# Per-window distinct-key count above which exact COUNT(DISTINCT) stops
# being the sane default: the distinct shuffle re-keys every event on
# (window, type, user) and its state grows with the keyspace — the 10x
# scaling probe measured 4.0x time at 10x data for exact vs ~1.2x for the
# HLL sketch (SCALING.md). Below the threshold exact is cheap and, well,
# exact.
DISTINCT_STATE_THRESHOLD = 100_000


def tumbling_aggregate(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "2 hours",
    exact_distinct: bool | None = None,
    distinct: str = "auto",
    expected_distinct_per_window: int | None = None,
) -> DataFrame:
    """Tumbling-window per-type aggregate; identical for batch and stream.

    ``distinct`` picks the COUNT(DISTINCT user_id) strategy:

    - ``'exact'``  — true distinct (batch only: exact distinct state is
      neither mergeable nor evictable under a watermark).
    - ``'approx'`` — HLL sketch (mergeable, bounded state; ~2% error).
    - ``'auto'``   — exact only when the frame is batch AND the caller's
      cardinality hint ``expected_distinct_per_window`` is at most
      ``DISTINCT_STATE_THRESHOLD``; approx otherwise (including when no
      hint is given, so batch and streaming runs of the same pipeline
      produce comparable columns by default).

    ``exact_distinct`` (bool) is the legacy spelling of distinct=
    'exact'/'approx'. tests/test_streaming.py asserts the two paths agree
    within HLL error and that the hint flips the plan.
    """
    if exact_distinct is not None:
        distinct = "exact" if exact_distinct else "approx"
    if distinct == "auto":
        distinct = (
            "exact"
            if (
                not events.isStreaming
                and expected_distinct_per_window is not None
                and expected_distinct_per_window <= DISTINCT_STATE_THRESHOLD
            )
            else "approx"
        )
    if distinct == "exact" and events.isStreaming:
        raise ValueError("exact distinct is not available on a streaming frame (unbounded state)")
    src = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    distinct_users = (
        F.countDistinct("user_id") if distinct == "exact" else F.approx_count_distinct("user_id")
    )
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            distinct_users.alias("n_users_approx"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "n_users_approx",
            "sum_value",
        )
    )


def stream_to_memory(
    spark: SparkSession,
    directory: str,
    name: str = "events_agg",
    window: str = "1 hour",
) -> DataFrame:
    """Run the streaming aggregate to completion against the files currently
    in ``directory`` (memory sink, complete mode) and return the result."""
    agg = tumbling_aggregate(event_stream(spark, directory), window=window)
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def deduplicated_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once-per-key event stream: drops duplicate deliveries of the
    same event within the watermark horizon (state for a key is evicted
    once the watermark passes — bounded memory, unlike a global distinct).
    Works on batch frames too (plain dropDuplicates) so pipelines can share
    the transformation."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
