from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.sources.tpch import load_table
from airbnb_listings_data_pipelines_spark.streaming.events import (
    stream_to_memory,
    tumbling_aggregate,
)

from .conftest import SF_SMALL


def test_stream_matches_batch(spark):
    """The same tumbling aggregate over readStream must equal the batch run
    (count + decimal-sum exactly; approx_count_distinct is identical because
    the HLL sketch is deterministic for identical input sets)."""
    batch = tumbling_aggregate(load_table(spark, SF_SMALL, "events")).toPandas()
    stream = stream_to_memory(spark, SF_SMALL).toPandas()

    key = ["window_start", "event_type"]
    b = batch.sort_values(key).reset_index(drop=True)
    s = stream.sort_values(key).reset_index(drop=True)
    assert len(b) == len(s) and len(b) > 0
    assert (b["n_events"].values == s["n_events"].values).all()
    assert (b["sum_value"].values == s["sum_value"].values).all()
    assert (b["n_users_approx"].values == s["n_users_approx"].values).all()


def test_watermark_present_in_streaming_plan(spark):
    stream = tumbling_aggregate(
        __import__(
            "airbnb_listings_data_pipelines_spark.streaming.events",
            fromlist=["event_stream"],
        ).event_stream(spark, SF_SMALL),
        watermark="30 minutes",
    )
    assert stream.isStreaming
    # watermark node must appear in the logical plan (state eviction at scale)
    assert "EventTimeWatermark" in stream._jdf.queryExecution().analyzed().toString()


def test_batch_exact_distinct_option(spark):
    ev = load_table(spark, SF_SMALL, "events")
    exact = tumbling_aggregate(ev, exact_distinct=True)
    row = exact.orderBy("window_start", "event_type").first()
    assert row.n_users_approx >= 1
    assert exact.filter(F.col("n_events") < 1).count() == 0
