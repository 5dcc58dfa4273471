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


def test_distinct_switch_exact_approx_agree_within_hll_error(spark):
    """The exact<->approx switch contract: both paths agree within HLL error
    on every window, and the cardinality hint flips the plan."""
    ev = load_table(spark, SF_SMALL, "events")
    key = ["window_start", "event_type"]
    e = tumbling_aggregate(ev, distinct="exact").toPandas().sort_values(key)
    a = tumbling_aggregate(ev, distinct="approx").toPandas().sort_values(key)
    assert len(e) == len(a) > 0
    rel = abs(e["n_users_approx"].values - a["n_users_approx"].values) / e[
        "n_users_approx"
    ].values.clip(min=1)
    assert rel.max() <= 0.05, f"HLL error above 5%: {rel.max()}"

    # auto: small-cardinality hint on batch -> exact plan; big hint -> HLL
    small = tumbling_aggregate(ev, expected_distinct_per_window=100)
    big = tumbling_aggregate(ev, expected_distinct_per_window=10_000_000)
    assert "approx_count_distinct" not in small._jdf.queryExecution().analyzed().toString()
    assert "approx_count_distinct" in big._jdf.queryExecution().analyzed().toString()

    # streaming frames can never take the exact path
    from airbnb_listings_data_pipelines_spark.streaming.events import event_stream

    stream = event_stream(spark, SF_SMALL)
    auto = tumbling_aggregate(stream, expected_distinct_per_window=100)
    assert "approx_count_distinct" in auto._jdf.queryExecution().analyzed().toString()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exact distinct"):
        tumbling_aggregate(stream, distinct="exact")


def test_sliding_window_stream_matches_batch(spark):
    """Sliding windows (1h every 30m — each event lands in 2 windows) agree
    between batch and an incremental streaming run."""
    from airbnb_listings_data_pipelines_spark.streaming.events import (
        event_stream,
        tumbling_aggregate,
    )

    def slide(df):
        src = df.withWatermark("ts", "2 hours") if df.isStreaming else df
        return (
            src.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
            .count()
            .select(F.col("w.start").alias("ws"), "count")
        )

    batch = {
        (r.ws, r["count"]) for r in slide(load_table(spark, SF_SMALL, "events")).collect()
    }
    q = (
        slide(event_stream(spark, SF_SMALL))
        .writeStream.format("memory")
        .queryName("sliding_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream = {(r.ws, r["count"]) for r in spark.sql("SELECT * FROM sliding_agg").collect()}
    assert batch == stream and len(batch) > 0


def test_stream_stream_attribution_join_matches_batch(spark):
    """Purchases attributed to preceding same-user clicks within 30 min:
    the stream-stream join (state bounded by watermarks + time-range
    predicate) must produce exactly the batch join's rows."""
    from airbnb_listings_data_pipelines_spark.streaming.events import event_stream
    from airbnb_listings_data_pipelines_spark.streaming.joins import attribution_join

    batch = {
        (r.purchase_id, r.click_id)
        for r in attribution_join(load_table(spark, SF_SMALL, "events")).collect()
    }
    q = (
        attribution_join(event_stream(spark, SF_SMALL))
        .writeStream.format("memory")
        .queryName("attribution")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    stream = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM attribution").collect()
    }
    assert len(batch) > 0
    assert stream == batch


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate event deliveries collapse to one row per event_id in both
    batch and streaming execution."""
    import shutil

    from airbnb_listings_data_pipelines_spark.streaming.events import (
        deduplicated_stream,
        event_stream,
    )

    # a source dir where every event file appears twice (duplicate delivery)
    src = tmp_path / "dup_events"
    src.mkdir()
    shutil.copy(f"{SF_SMALL}/events.parquet", src / "events_a.parquet")
    shutil.copy(f"{SF_SMALL}/events.parquet", src / "events_b.parquet")

    q = (
        deduplicated_stream(event_stream(spark, str(src)))
        .writeStream.format("memory")
        .queryName("dedup_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n_stream = spark.sql("SELECT COUNT(DISTINCT event_id) c FROM dedup_events").first().c
    n_rows = spark.sql("SELECT COUNT(*) c FROM dedup_events").first().c
    n_src = load_table(spark, SF_SMALL, "events").count()
    assert n_rows == n_stream == n_src  # 2x deliveries -> exactly one each


def test_foreachbatch_upsert_stream(spark, tmp_path):
    """CDC micro-batches MERGE into a parquet target: later batches update
    matched keys and insert new ones; the final table equals the
    latest-change-per-key view of the whole stream."""
    from airbnb_listings_data_pipelines_spark.streaming.upsert import upsert_stream

    src = tmp_path / "cdc"
    src.mkdir()
    b1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 11), (3, "c", 12)], ["id", "val", "ord"]
    )
    b2 = spark.createDataFrame(
        [(2, "b2", 20), (2, "b3", 21), (4, "d", 22)], ["id", "val", "ord"]
    )
    b1.coalesce(1).write.parquet(str(src / "batch_000.parquet"))
    b2.coalesce(1).write.parquet(str(src / "batch_001.parquet"))

    stream = (
        spark.readStream.schema("id long, val string, ord long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    target = str(tmp_path / "target")
    q = upsert_stream(
        stream, target, keys=["id"], order_col="ord",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    got = {(r.id, r.val) for r in spark.read.parquet(target).collect()}
    assert got == {(1, "a"), (2, "b3"), (3, "c"), (4, "d")}
