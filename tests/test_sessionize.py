from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.sources.tpch import load_table
from airbnb_listings_data_pipelines_spark.streaming.events import event_stream
from airbnb_listings_data_pipelines_spark.streaming.sessionize import sessionize

from .conftest import SF_SMALL


def _batch_sessions(spark, gap_seconds: int) -> pd.DataFrame:
    """Reference sessionization computed with plain batch window functions
    (the q23 pattern) — ground truth for the stateful operator."""
    from pyspark.sql import Window

    ev = load_table(spark, SF_SMALL, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    flagged = ev.withColumn(
        "new_s",
        F.when(
            prev.isNull()
            | ((F.unix_micros("ts") - F.unix_micros(prev)) > gap_seconds * 1_000_000),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        flagged.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .toPandas()
    )


def test_stateful_sessionize_matches_batch(spark):
    gap = 1800
    out = sessionize(event_stream(spark, SF_SMALL), gap_seconds=gap)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM sessions").toPandas()

    expected = _batch_sessions(spark, gap)
    # the trailing (still-open) session per user only flushes on an event-time
    # timeout, which needs a later watermark than this finite input provides —
    # compare the gap-closed sessions
    last_per_user = expected.loc[expected.groupby("user_id")["session_start"].idxmax()]
    closed_expected = expected.merge(
        last_per_user[["user_id", "session_start"]],
        on=["user_id", "session_start"],
        how="left",
        indicator=True,
    )
    closed_expected = closed_expected[closed_expected["_merge"] == "left_only"]

    key = ["user_id", "session_start"]
    g = got[got["closed_by"] == "gap"].sort_values(key).reset_index(drop=True)
    e = closed_expected.sort_values(key).reset_index(drop=True)
    assert len(g) == len(e), (len(g), len(e))
    assert (g["n_events"].values == e["n_events"].values).all()
    assert (
        pd.to_datetime(g["session_end"]).values == pd.to_datetime(e["session_end"]).values
    ).all()

    # timeout-flushed rows must each be a user's trailing session whose end
    # fell behind the final watermark (idle >= watermark + gap)
    t = got[got["closed_by"] == "timeout"].merge(
        last_per_user, on=["user_id", "session_start"], suffixes=("", "_exp")
    )
    assert len(t) == (got["closed_by"] == "timeout").sum()
    assert (t["n_events"].values == t["n_events_exp"].values).all()


def test_transformwithstate_sessionize_matches_applyinpandas(spark):
    """The transformWithStateInPandas twin (sessionize_tws) must produce
    the IDENTICAL session set as the applyInPandasWithState operator on
    the same finite stream — two independent stateful engines
    cross-checking each other.

    transformWithState's Python state-server protocol needs the protobuf
    runtime; without it the streaming runner crashes at init, so this
    cross-check skips in containers lacking google.protobuf (the
    applyInPandasWithState sessionizer above is the fully-tested path
    there)."""
    import importlib.util

    import pytest as _pytest

    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    if not has_protobuf:
        # re-probed round 12 (2026-08-16): `import google.protobuf`
        # ModuleNotFound; no network to install — gate stays closed
        _pytest.skip("transformWithState state server requires google.protobuf")
    from airbnb_listings_data_pipelines_spark.streaming.sessionize_tws import (
        sessionize_tws,
    )

    gap = 1800
    out = sessionize_tws(event_stream(spark, SF_SMALL), gap_seconds=gap)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_tws")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM sessions_tws").toPandas()

    # gap-closed sessions equal the batch gaps-and-islands ground truth
    expected = _batch_sessions(spark, gap)
    last_per_user = expected.loc[expected.groupby("user_id")["session_start"].idxmax()]
    closed_expected = expected.merge(
        last_per_user[["user_id", "session_start"]],
        on=["user_id", "session_start"],
        how="left",
        indicator=True,
    )
    closed_expected = closed_expected[closed_expected["_merge"] == "left_only"]
    key = ["user_id", "session_start"]
    g = got[got["closed_by"] == "gap"].sort_values(key).reset_index(drop=True)
    e = closed_expected.sort_values(key).reset_index(drop=True)
    assert len(g) == len(e), (len(g), len(e))
    assert (g["n_events"].values == e["n_events"].values).all()
    assert (
        pd.to_datetime(g["session_end"]).values == pd.to_datetime(e["session_end"]).values
    ).all()
