"""Stream-stream joins with event-time bounds.

Joining two live streams requires both sides to buffer state; watermarks
plus an event-time range predicate bound that state: a row can be dropped
once the other side's watermark passes its join window. Without the time
bound the state grows forever — Spark rejects unbounded stream-stream
inner joins in append mode unless both constraints are present.

Pattern here: attribute each ``purchase`` event to ALL of the same user's
preceding ``click`` events within ``attribution_window`` (one output row per
qualifying click). Picking only the single latest click is not expressible
in append-mode streaming (it would need a per-purchase argmax over state);
downstream batch consumers can reduce to last-touch with a window rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    events: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Join each purchase to ALL preceding clicks of the same user within
    the attribution window (one row per click — last-touch reduction is a
    downstream batch concern). Works identically on a batch or streaming
    events DataFrame (ts, user_id, event_type, event_id, value)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    window_expr = f"click_ts >= purchase_ts - INTERVAL {attribution_window} AND click_ts <= purchase_ts"
    joined = purchases.join(
        clicks,
        F.expr(f"p_user = c_user AND {window_expr}"),
        "inner",
    )
    return joined.select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_value",
        "click_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )
