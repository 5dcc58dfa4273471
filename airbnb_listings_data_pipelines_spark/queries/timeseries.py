"""Time-series join/pattern queries over the events table — operators the
reference class of warehouse lacks as built-ins (as-of join, range join,
funnel), composed Spark-first (see operators/timeseries.py for the scale
rationale of each physical shape).

All timestamps are bucketed to epoch seconds before joining: Spark reads
the nanosecond parquet at µs while DuckDB keeps ns, so second-floor is the
shared granularity (registry hash-stability rule 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dialect import half_up_long
from ..operators.timeseries import as_of_join, range_join_binned
from ..sources.tpch import load_table
from .registry import query


def _events_sec(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", "user_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )


@query(
    "q48_asof_join_last_click",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ), clicks AS (
      SELECT user_id, sec, event_id FROM ev WHERE event_type = 'click'
    ), purch AS (
      SELECT event_id AS purchase_id, user_id, sec AS psec
      FROM ev WHERE event_type = 'purchase'
    )
    SELECT purchase_id, p.user_id AS user_id, psec,
           c.event_id AS asof_click_id, c.sec AS asof_click_sec
    FROM purch p LEFT JOIN clicks c
      ON c.user_id = p.user_id AND c.sec <= p.psec
    QUALIFY row_number() OVER (PARTITION BY purchase_id
                               ORDER BY c.sec DESC, c.event_id DESC) = 1
    """,
    survey_rows=("EXT-asof", "W5", "J5"),
    doc="As-of join: each purchase picks the user's most recent click "
    "at-or-before it (ties by event_id). Spark plan is union + carried "
    "last(ignorenulls) window — ONE key shuffle, no inequality join "
    "(operators/timeseries.as_of_join); the oracle is the quadratic "
    "theta-join + QUALIFY formulation, so the hash match proves the "
    "single-shuffle plan equals the naive semantics row-for-row.",
)
def q48_asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_sec(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("sec").alias("csec"),
        "event_id",
        F.col("event_id").alias("click_id"),
        F.col("sec").alias("click_sec"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("sec").alias("psec"),
        "event_id",
    )
    out = as_of_join(
        purch,
        clicks,
        key="user_id",
        left_ts="psec",
        right_ts="csec",
        payload_cols=["click_id", "click_sec"],
        seq_col="event_id",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "psec",
        F.col("asof_click_id").alias("asof_click_id"),
        F.col("asof_click_sec").alias("asof_click_sec"),
    )


@query(
    "q49_range_join_click_counts",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ), clicks AS (
      SELECT user_id, sec FROM ev WHERE event_type = 'click'
    ), purch AS (
      SELECT event_id AS purchase_id, user_id, sec AS psec
      FROM ev WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id AS user_id, p.psec,
           CAST(COALESCE(SUM(CASE WHEN c.sec IS NOT NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_clicks_5min
    FROM purch p LEFT JOIN clicks c
      ON c.user_id = p.user_id AND c.sec >= p.psec - 300 AND c.sec <= p.psec
    GROUP BY p.purchase_id, p.user_id, p.psec
    """,
    survey_rows=("EXT-rangejoin", "J5", "A1"),
    doc="Range join: clicks within the 5 minutes before each purchase, "
    "counted per purchase. Spark executes it as a BINNED equi-join "
    "(operators/timeseries.range_join_binned: right rows exploded into "
    "covering 300s bins, equi-join on (user, bin), exact predicate on "
    "candidates) — a shuffle join instead of the nested-loop inequality "
    "join; the oracle is the plain inequality join, proving equivalence.",
)
def q49_range_join_click_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_sec(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "sec")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("sec").alias("psec")
    )
    pairs = range_join_binned(
        purch, clicks, key="user_id", left_ts="psec", right_ts="sec", lower=-300, upper=0
    )
    counts = pairs.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("__n"))
    return (
        purch.join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            "psec",
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_clicks_5min"),
        )
    )


@query(
    "q50_funnel_view_click_purchase",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ), s1 AS (
      SELECT user_id, MIN(sec) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(sec) AS t2
      FROM ev e JOIN s1 USING (user_id)
      WHERE event_type = 'click' AND sec >= t1 GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(sec) AS t3
      FROM ev e JOIN s2 USING (user_id)
      WHERE event_type = 'purchase' AND sec >= t2 GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s1) AS n_view,
           (SELECT COUNT(*) FROM s2) AS n_view_then_click,
           (SELECT COUNT(*) FROM s3) AS n_full_funnel
    """,
    survey_rows=("EXT-funnel", "A3", "J5"),
    doc="Ordered funnel view -> click -> purchase: stage N counts users "
    "whose earliest stage-N event follows their stage-(N-1) entry time. "
    "Three staged min-aggregates with broadcast joins back to the events — "
    "each stage is one shuffle on user_id; no per-user sequence "
    "materialization.",
)
def q50_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_sec(spark, sf_dir).select("user_id", "event_type", "sec")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("sec").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(s1), "user_id")
        .filter(F.col("sec") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s2), "user_id")
        .filter(F.col("sec") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_then_click")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


@query(
    "q53_new_vs_returning_users",
    oracle="""
    WITH ev AS (
      SELECT user_id, CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day
      FROM events
    ), first_day AS (
      SELECT user_id, MIN(day) AS d0 FROM ev GROUP BY user_id
    ), daily AS (
      SELECT DISTINCT user_id, day FROM ev
    )
    SELECT day,
           CAST(SUM(CASE WHEN day = d0 THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN day > d0 THEN 1 ELSE 0 END) AS BIGINT) AS returning_users
    FROM daily JOIN first_day USING (user_id)
    GROUP BY day
    """,
    survey_rows=("EXT-cohort", "A1", "J7"),
    doc="Daily new-vs-returning user split: per-user first-seen day "
    "(one aggregate) broadcast back onto the distinct (user, day) "
    "activity — the cohort-entry primitive of retention analytics. Two "
    "shuffles on user_id + one on day; no window over the raw stream.",
)
def q53_new_vs_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp(F.date_trunc("day", "ts")).alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    daily = ev.distinct()
    return (
        daily.join(F.broadcast(first_day), "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("d0"), 1).otherwise(0)).alias("new_users"),
            F.sum(F.when(F.col("day") > F.col("d0"), 1).otherwise(0)).alias(
                "returning_users"
            ),
        )
    )


@query(
    "q63_gapfill_locf",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily
    ), cal AS (
      SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                         CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS d
      FROM span
    ), grid AS (
      SELECT et.event_type, cal.d
      FROM (SELECT DISTINCT event_type FROM daily) et CROSS JOIN cal
    )
    SELECT g.event_type,
           strftime(g.d, '%Y-%m-%d') AS day,
           CAST(daily.cents AS BIGINT) AS observed_cents,
           CAST(last_value(daily.cents IGNORE NULLS) OVER (
                  PARTITION BY g.event_type ORDER BY g.d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS locf_cents,
           CAST(CASE WHEN daily.cents IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled
    FROM grid g LEFT JOIN daily ON g.event_type = daily.event_type AND g.d = daily.d
    """,
    survey_rows=("EXT-gapfill", "W4", "J5"),
    doc="Time-series gap-fill + LOCF (last observation carried forward): "
    "daily per-type totals left-joined onto a dense (type x calendar) grid "
    "built from sequence()+explode on a 1-row span aggregate, then "
    "last(ignorenulls) over an UNBOUNDED PRECEDING row frame. The grid is "
    "calendar-sized (days x types, tiny) so both build sides broadcast; "
    "the only data-sized work is the one daily hash aggregate. Days before "
    "a type's first observation stay NULL by design.",
)
def q63_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(half_up_long(F.col("value") * 100)).alias("cents"))
    cal = (
        daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("d"))
    )
    grid = daily.select("event_type").distinct().crossJoin(F.broadcast(cal))
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(F.broadcast(daily), ["event_type", "d"], "left")
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("cents").alias("observed_cents"),
            F.last("cents", ignorenulls=True).over(w).alias("locf_cents"),
            F.col("cents").isNull().cast("long").alias("filled"),
        )
    )


@query(
    "q64_retention_cohorts",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(floor(date_diff('day', DATE '2024-01-01',
                                  CAST(date_trunc('day', ts) AS DATE)) / 7)
                  AS BIGINT) AS week
      FROM events
    ), cohort AS (
      SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, week FROM ev
    ), cells AS (
      SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
             COUNT(*) AS n_users
      FROM active a JOIN cohort c USING (user_id)
      GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset, n_users,
           n_users / (MAX(CASE WHEN week_offset = 0 THEN n_users END)
                        OVER (PARTITION BY cohort_week)) AS retention
    FROM cells
    """,
    survey_rows=("EXT-cohort", "A2", "W6"),
    doc="Weekly cohort retention triangle: cohort = each user's first "
    "active week (anchored integer week index — identical Monday-epoch "
    "arithmetic in both engines, no locale-dependent week truncation), "
    "cells = distinct (user, week) activity counted per (cohort, offset), "
    "retention = cell / cohort size via a window over the tiny cell table. "
    "Two shuffles on user_id (first-week agg + distinct) and one on the "
    "cohort key; the window runs over weeks^2 rows, not data.",
)
def q64_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(
            F.datediff(F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date")) / 7
        ).alias("week"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    cells = (
        active.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = W.partitionBy("cohort_week")
    base = F.max(F.when(F.col("week_offset") == 0, F.col("n_users"))).over(w)
    return cells.select(
        "cohort_week", "week_offset", "n_users", (F.col("n_users") / base).alias("retention")
    )


@query(
    "q74_rolling_distinct_window",
    oracle="""
    WITH e AS (
      SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
             user_id
      FROM events
    ), days AS (
      SELECT DISTINCT day_epoch FROM e
    )
    SELECT d.day_epoch AS window_day,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS rolling_users,
           CAST(COUNT(*) AS BIGINT) AS rolling_events
    FROM days d
    JOIN e ON e.day_epoch BETWEEN d.day_epoch - 6 * 86400 AND d.day_epoch
    GROUP BY 1
    """,
    survey_rows=("§2.9", "A2", "W5"),
    doc="Trailing 7-day distinct users (rolling DAU/WAU) — the "
    "distinct-over-window surface SQL window frames cannot express "
    "directly (COUNT(DISTINCT) OVER is unsupported in Spark). "
    "Spark-first shape: each event EXPLODES to the <=7 window-days it "
    "contributes to (F.sequence — map-only, no per-day corpus rescans), "
    "a broadcast semi-filter keeps only days that exist in the data, "
    "then one hash countDistinct per window-day. Scale: the explode is "
    "a fixed 7x map amplification feeding a (day, user) combine — "
    "contrast the naive days-join (rescans events per day) and the "
    "window collect_set (holds per-frame user sets in memory); the "
    "incremental path swaps countDistinct for x36's mergeable HLL "
    "per (day, user-bucket). The oracle states the same semantics as a "
    "day-range join.",
)
def q74_rolling_distinct_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = 86400
    ev = load_table(spark, sf_dir, "events").select(
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_epoch"), "user_id"
    )
    days = ev.select("day_epoch").distinct()
    # exploded_nonnull: an inner explode's inferred filter would re-inline
    # sequence+date_trunc+unix_timestamp at the scan (the x45 trap)
    from ..operators.text import exploded_nonnull

    expanded = exploded_nonnull(
        ev,
        F.sequence(
            F.col("day_epoch"), F.col("day_epoch") + F.lit(6 * day), F.lit(day)
        ),
        "window_day",
        "user_id",
    )
    return (
        expanded.join(
            F.broadcast(days), expanded["window_day"] == days["day_epoch"]
        )
        .groupBy("window_day")
        .agg(
            F.countDistinct("user_id").cast("long").alias("rolling_users"),
            F.count(F.lit(1)).cast("long").alias("rolling_events"),
        )
    )
