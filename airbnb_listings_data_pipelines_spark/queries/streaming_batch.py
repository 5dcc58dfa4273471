"""Event-table queries — the batch expression of the streaming surface.

The reference is pure batch (SURVEY §2.9): time enters only via
filename-derived months. The driver's ``events`` table is the capability
extension: tumbling/sliding window aggregation here is written so the same
transformation runs under Structured Streaming (see ``streaming/events.py``,
which asserts batch/stream parity on these exact aggregates).

Never project raw ``ts``: Spark reads the nanosecond parquet column at µs
precision while DuckDB keeps ns — bucket timestamps to epoch seconds instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dialect import half_up_long
from ..sources.tpch import load_table
from .registry import query


@query(
    "q19_events_tumbling",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_epoch,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    survey_rows=("§2.9", "A1", "A2", "A5"),
    doc="Tumbling 1-hour window aggregation over the event stream (batch "
    "form; streaming form with watermark in streaming/events.py uses the "
    "identical F.window transformation).",
)
def q19_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (F.sum(half_up_long(F.col("value") * 100)) / 100.0).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value",
        )
    )


@query(
    "q23_events_sessionize_gap",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)))
                              AS BIGINT) > 1800
                   OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sess AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions, COUNT(*) AS n_events
    FROM sess GROUP BY user_id
    """,
    survey_rows=("§2.9", "W4", "W5"),
    doc="Gap-based sessionization (30-min inactivity) via lag + running sum "
    "— the batch twin of streaming session windows; stateful streaming "
    "variant would use applyInPandasWithState.",
)
def q23_events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull() | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 1800), 1
    ).otherwise(0)
    sess = ev.withColumn("new_session", new_session).withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q33_events_daily_top_users",
    oracle="""
    WITH daily AS (
      SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
             user_id,
             SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS day_value,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT day_epoch, user_id, day_value, n_events
    FROM daily
    QUALIFY row_number() OVER (PARTITION BY day_epoch
                               ORDER BY day_value DESC, user_id) <= 3
    """,
    survey_rows=("§2.9", "W1", "O3"),
    doc="Top-3 users by value per day — windowed rank over a daily "
    "pre-aggregate (WindowGroupLimit pushes the limit below the sort).",
)
def q33_events_daily_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_epoch"),
        "user_id",
    ).agg(
        (F.sum(half_up_long(F.col("value") * 100)) / 100.0).alias("day_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.partitionBy("day_epoch").orderBy(F.desc("day_value"), "user_id")
    return (
        daily.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .drop("__rn")
    )


@query(
    "q36_json_extraction",
    oracle="""
    SELECT CAST(props->>'k' AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY 1
    """,
    survey_rows=("EXT-json",),
    doc="Semi-structured JSON column extraction (from_json with an explicit "
    "schema -> typed struct field) — the engine-side answer to the "
    "reference's unparsed JSON-ish amenities/host_verifications strings "
    "(SURVEY §1.3 extension note). Schema-on-read stays JVM-side.",
)
def q36_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k bigint")["k"]
    return (
        ev.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )


@query(
    "q65_variant_semistructured",
    oracle="""
    SELECT CAST(props->>'k' AS BIGINT) % 7 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN json_extract(props::JSON, '$.missing') IS NULL
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_missing_key,
           CAST(SUM(CASE WHEN json_valid(props) THEN 0 ELSE 1 END)
                AS BIGINT) AS n_unparseable
    FROM events
    GROUP BY 1
    """,
    survey_rows=("EXT-json",),
    doc="Spark 4 VARIANT path for semi-structured data — the scale upgrade "
    "over q36's from_json: parse_json encodes props ONCE into the "
    "shreddable binary VARIANT form, then variant_get extracts typed "
    "fields without a fixed schema and try_variant_get on an absent path "
    "yields NULL instead of failing (schema drift tolerated row-by-row). "
    "try_parse_json counts unparseable payloads instead of aborting the "
    "job — at 100 TB a malformed record must cost one NULL, not a retry "
    "storm. All extraction is JVM-side expression work.",
)
def q65_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    parsed = ev.select(
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.missing", "string").alias("missing"),
        F.try_parse_json("props").alias("maybe"),
    )
    return parsed.groupBy((F.col("k") % 7).alias("k_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.sum(F.col("missing").isNotNull().cast("long")).alias("n_missing_key"),
        F.sum(F.col("maybe").isNull().cast("long")).alias("n_unparseable"),
    )


@query(
    "q68_native_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM sess GROUP BY user_id, sid
    """,
    survey_rows=("§2.9", "EXT-session"),
    doc="Native session_window aggregation (30-min gap) — the built-in "
    "merging-session operator (Spark plans UpdatingSessions + one hash "
    "agg keyed by (user, session)) vs q23's two-window gaps-and-islands "
    "formulation of the SAME semantics. Session end = last event + gap "
    "with an end-EXCLUSIVE boundary: an event arriving exactly at the "
    "gap opens a NEW session (oracle uses >= on microsecond deltas to "
    "mirror it). In streaming this operator is the state-store-merging "
    "path; in batch it needs no per-user sort beyond the agg shuffle.",
)
def q68_native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(half_up_long(F.col("value") * 100)).alias("cents"),
    )
    return s.select(
        "user_id",
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
        "n_events",
        "cents",
    )


@query(
    "x44_attribution_join",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, value,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ), clicks AS (
      SELECT user_id, sec AS csec, event_id AS click_id
      FROM ev WHERE event_type = 'click'
    ), purch AS (
      SELECT event_id AS purchase_id, user_id, sec AS psec, value
      FROM ev WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id AS user_id,
           CAST(p.value AS DOUBLE) AS purchase_value,
           c.click_id, CAST(p.psec - c.csec AS BIGINT) AS lag_sec
    FROM purch p JOIN clicks c
      ON c.user_id = p.user_id AND c.csec BETWEEN p.psec - 1800 AND p.psec
    """,
    survey_rows=("EXT-streaming", "J5"),
    doc="Stream-stream attribution join, batch twin: every purchase joined "
    "to ALL of the user's clicks in the preceding 30 minutes (inclusive "
    "bounds). The SAME streaming/joins.attribution_join code runs on a "
    "readStream with watermarks bounding both sides' state "
    "(tests/test_streaming.py asserts batch ≡ stream row sets); this "
    "registry twin pins the semantics against DuckDB's theta-join "
    "formulation. Seconds-floored timestamps keep lag arithmetic "
    "cross-engine exact (µs vs ns physical encodings).",
)
def x44_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.joins import attribution_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_seconds(F.unix_timestamp("ts"))
    )
    out = attribution_join(ev, attribution_window="30 minutes")
    return out.select(
        "purchase_id",
        "user_id",
        F.col("purchase_value").cast("double").alias("purchase_value"),
        "click_id",
        (F.col("lag_us").cast("long") / F.lit(1000000)).cast("long").alias("lag_sec"),
    )
