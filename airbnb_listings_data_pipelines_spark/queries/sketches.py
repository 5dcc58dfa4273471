"""Mergeable-sketch queries — the incremental-materialization scale story.

At 100 TB you never recompute a distinct count from raw data twice: each
ingest batch (here: each day) builds a fixed-size Datasketches HLL sketch,
the sketches are persisted next to the partition, and any rollup —
per-week, per-type, all-time — is a cheap union of kilobyte blobs with NO
second pass over the events. ``q28`` gates the one-shot
``approx_count_distinct`` sketch; this module gates the *mergeable* path
(``hll_sketch_agg`` → ``hll_union_agg`` → ``hll_sketch_estimate``), which
is what an incremental pipeline actually persists.

Oracle form (the q28 bounded-error pattern): sketch bytes are
engine-specific, so each engine checks ITS OWN estimate against its own
exact distinct count and emits the pass flag plus the exact value — every
column hash-matches cross-engine while still gating the 5% error contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dialect import half_up_long
from ..sources.tpch import load_table
from .registry import query


@query(
    "x36_mergeable_hll_rollup",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users_exact,
           CAST(CASE WHEN abs(approx_count_distinct(user_id)
                             - COUNT(DISTINCT user_id))
                          <= 0.05 * COUNT(DISTINCT user_id)
                THEN 1 ELSE 0 END AS BIGINT) AS hll_ok
    FROM events GROUP BY event_type
    """,
    survey_rows=("SCALE-sketch", "A2"),
    doc="Two-level mergeable distinct count: per-(type, day) HLL sketches "
    "(hll_sketch_agg lgConfigK=12, the partition-granularity artifact an "
    "incremental pipeline would persist), unioned per type WITHOUT "
    "re-reading events (hll_union_agg over ~days-sized sketch rows), then "
    "estimated. Gated against the exact distinct (separate aggregate) at "
    "5% relative error, the published HLL bound for lgK=12 (~1.6% RSE). "
    "DuckDB gates its own one-shot HLL the same way, so the flag + exact "
    "count hash-match cross-engine.",
)
def x36_mergeable_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # level 1: the per-partition artifact (one sketch per (type, day))
    per_day = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    # level 2: rollup by union of sketches — never touches raw events again
    merged = per_day.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("__est")
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users_exact"))
    return exact.join(merged, "event_type").select(
        "event_type",
        "n_users_exact",
        (F.abs(F.col("__est") - F.col("n_users_exact")) <= 0.05 * F.col("n_users_exact"))
        .cast("long")
        .alias("hll_ok"),
    )


@query(
    "x51_mergeable_quantile_histogram",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
    ), bounds AS (
      SELECT MIN(cents) AS lo, MAX(cents) - MIN(cents) + 1 AS width FROM c
    ), binned AS (
      SELECT event_type, (cents - b.lo) * 256 // b.width AS bin
      FROM c, bounds b
    ), hist AS (
      SELECT event_type, bin, COUNT(*) AS cnt FROM binned GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bin, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM hist
    ), picks AS (
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN bin END) AS b50,
             MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN bin END) AS b90,
             MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN bin END) AS b99
      FROM cum GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(b.lo + (p.b50 * b.width) // 256 AS BIGINT) AS p50_est_cents,
           CAST(b.lo + (p.b90 * b.width) // 256 AS BIGINT) AS p90_est_cents,
           CAST(b.lo + (p.b99 * b.width) // 256 AS BIGINT) AS p99_est_cents,
           CAST(1 AS BIGINT) AS p50_within,
           CAST(1 AS BIGINT) AS p90_within,
           CAST(1 AS BIGINT) AS p99_within
    FROM picks p, bounds b
    """,
    survey_rows=("SCALE-sketch", "A7"),
    doc="Mergeable quantile sketch completing the sketch belt (x36 HLL = "
    "distinct, x47 Misra-Gries = heavy hitters, this = quantiles): "
    "fixed-grid 256-bin histograms built per (event_type, day) — the "
    "bounded per-partition artifact an incremental pipeline persists — "
    "then rolled up by SUMMING bin counts (the merge is EXACT and "
    "associative, unlike KLL/GK whose merge loses precision), and "
    "p50/p90/p99 read off the merged cumulative counts. Everything runs "
    "on integer cents with integer bin math (ceil-rank picks as "
    "(q*n + q') div d), so bins, counts, and edge estimates are "
    "bit-identical cross-engine; DuckDB's rollup skips the per-day level "
    "because exact mergeability means sum-of-partials == global sum (the "
    "same collapse the x36 oracle uses). The *_within flags gate each "
    "edge estimate against the exact rank-picked disc percentile within "
    "one bin width (+2 integer-floor slack): Spark measures it, the "
    "oracle emits the theorem-guaranteed constant (x47 pattern) — the "
    "histogram error bound is a guarantee, not a measurement. Scale "
    "shape: level-1 agg is types*days*256 rows with map-side combine; "
    "the rollup never re-reads events; bounds arrive as a 1-row "
    "broadcast scalar; the rank-picked exact gate is the only sort and "
    "exists solely to check the sketch.",
)
def x51_mergeable_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    nbins = 256
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        half_up_long(F.col("value") * 100).alias("cents"),
    )
    bounds = ev.agg(
        F.min("cents").alias("__lo"),
        (F.max("cents") - F.min("cents") + 1).alias("__width"),
    )  # 1 row -> broadcast scalar (J9 idiom)
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "d",
        "cents",
        F.expr(f"(cents - __lo) * {nbins}L div __width").alias("bin"),
    )
    # level 1: the per-(type, day) persisted artifact (bounded: <= 256 rows each)
    per_day = binned.groupBy("event_type", "d", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # level 2: rollup = exact merge by summation, never re-reads events
    hist = per_day.groupBy("event_type", "bin").agg(F.sum("cnt").alias("cnt"))
    wc = W.partitionBy("event_type").orderBy("bin")
    wt = W.partitionBy("event_type")
    cum = hist.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "n", F.sum("cnt").over(wt)
    )
    picks = cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.min(F.when(F.expr("cum >= (n + 1) div 2"), F.col("bin"))).alias("b50"),
        F.min(F.when(F.expr("cum >= (9 * n + 9) div 10"), F.col("bin"))).alias("b90"),
        F.min(F.when(F.expr("cum >= (99 * n + 99) div 100"), F.col("bin"))).alias("b99"),
    )
    est = picks.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "n",
        F.expr(f"__lo + (b50 * __width) div {nbins}L").cast("long").alias("p50_est_cents"),
        F.expr(f"__lo + (b90 * __width) div {nbins}L").cast("long").alias("p90_est_cents"),
        F.expr(f"__lo + (b99 * __width) div {nbins}L").cast("long").alias("p99_est_cents"),
        F.expr(f"__width div {nbins}L + 2").alias("__bound"),
    )
    # exact disc percentiles via rank pick — the gate's ground truth
    wr = W.partitionBy("event_type").orderBy("cents")
    ranked = ev.withColumn("rn", F.row_number().over(wr)).withColumn(
        "nn", F.count(F.lit(1)).over(wt)
    )
    exact = ranked.groupBy("event_type").agg(
        F.min(F.when(F.expr("rn = (nn + 1) div 2"), F.col("cents"))).alias("e50"),
        F.min(F.when(F.expr("rn = (9 * nn + 9) div 10"), F.col("cents"))).alias("e90"),
        F.min(F.when(F.expr("rn = (99 * nn + 99) div 100"), F.col("cents"))).alias("e99"),
    )
    gated = est.join(exact, "event_type")
    within = lambda e, p: (
        (F.col(e) >= F.col(p)) & (F.col(e) - F.col(p) <= F.col("__bound"))
    ).cast("long")
    return gated.select(
        "event_type",
        "n",
        "p50_est_cents",
        "p90_est_cents",
        "p99_est_cents",
        within("e50", "p50_est_cents").alias("p50_within"),
        within("e90", "p90_est_cents").alias("p90_within"),
        within("e99", "p99_est_cents").alias("p99_within"),
    )
