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
