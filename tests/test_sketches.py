"""Mergeable-sketch properties behind x36 (queries/sketches.py).

The incremental-materialization claim is only sound if sketch union is
LOSSLESS relative to one-shot aggregation: estimate(union(per-partition
sketches)) must equal estimate(sketch(all rows)). For HLL this holds by
construction — registers merge by max — so the equality is exact, not
approximate, in both the sparse (low cardinality, exact counts) and
dense/estimation (high cardinality) regimes. If this ever drifted, every
persisted-sketch rollup would silently disagree with a recompute.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

from .conftest import SF_SMALL


def _one_shot_vs_two_level(ev, key_col: str):
    one = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(key_col, F.lit(12))).alias("est1")
    )
    per_day = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("d")).agg(
        F.hll_sketch_agg(key_col, F.lit(12)).alias("sk")
    )
    two = per_day.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est2")
    )
    return one.join(two, "event_type").collect()


def test_hll_union_is_lossless_sparse_regime(spark):
    """Low cardinality (user_id): sketches stay sparse and exact; the
    two-level rollup must return the identical exact count."""
    ev = load_table(spark, SF_SMALL, "events")
    rows = _one_shot_vs_two_level(ev, "user_id")
    assert len(rows) > 0
    for r in rows:
        assert r.est1 == r.est2, (r.event_type, r.est1, r.est2)


def test_hll_union_is_lossless_estimation_regime(spark):
    """High cardinality (event_id, unique per row): sketches go dense and
    estimates carry HLL error — but union must still reproduce the
    one-shot estimate exactly (register-max merge is associative)."""
    ev = load_table(spark, SF_SMALL, "events")
    rows = _one_shot_vs_two_level(ev, "event_id")
    n = ev.count()
    for r in rows:
        assert r.est1 == r.est2, (r.event_type, r.est1, r.est2)
    # and the estimates are in the right ballpark of true cardinality
    total_est = sum(r.est1 for r in rows)
    assert abs(total_est - n) <= 0.05 * n, (total_est, n)


def test_quantile_histogram_merge_is_lossless(spark):
    """x51's rollup claim: summing per-(type, day) bin counts equals the
    one-shot global histogram EXACTLY (integer sums are associative), so
    the persisted-artifact path and a full recompute agree bin-for-bin."""
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    bounds = ev.agg(
        F.min("cents").alias("__lo"),
        (F.max("cents") - F.min("cents") + 1).alias("__width"),
    )
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type", "d", F.expr("(cents - __lo) * 256L div __width").alias("bin")
    )
    one_shot = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    two_level = (
        binned.groupBy("event_type", "d", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("event_type", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert one_shot.exceptAll(two_level).count() == 0
    assert two_level.exceptAll(one_shot).count() == 0


def test_quantile_histogram_flags_hold_across_sfs(spark):
    """The error-bound theorem (est edge within one bin width of the exact
    rank-picked percentile) must hold on any data, not just sf0.01 — the
    oracle emits it as a constant, so measure it here at sf0.001 too."""
    from airbnb_listings_data_pipelines_spark.queries.registry import load_all

    fn = load_all()["x51_mergeable_quantile_histogram"].fn
    rows = fn(spark, SF_SMALL).collect()
    assert rows, "no event types"
    for r in rows:
        assert r.p50_within == 1 and r.p90_within == 1 and r.p99_within == 1
