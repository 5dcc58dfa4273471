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
