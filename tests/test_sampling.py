"""weighted_bernoulli_sample overflow-envelope guards: the exact-integer
contract (h * cap inside int64, no silent fractional-weight truncation) is
enforced per-row instead of corrupting the sample."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators import sampling


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, float(1 + i % 5)) for i in range(100)], ["doc_id", "w"]
    )


def test_valid_integer_weights_sample_deterministically(spark, docs):
    out1 = sampling.weighted_bernoulli_sample(docs, "doc_id", "w", F.lit(5)).collect()
    out2 = sampling.weighted_bernoulli_sample(docs, "doc_id", "w", F.lit(5)).collect()
    assert sorted(r.doc_id for r in out1) == sorted(r.doc_id for r in out2)
    assert 0 < len(out1) < 100
    # integer-VALUED doubles are fine (5.0 == floor(5.0))
    full = sampling.weighted_bernoulli_sample(
        docs.withColumn("w", F.lit(5.0)), "doc_id", "w", F.lit(5)
    )
    assert full.count() == 100  # weight == cap -> keep everything


def test_fractional_weight_raises(spark, docs):
    bad = docs.withColumn("w", F.lit(0.9))
    with pytest.raises(Exception, match="integer-valued"):
        sampling.weighted_bernoulli_sample(bad, "doc_id", "w", F.lit(5)).count()


def test_cap_overflow_raises(spark, docs):
    with pytest.raises(Exception, match="2\\^31"):
        sampling.weighted_bernoulli_sample(
            docs, "doc_id", "w", F.lit(1 << 31).cast("long")
        ).count()


def test_negative_weight_raises(spark, docs):
    bad = docs.withColumn("w", F.lit(-1))
    with pytest.raises(Exception, match="non-negative"):
        sampling.weighted_bernoulli_sample(bad, "doc_id", "w", F.lit(5)).count()


def test_temperature_mixture_upsamples_small_sources(spark):
    from airbnb_listings_data_pipelines_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    # skewed corpus: big source 800 rows, small source 50 rows
    rows = [(i, "big") for i in range(800)] + [(1000 + i, "small") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mixture_sample(df, alpha=0.5, frac=0.25)
    got = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    n_big, n_small = got.get("big", 0), got.get("small", 0)
    # alpha=0.5 flattens: the small source's sampled FRACTION must exceed
    # the big source's (0.25*sqrt-weighting ups small from 6% to ~24%)
    assert n_small / 50 > n_big / 800
    # total stays near the 25% budget (hash Bernoulli, so approximate)
    assert 0.15 * 850 < n_big + n_small < 0.35 * 850
    # deterministic across re-runs
    again = temperature_mixture_sample(df, alpha=0.5, frac=0.25)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
