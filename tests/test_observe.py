"""df.observe(): zero-extra-pass pipeline metrics.

At 100 TB you cannot afford a second scan just to count rejects or sum a
quality column — Observation metrics piggyback named aggregates on the
SAME job that produces the output (accumulator-style, no extra shuffle,
no extra scan). This is how the curation/ELT plans should expose health
metrics (rows in, rows dropped, null rates) in production.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

from .conftest import SF_SMALL


def test_observe_collects_metrics_on_the_same_job(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    obs = Observation("curation_health")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum((F.length("text") < 10).cast("long")).alias("too_short"),
        F.sum(F.col("lang").isNull().cast("long")).alias("null_lang"),
    )
    kept = observed.filter(F.length("text") >= 10)
    n_kept = kept.count()  # the one and only action

    m = obs.get
    assert m["rows_in"] == docs.count()
    assert m["rows_in"] - m["too_short"] == n_kept
    assert m["null_lang"] == 0


def test_observe_metrics_match_explicit_aggregation(spark):
    ev = load_table(spark, SF_SMALL, "events")
    obs = Observation("events_health")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    exact = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    ).first()
    assert m["n"] == exact["n"] and m["cents"] == exact["cents"]
