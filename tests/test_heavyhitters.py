"""Misra-Gries mergeable heavy-hitters: error-bound and merge invariants."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators import heavyhitters


def _truth(rows):
    c = Counter()
    for (s,) in rows:
        c.update(s.strip().lower().split())
    return c


def test_mg_bound_on_skewed_stream(spark):
    # zipf-ish: token t0 dominates, long tail of singletons
    rows = [("t0 " * 50 + f"u{i} v{i} w{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["text"]).repartition(8)
    m = 16
    truth = _truth(rows)
    n = sum(truth.values())
    est = {r.token: r.est for r in heavyhitters.misra_gries_token_sketch(df, m=m).collect()}
    # heavy hitter guaranteed present and within bound
    assert "t0" in est
    for tok, e in est.items():
        assert e <= truth[tok], f"{tok} overestimated"
        assert truth[tok] - e <= n / (m + 1), f"{tok} outside bound"
    # every token with true freq > N/(m+1) must survive the merge
    for tok, t in truth.items():
        if t > n / (m + 1):
            assert tok in est


def test_mg_small_vocab_is_exact(spark):
    # vocabulary fits in m -> no decrements anywhere, sketch is exact
    rows = [("a a b c",), ("b a",), ("c c c a",)]
    df = spark.createDataFrame(rows, ["text"]).repartition(2)
    est = {r.token: r.est for r in heavyhitters.misra_gries_token_sketch(df, m=8).collect()}
    assert est == dict(_truth(rows))


def test_mg_partials_are_bounded_and_merge_is_narrow(spark):
    rows = [(f"x{i % 5} y{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, ["text"]).repartition(4)
    m = 8
    partials = heavyhitters.misra_gries_partial(df, m=m)
    per_part = partials.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert all(r["count"] <= m for r in per_part)
    merged = heavyhitters.misra_gries_merge(partials, m=m)
    assert merged.count() <= 4 * m  # never wider than the summed partials
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
