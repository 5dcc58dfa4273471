from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.functions import (
    multi_replace,
    nullify_tokens,
    split_part,
    top1_per_group,
    try_decimal,
)


def test_split_part_negative_index(spark):
    df = spark.createDataFrame([("a/b/c.csv",), ("$1,234.00",)], ["s"])
    rows = df.select(
        split_part("s", "/", -1).alias("last"),
        split_part("s", "$", -1).alias("price"),
        split_part("s", "/", 1).alias("first"),
    ).collect()
    assert rows[0].last == "c.csv"
    assert rows[0].first == "a"
    assert rows[1].price == "1,234.00"


def test_multi_replace_order_sensitive(spark):
    # reference nests REPLACE 4 deep (design.sql:452-453): COUNCIL / CITY OF / SAINT->ST
    df = spark.createDataFrame([("CITY OF SAINT MARYS COUNCIL",)], ["s"])
    out = df.select(
        F.trim(
            multi_replace("s", [("COUNCIL", ""), ("CITY OF", ""), ("SAINT", "ST")])
        ).alias("c")
    ).collect()[0].c
    assert out == "ST MARYS"


def test_nullify_tokens(spark):
    df = spark.createDataFrame([("\\N",), ("NULL",), ("NUL",), ("",), ("ok",)], ["s"])
    vals = [r.c for r in df.select(nullify_tokens("s").alias("c")).collect()]
    assert vals == [None, None, None, None, "ok"]


def test_try_decimal_comma_price_is_null(spark):
    # SURVEY §2.10(2): comma prices must become NULL (design-accident parity)
    df = spark.createDataFrame([("1,234.00",), ("123.45",), ("abc",)], ["p"])
    vals = [r.d for r in df.select(try_decimal("p").alias("d")).collect()]
    assert vals[0] is None and vals[2] is None
    assert str(vals[1]) == "123.45"


def test_top1_per_group_row_number_vs_rank(spark):
    df = spark.createDataFrame(
        [("g1", 10, "a"), ("g1", 10, "b"), ("g2", 5, "c")], ["g", "v", "id"]
    )
    one = top1_per_group(df, ["g"], [F.desc("v"), F.col("id")])
    assert sorted((r.g, r.id) for r in one.collect()) == [("g1", "a"), ("g2", "c")]
    ties = top1_per_group(df, ["g"], [F.desc("v")], keep_ties=True)
    assert ties.filter(F.col("g") == "g1").count() == 2


def test_half_up_long_parity_on_current_lineage(spark):
    """Round-13 verdict item 10: half_up_long's floor(x+.5) equivalence
    to round() is DATA-dependent (documented divergence at half-ulp-
    below-.5 doubles), so the row-by-row parity sweep re-runs against
    whatever testdata is on disk — a regeneration that crosses the edge
    case fails HERE, not in a silent oracle mismatch. One aggregate scan
    per (SF, table): every expression any query feeds to half_up_long.
    """
    from airbnb_listings_data_pipelines_spark.functions.dialect import (
        half_up_long,
    )
    from airbnb_listings_data_pipelines_spark.sources.tpch import load_table
    from pyspark.sql import functions as F

    def mismatches(df, exprs):
        aggs = [
            F.sum(
                (
                    ~half_up_long(e).eqNullSafe(
                        F.round(e, 0).cast("long")
                    )
                ).cast("long")
            ).alias(f"m{i}")
            for i, e in enumerate(exprs)
        ]
        row = df.agg(*aggs).collect()[0]
        return {i: row[f"m{i}"] for i in range(len(exprs))}

    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        li = load_table(spark, sf_dir, "lineitem")
        q, p, d = (
            F.col("l_quantity"),
            F.col("l_extendedprice"),
            F.col("l_discount"),
        )
        bad = mismatches(
            li, [q * 100, p * 100, (p * (1 - d)) * 10000, q, p]
        )
        assert not any(bad.values()), (sf_dir, "lineitem", bad)
        ev = load_table(spark, sf_dir, "events")
        bad = mismatches(ev, [F.col("value") * 100])
        assert not any(bad.values()), (sf_dir, "events", bad)
