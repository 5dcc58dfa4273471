"""Dialect front-end tests: reference-flavored SQL (QUALIFY, ::casts,
DATE_FROM_PARTS, 2-arg LAST_DAY, PERCENTILE_CONT WITHIN GROUP) runs
unchanged through functions/snowflake_sql.run and matches DataFrame-built
ground truth. Queries here are written fresh in the reference's dialect —
shapes mirror workfile_ad-hoc_analysis.sql constructs."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.functions.snowflake_sql import run, translate
from airbnb_listings_data_pipelines_spark.sources.tpch import register_tables

from .conftest import SF_SMALL


@pytest.fixture(scope="module", autouse=True)
def _tables(spark):
    register_tables(spark, SF_SMALL)


def test_simple_qualify_dedup(spark):
    got = run(
        spark,
        """
        SELECT o_custkey, o_orderkey
        FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1
        ORDER BY o_custkey
        """,
    )
    assert got.columns == ["o_custkey", "o_orderkey"]  # __q dropped
    o = spark.table("orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    exp = (
        o.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("o_custkey", "o_orderkey")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_nested_qualify_inside_subquery(spark):
    # QUALIFY inside a FROM-subquery, aggregated above (adhoc-c shape)
    got = run(
        spark,
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM (
            SELECT o_orderstatus, o_custkey
            FROM orders
            QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) = 1
        )
        GROUP BY o_orderstatus
        """,
    ).collect()
    total = sum(r.n for r in got)
    assert total == spark.table("orders").select("o_custkey").distinct().count()


def test_statement_level_qualify_with_star(spark):
    # l2.*-style select with RANK ties kept (adhoc-b shape)
    got = run(
        spark,
        """
        SELECT l2.*
        FROM (SELECT DISTINCT o_orderstatus FROM orders) l1
        LEFT JOIN (
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
            FROM orders GROUP BY o_orderstatus, o_orderpriority
        ) l2
        ON l1.o_orderstatus = l2.o_orderstatus
        QUALIFY RANK() OVER (PARTITION BY l1.o_orderstatus ORDER BY n DESC) = 1
        """,
    )
    assert set(got.columns) == {"o_orderstatus", "o_orderpriority", "n"}
    per = {r.o_orderstatus: r.n for r in got.collect()}
    o = spark.table("orders")
    exp = (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .count()
        .groupBy("o_orderstatus")
        .agg(F.max("count").alias("m"))
    )
    assert per == {r.o_orderstatus: r.m for r in exp.collect()}


def test_snowflake_functions_and_casts(spark):
    row = run(
        spark,
        """
        SELECT
          DATE_FROM_PARTS(2020, 5, 1) AS month_start,
          LAST_DAY(DATE_FROM_PARTS(2020, 5, 1), 'MONTH') AS month_end,
          split_part('05_2020.csv', '_', 1)::INTEGER AS file_month,
          (100 * 2 / 8)::decimal(10, 2) AS pct,
          percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS med
        FROM orders
        GROUP BY 1, 2, 3, 4
        """,
    ).first()
    assert str(row.month_start) == "2020-05-01"
    assert str(row.month_end) == "2020-05-31"
    assert row.file_month == 5
    assert str(row.pct) == "25.00"
    assert row.med > 0


def test_translate_is_identity_without_dialect(spark):
    plain = "SELECT o_orderkey FROM orders WHERE o_orderkey < 5 ORDER BY o_orderkey"
    assert translate(plain) == plain


def test_extended_function_surface(spark):
    """Snowflake functions beyond the reference's own statements: IFF, NVL,
    ZEROIFNULL, SQUARE, TO_VARCHAR — translated and executed."""
    from airbnb_listings_data_pipelines_spark.functions.snowflake_sql import translate

    sql = translate(
        "SELECT IFF(1 < 2, 'y', 'n') AS a, NVL(NULL, 7) AS b, "
        "ZEROIFNULL(NULL) AS c, ZEROIFNULL(3) AS d, "
        "SQUARE(1 + 2) AS e, TO_VARCHAR(42) AS f"
    )
    row = spark.sql(sql).collect()[0]
    assert (row.a, row.b, row.c, row.d) == ("y", 7, 0, 3)
    assert row.e == 9.0
    assert row.f == "42"


def test_expand_one_arg_nested_parens_and_strings(spark):
    from airbnb_listings_data_pipelines_spark.functions.snowflake_sql import translate

    sql = translate("SELECT ZEROIFNULL(length(concat('a(', 'b)'))) AS n")
    assert spark.sql(sql).collect()[0].n == 4
