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


def test_alias_in_window_with_nested_parens(spark):
    """r2 ADVICE carry-over: the window spec wraps the alias in a function
    call (nested parens inside OVER) — the balanced-paren capture must
    still expand it."""
    got = run(
        spark,
        """
        SELECT o_orderkey, o_totalprice * 2 AS rev,
               RANK() OVER (ORDER BY round(rev, 2) DESC, o_orderkey) AS r
        FROM orders LIMIT 500
        """,
    )
    rows = got.orderBy("r").collect()
    assert rows[0].rev == max(r.rev for r in rows)


def test_alias_substitution_skips_string_literals(spark):
    """An alias name (and even 'OVER(') appearing inside a quoted literal
    must never be rewritten."""
    got = run(
        spark,
        """
        SELECT o_orderkey AS k, 'k OVER( k' AS tag,
               ROW_NUMBER() OVER (ORDER BY k) AS r
        FROM orders LIMIT 3
        """,
    ).collect()
    assert all(row.tag == "k OVER( k" for row in got)
    assert [row.r for row in got] == [1, 2, 3]


def test_alias_in_where_clause(spark):
    """Snowflake resolves select aliases in WHERE (design.sql:178);
    Spark needs the expansion."""
    got = run(
        spark,
        "SELECT o_orderkey * 10 AS key10 FROM orders WHERE key10 <= 50",
    ).collect()
    exp = sorted(
        r.key10
        for r in spark.table("orders")
        .select((F.col("o_orderkey") * 10).alias("key10"))
        .filter(F.col("key10") <= 50)
        .collect()
    )
    assert exp and sorted(row.key10 for row in got) == exp


def test_self_referential_alias_not_expanded(spark):
    """``f(col) AS col`` must bind the inner reference to the input column
    (both dialects) — expanding it would recurse forever."""
    sql = translate(
        "SELECT split_part(filename, '/', -1) AS filename, "
        "ROW_NUMBER() OVER (PARTITION BY split_part(filename, '/', -1) ORDER BY filename) AS r "
        "FROM t WHERE filename IS NOT NULL"
    )
    # the window/WHERE text is untouched: no parenthesized expansion appeared
    assert "((" not in sql.replace("ROW_NUMBER", "")
    assert sql.count("split_part(filename, '/', -1)") == 2


def test_variant_paths_and_metadata_filename_translate():
    sql = translate(
        "SELECT r1.value:c1::NUMERIC AS a, value:c4::TEXT AS b, "
        "SPLIT_PART(metadata$filename, '/', -1)::VARCHAR AS f, "
        "'value:c9 metadata$filename NUMERIC' AS lit "
        "FROM raw.raw_x r1"
    )
    assert "r1.c1::decimal(18,6) AS a" in sql
    assert "c4::string AS b" in sql
    assert "SPLIT_PART(filename, '/', -1)::string AS f" in sql
    # string literal content untouched
    assert "'value:c9 metadata$filename NUMERIC'" in sql
