"""Warehouse-layer parity: the reference's OWN fact_listing INSERT —
its single biggest statement (workfile_design_data_warehouse.sql:419-549:
90-column INSERT, WITH CTE, derived-suburb split/replace chains, twice-
joined location dim, month-validity window, the 30-branch Unicode CASE
ladders, twice-joined deduped (lga_name, lga_code) dim) — runs unchanged
through the Snowflake-dialect front-end against OUR staging tables, and
the result must equal plans/warehouse.build_fact_listing row-for-row.

With this test every reference SQL layer runs verbatim through the
front-end: staging CTAS (test_reference_staging_sql_parity), warehouse
INSERT (here), KPI views + ad-hoc a-d (test_reference_sql_parity).

The SQL is read from the read-only reference checkout at test time — no
reference code is copied into this repository. Skipped when the reference
is not present. The INSERT's column list maps the SELECT output
positionally (standard INSERT semantics), so the translated result is
renamed positionally before the order-insensitive canonical compare.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

import pytest

from airbnb_listings_data_pipelines_spark.functions.snowflake_sql import run
from airbnb_listings_data_pipelines_spark.plans import staging, warehouse
from airbnb_listings_data_pipelines_spark.plans.pipeline import RAW_GLOBS, RAW_WIDTHS
from airbnb_listings_data_pipelines_spark.sources.csv import read_positional_csv

from .fixtures import write_fixtures
from .test_reference_staging_sql_parity import REFERENCE_SQL, _canon


def _insert_stmt(path: str, table: str) -> tuple[list[str], str]:
    text = open(path).read()
    text = "\n".join(line for line in text.splitlines() if not line.strip().startswith("--"))
    for stmt in (s.strip() for s in text.split(";") if s.strip()):
        m = re.match(
            r"INSERT\s+INTO\s+datawarehouse\." + table + r"\s*\(([^)]*)\)\s*(.*)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            cols = [c.strip().lower() for c in m.group(1).split(",") if c.strip()]
            return cols, m.group(2)
    raise AssertionError(f"{table} INSERT not found in reference SQL")


@pytest.fixture(scope="module")
def staging_frames(spark, tmp_path_factory):
    data_dir = write_fixtures(tmp_path_factory.mktemp("warehouse_sql_raw"))
    raw = {
        key: read_positional_csv(spark, data_dir, glob=RAW_GLOBS[key], n_cols=RAW_WIDTHS[key])
        for key in ("listing", "ssc", "lga", "census_g01", "census_g02")
    }
    frames = {
        "staging_listing": staging.build_staging_listing(raw["listing"]),
        "staging_location": staging.build_staging_location(raw["ssc"], raw["lga"]),
        "staging_census": staging.build_staging_census(raw["census_g01"], raw["census_g02"]),
    }
    spark.sql("CREATE DATABASE IF NOT EXISTS staging")
    for name, df in frames.items():
        df.write.mode("overwrite").saveAsTable(f"staging.{name}")
    return {name: spark.table(f"staging.{name}") for name in frames}


@pytest.mark.skipif(not os.path.exists(REFERENCE_SQL), reason="reference not present")
def test_reference_dim_census_insert_sql_matches_dataframe_impl(spark, staging_frames):
    cols, body = _insert_stmt(REFERENCE_SQL, "dim_census")
    got = run(spark, body)
    assert len(got.columns) == len(cols), (len(got.columns), len(cols))
    # INSERT implicitly casts into the target's declared types; the only
    # type change dim_census declares vs staging_census is lga_code VARCHAR
    # (design.sql:279) — apply it, as the INSERT executor would.
    got = got.toDF(*cols).withColumn("lga_code", F.col("lga_code").cast("string"))
    expected = warehouse.build_dim_census(staging_frames["staging_census"])
    assert sorted(c.lower() for c in expected.columns) == sorted(cols)
    g, e = _canon(got), _canon(expected)
    assert len(g) == len(e) and len(g) > 0, (len(g), len(e))
    assert g == e


@pytest.mark.skipif(not os.path.exists(REFERENCE_SQL), reason="reference not present")
def test_reference_fact_insert_sql_matches_dataframe_impl(spark, staging_frames):
    cols, body = _insert_stmt(REFERENCE_SQL, "fact_listing")
    assert len(cols) == 91, len(cols)

    got = run(spark, body)
    assert len(got.columns) == len(cols), (len(got.columns), len(cols))
    got = got.toDF(*cols)

    expected = warehouse.build_fact_listing(
        staging_frames["staging_listing"], staging_frames["staging_location"]
    )
    assert sorted(c.lower() for c in expected.columns) == sorted(cols)

    g, e = _canon(got), _canon(expected)
    assert len(g) == len(e) and len(g) > 0, (len(g), len(e))
    assert g == e, "fact_listing mismatch, first diff: " + str(
        next(((a, b) for a, b in zip(g, e) if a != b), None)
    )
