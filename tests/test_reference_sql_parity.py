"""Ultimate parity check: the reference's OWN ad-hoc SQL text
(workfile_ad-hoc_analysis.sql) runs unchanged through the Snowflake-dialect
front-end against the fixture-built warehouse, and each statement's result
must equal the DataFrame implementation in plans/adhoc.py.

The SQL is read from the read-only reference checkout at test time — no
reference code is copied into this repository. Skipped when the reference
is not present.
"""

from __future__ import annotations

import os
import re

import pytest

from airbnb_listings_data_pipelines_spark.functions.snowflake_sql import run
from airbnb_listings_data_pipelines_spark.plans.pipeline import run_adhoc, run_pipeline

from .fixtures import write_fixtures

REFERENCE_SQL = "/root/reference/workfile_ad-hoc_analysis.sql"


def _statements(path: str) -> list[str]:
    text = open(path).read()
    text = "\n".join(line for line in text.splitlines() if not line.strip().startswith("--"))
    stmts = [s.strip() for s in text.split(";") if s.strip()]
    return stmts


def _canon(df) -> list[tuple]:
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for row in pdf.itertuples(index=False):
        rows.append(tuple("NULL" if v is None or str(v) == "nan" else str(v) for v in row))
    return sorted(rows)


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    data_dir = write_fixtures(tmp_path_factory.mktemp("ref_sql_raw"))
    # persist_dir: materialize staging+warehouse once so the DataFrame
    # side of each parity statement reads parquet instead of re-running
    # the CSV lineage per comparison (guide §5)
    res = run_pipeline(
        spark,
        data_dir,
        persist_dir=str(tmp_path_factory.mktemp("ref_sql_persist")),
        register_views=False,
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS datawarehouse")
    res.fact_listing.write.mode("overwrite").saveAsTable("datawarehouse.fact_listing")
    res.dim_census.write.mode("overwrite").saveAsTable("datawarehouse.dim_census")
    return res


@pytest.mark.skipif(not os.path.exists(REFERENCE_SQL), reason="reference not present")
def test_reference_adhoc_sql_matches_dataframe_impl(spark, warehouse):
    stmts = _statements(REFERENCE_SQL)
    assert len(stmts) == 4, f"expected 4 ad-hoc statements, got {len(stmts)}"
    ours = run_adhoc(warehouse)
    expected = [
        ours["a_best_worst_demographics"],
        ours["b_best_listing_type_top5"],
        ours["c_same_neighbourhood"],
        ours["d_mortgage_coverage"],
    ]
    for i, (stmt, exp) in enumerate(zip(stmts, expected)):
        got = run(spark, stmt)
        g, e = _canon(got), _canon(exp)
        assert g == e, f"ad-hoc statement {chr(97 + i)} mismatch:\nSQL: {g[:3]}\nDF:  {e[:3]}"


REFERENCE_POPULATE = "/root/reference/workfile_populate_data_warehouse.py"


@pytest.mark.skipif(not os.path.exists(REFERENCE_POPULATE), reason="reference not present")
def test_reference_kpi_view_sql_matches_dataframe_impl(spark, warehouse):
    """The reference's four datamart view bodies (extracted from the Airflow
    file at test time) run through the front-end and match the parametric
    kpi_view builders row-for-row."""
    from airbnb_listings_data_pipelines_spark.plans import datamart

    text = open(REFERENCE_POPULATE).read()
    views = dict(
        re.findall(
            r"query_datamart_(kpi\w*)\s*=\s*f?\"\"\"(.*?)\"\"\"", text, re.DOTALL
        )
    )
    assert set(views) == {"kpi1", "kpi1_raw", "kpi2", "kpi3"}
    ours = {
        "kpi1": datamart.kpi_neighbourhood_month(warehouse.fact_listing),
        "kpi1_raw": datamart.kpi_neighbourhood_month_raw(warehouse.fact_listing),
        "kpi2": datamart.kpi_property_month(warehouse.fact_listing),
        "kpi3": datamart.kpi_host_neighbourhood_month(warehouse.fact_listing),
    }
    for name, sql in views.items():
        body = re.sub(
            r"^\s*CREATE\s+OR\s+REPLACE\s+VIEW\s+\S+\s+AS\s+",
            "",
            sql.strip().rstrip(";").strip(),
            flags=re.IGNORECASE | re.DOTALL,
        )
        got = run(spark, body)
        g, e = _canon(got), _canon(ours[name])
        assert len(g) == len(e), (name, len(g), len(e))
        assert g == e, f"{name} mismatch, first diff: " + str(
            next(((a, b) for a, b in zip(g, e) if a != b), None)
        )
