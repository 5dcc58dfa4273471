"""Staging-layer parity: the reference's OWN CTAS SQL text
(workfile_design_data_warehouse.sql:140-267 — staging_census,
staging_location, staging_listing) runs unchanged through the
Snowflake-dialect front-end against raw positional-CSV tables, and each
result must equal the DataFrame implementation in plans/staging.py.

The SQL is read from the read-only reference checkout at test time — no
reference code is copied into this repository. Skipped when the reference
is not present.

Canonicalization notes:
- column names compare case-insensitively (the reference SQL writes
  ``Tot_P_P``; the engine's impls use snake_case);
- numeric values compare as floats: the front-end maps ``NUMERIC`` to
  decimal(18,6) while plans/staging.py types price as decimal(10,2)
  (documented scale divergence, SURVEY §2.10(8)) — equal numbers, not
  equal string scales.
"""

from __future__ import annotations

import os
import re
from decimal import Decimal

import pytest

from airbnb_listings_data_pipelines_spark.functions.snowflake_sql import run
from airbnb_listings_data_pipelines_spark.plans import staging
from airbnb_listings_data_pipelines_spark.plans.pipeline import RAW_GLOBS, RAW_WIDTHS
from airbnb_listings_data_pipelines_spark.sources.csv import read_positional_csv

from .fixtures import write_fixtures

REFERENCE_SQL = "/root/reference/workfile_design_data_warehouse.sql"

# reference raw table name -> our RAW_GLOBS key
RAW_TABLES = {
    "raw_listing": "listing",
    "raw_censusG01": "census_g01",
    "raw_censusG02": "census_g02",
    "raw_lga": "lga",
    "raw_ssc": "ssc",
}


def _staging_bodies(path: str) -> dict[str, str]:
    text = open(path).read()
    text = "\n".join(line for line in text.splitlines() if not line.strip().startswith("--"))
    bodies = {}
    for stmt in (s.strip() for s in text.split(";") if s.strip()):
        m = re.match(
            r"CREATE\s+OR\s+REPLACE\s+TABLE\s+staging\.(\w+)\s+AS\s*(.*)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            bodies[m.group(1).lower()] = m.group(2)
    return bodies


def _canon(df) -> list[tuple]:
    pdf = df.toPandas()
    pdf.columns = [c.lower() for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for row in pdf.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or str(v) == "nan" or str(v) == "NaT":
                vals.append("NULL")
            elif isinstance(v, Decimal):
                vals.append(repr(float(v)))
            else:
                vals.append(str(v))
        rows.append(tuple(vals))
    return sorted(rows)


@pytest.fixture(scope="module")
def raw_catalog(spark, tmp_path_factory):
    data_dir = write_fixtures(tmp_path_factory.mktemp("staging_sql_raw"))
    spark.sql("CREATE DATABASE IF NOT EXISTS raw")
    frames = {}
    for ref_name, key in RAW_TABLES.items():
        df = read_positional_csv(
            spark, data_dir, glob=RAW_GLOBS[key], n_cols=RAW_WIDTHS[key]
        )
        df.write.mode("overwrite").saveAsTable(f"raw.{ref_name}")
        frames[key] = spark.table(f"raw.{ref_name}")
    return frames


@pytest.mark.skipif(not os.path.exists(REFERENCE_SQL), reason="reference not present")
def test_reference_staging_ctas_sql_matches_dataframe_impl(spark, raw_catalog):
    bodies = _staging_bodies(REFERENCE_SQL)
    assert set(bodies) == {"staging_census", "staging_location", "staging_listing"}
    ours = {
        "staging_census": staging.build_staging_census(
            raw_catalog["census_g01"], raw_catalog["census_g02"]
        ),
        "staging_location": staging.build_staging_location(
            raw_catalog["ssc"], raw_catalog["lga"]
        ),
        "staging_listing": staging.build_staging_listing(raw_catalog["listing"]),
    }
    for name, body in bodies.items():
        got = run(spark, body)
        g, e = _canon(got), _canon(ours[name])
        assert len(g) == len(e), (name, len(g), len(e))
        assert g == e, f"{name} mismatch, first diff: " + str(
            next(((a, b) for a, b in zip(g, e) if a != b), None)
        )
