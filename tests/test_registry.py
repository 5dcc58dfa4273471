from __future__ import annotations

import pytest

from airbnb_listings_data_pipelines_spark.queries.registry import load_all

from .conftest import SF_SMALL

REG = load_all()

# cheap oracle-matched subset for fast pytest runs; the full strict gate is
# tools/check_oracle.py at sf0.01
FAST_SUBSET = [
    "q01_pricing_summary",
    "q04_full_outer_subaggs",
    "q07_dedup_row_number",
    "q09_lag_mom_change",
    "q11_median_percentile",
    "q14_case_ladder",
    "q18_try_cast_price",
    "x01_dedup_exact",
    "x03_quality_scores",
]


def test_registry_shape():
    assert len(REG) >= 30
    for name, spec in REG.items():
        assert spec.name == name and callable(spec.fn)
        assert spec.doc, f"{name} missing doc"


def test_oracles_are_valid_duckdb_sql(duck):
    for name, spec in REG.items():
        if spec.oracle is not None:
            duck.sql(f"EXPLAIN {spec.oracle}")  # raises on invalid SQL


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_query_matches_oracle_sf0001(spark, duck, name):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from check_oracle import canon

    spec = REG[name]
    sdf = spec.fn(spark, SF_SMALL).toPandas()
    odf = duck.sql(spec.oracle).df()
    assert len(sdf) == len(odf)
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert canon(sdf) == canon(odf)
