from __future__ import annotations

import csv

from airbnb_listings_data_pipelines_spark.plans.preprocess import (
    canonical_columns,
    harmonize_files,
    inspect_schemas,
)


def _write(path, header, rows):
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(header)
        w.writerows(rows)


def test_harmonize_differing_schemas(spark, tmp_path):
    # month 1: old dump (no late-added cols, has an extra col to drop)
    f1 = tmp_path / "05_2020.csv"
    _write(f1, ["id", "name", "price", "legacy_only"], [["1", "a", "$10", "x"], ["2", "b", "$20", "y"]])
    # month 2: new dump (late-added col present, different order)
    f2 = tmp_path / "06_2020.csv"
    _write(f2, ["id", "price", "name", "bedrooms"], [["3", "$30", "c", "2"]])

    schemas = inspect_schemas(spark, [str(f1), str(f2)])
    cols = canonical_columns(schemas, curated=["bedrooms"])
    # intersection keeps id/name/price in file-1 order; curated re-added
    assert cols == ["id", "name", "price", "bedrooms"]

    out = harmonize_files(spark, [str(f1), str(f2)], canonical=cols)
    assert out.columns == ["id", "name", "price", "bedrooms", "filename"]
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 3
    assert rows["1"].bedrooms is None          # null-filled where missing
    assert rows["3"].bedrooms == "2"
    assert rows["3"].name == "c"               # order realigned, not positional
    assert rows["1"].filename == "05_2020.csv"
    assert "legacy_only" not in out.columns    # extras dropped
