from __future__ import annotations

import datetime

from airbnb_listings_data_pipelines_spark.operators import scd


def _d(s: str) -> datetime.date:
    return datetime.date.fromisoformat(s)


def test_scd2_from_snapshots_collapses_runs(spark):
    snaps = spark.createDataFrame(
        [
            # listing A: price changes in March (Feb identical to Jan)
            ("A", _d("2020-01-01"), "100", "Entire"),
            ("A", _d("2020-02-01"), "100", "Entire"),
            ("A", _d("2020-03-01"), "120", "Entire"),
            # listing B: attribute flips twice
            ("B", _d("2020-01-01"), "50", "Private"),
            ("B", _d("2020-02-01"), "50", "Shared"),
            ("B", _d("2020-03-01"), "50", "Private"),
            # listing C: appears only in March
            ("C", _d("2020-03-01"), "80", "Entire"),
        ],
        ["id", "snap_date", "price", "room"],
    )
    hist = scd.scd2_from_snapshots(snaps, ["id"], "snap_date", ["price", "room"])
    rows = {(r.id, str(r.valid_from)): r for r in hist.collect()}
    assert len(rows) == 6  # A:2 versions, B:3, C:1
    a1 = rows[("A", "2020-01-01")]
    assert str(a1.valid_to) == "2020-03-01" and not a1.is_current and a1.price == "100"
    a2 = rows[("A", "2020-03-01")]
    assert a2.valid_to is None and a2.is_current and a2.price == "120"
    assert rows[("B", "2020-02-01")].room == "Shared"
    assert rows[("C", "2020-03-01")].is_current


def test_scd2_upsert_closes_and_inserts(spark):
    snaps = spark.createDataFrame(
        [
            ("A", _d("2020-01-01"), "100"),
            ("B", _d("2020-01-01"), "50"),
        ],
        ["id", "snap_date", "price"],
    )
    dim = scd.scd2_from_snapshots(snaps, ["id"], "snap_date", ["price"])
    updates = spark.createDataFrame(
        [
            ("A", "110", _d("2020-04-01")),  # changed -> close + new version
            ("B", "50", _d("2020-04-01")),   # unchanged -> untouched
            ("D", "70", _d("2020-04-01")),   # new key -> insert
        ],
        ["id", "price", "valid_from"],
    )
    out = scd.scd2_upsert(dim, updates, ["id"], ["price"])
    rows = sorted(
        ((r.id, str(r.valid_from), r.price, r.is_current, str(r.valid_to)) for r in out.collect())
    )
    assert rows == [
        ("A", "2020-01-01", "100", False, "2020-04-01"),
        ("A", "2020-04-01", "110", True, "None"),
        ("B", "2020-01-01", "50", True, "None"),
        ("D", "2020-04-01", "70", True, "None"),
    ]
    # idempotence: replaying the same batch changes nothing
    again = scd.scd2_upsert(out, updates, ["id"], ["price"])
    assert sorted(
        ((r.id, str(r.valid_from), r.price, r.is_current, str(r.valid_to)) for r in again.collect())
    ) == rows
