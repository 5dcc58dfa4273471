"""RENAME/DROP COLUMN via column mapping (Delta's columnMapping=name
design): logical names change as METADATA-ONLY commits; physical parquet
column names never change once written, so zero files are rewritten at
any table size. Reads resolve logical -> physical and alias back; writes
rename at the _write_data chokepoint; a re-added dropped name maps to a
FRESH physical name so dropped data can never resurrect. Time travel is
exact across both operations (schema AND mapping are per-version)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.txlog import (
    CheckViolation,
    TxLogTable,
)


def _t(spark, tmp_path, rows=((1, 10.0), (2, 20.0))):
    return TxLogTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame(list(rows), "k int, price double").coalesce(1),
    )


def test_rename_is_metadata_only_and_exact(spark, tmp_path):
    t = _t(spark, tmp_path)
    files_before = set(t.files())
    v = t.rename_column("price", "amount")
    assert set(t.files()) == files_before, "rename rewrote data files"
    assert t.read().columns == ["k", "amount"]
    assert {(r.k, r.amount) for r in t.read().collect()} == {(1, 10.0), (2, 20.0)}
    # time travel: the old logical name before the rename
    assert t.read_version(v - 1).columns == ["k", "price"]
    # writes after the rename: new logical name in, physical stays stable
    t.append(spark.createDataFrame([(3, 30.0)], "k int, amount double"))
    assert {r.amount for r in t.read().collect()} == {10.0, 20.0, 30.0}
    # the OLD name is now an unknown extra column — rejected loudly
    with pytest.raises(ValueError, match="absent from table"):
        t.append(spark.createDataFrame([(4, 40.0)], "k int, price double"))
    # DML through the mapping: predicate + assignment on the new name
    t.update_where("amount = 10.0", {"amount": F.col("amount") + 1.0})
    t.delete_where("amount = 30.0")
    assert {(r.k, r.amount) for r in t.read().collect()} == {(1, 11.0), (2, 20.0)}


def test_drop_and_readd_never_resurrects(spark, tmp_path):
    t = _t(spark, tmp_path)
    v_drop = t.drop_column("price")
    assert t.read().columns == ["k"]
    assert "price" in t.read_version(v_drop - 1).columns  # time travel exact
    # re-adding the same logical name maps to a FRESH physical column:
    # the old files' stored values must NOT come back
    t.add_column("price", "double")
    assert {(r.k, r.price) for r in t.read().collect()} == {(1, None), (2, None)}
    t.append(spark.createDataFrame([(3, 99.0)], "k int, price double"))
    assert {(r.k, r.price) for r in t.read().collect()} == {
        (1, None),
        (2, None),
        (3, 99.0),
    }


def test_mapping_guards(spark, tmp_path):
    t = TxLogTable.create(
        spark,
        str(tmp_path / "p"),
        spark.createDataFrame(
            [(1, "a", 10.0)], "k int, part string, price double"
        ),
        partition_by=["part"],
    )
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("part", "region")
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("part")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("price", "k")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("ghost", "x")
    t.add_check("price_pos", "price >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.rename_column("price", "amount")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.drop_column("price")
    t.drop_check("price_pos")
    t.rename_column("price", "amount")  # now allowed
    assert t.read().columns == ["k", "part", "amount"]


def test_checks_enforced_through_mapping(spark, tmp_path):
    """A CHECK added AFTER a rename references the new logical name; the
    write-time enforcement scan must resolve it against files that carry
    the old physical name."""
    t = _t(spark, tmp_path)
    t.rename_column("price", "amount")
    t.add_check("amount_pos", "amount >= 0")
    with pytest.raises(CheckViolation, match="amount_pos"):
        t.append(spark.createDataFrame([(9, -1.0)], "k int, amount double"))
    t.append(spark.createDataFrame([(3, 30.0)], "k int, amount double"))
    assert {r.k for r in t.read().collect()} == {1, 2, 3}


def test_restore_reverts_mapping(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.rename_column("price", "amount")
    t.restore(0)
    assert t.read().columns == ["k", "price"]
    assert {(r.k, r.price) for r in t.read().collect()} == {(1, 10.0), (2, 20.0)}
    t.append(spark.createDataFrame([(3, 30.0)], "k int, price double"))
    assert {r.price for r in t.read().collect()} == {10.0, 20.0, 30.0}


def test_change_feed_and_read_where_through_mapping(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.rename_column("price", "amount")  # v1
    t.delete_where("amount = 10.0")  # v2
    feed = t.read_changes(2, 2)
    assert {(r._change_type, r.k, r.amount) for r in feed.collect()} == {
        ("delete", 1, 10.0)
    }
    # footer-stats skipping translates logical -> physical for the lookup
    got = {r.k for r in t.read_where("amount", 15.0, 25.0).collect()}
    assert got == {2}


def test_delta_export_refuses_mapped_tables(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.to_delta_log()  # fine pre-mapping
    t.rename_column("price", "amount")
    with pytest.raises(NotImplementedError, match="column-maps"):
        t.to_delta_log()


def test_clone_carries_mapping(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.rename_column("price", "amount")
    c = t.clone(str(tmp_path / "c"))
    assert c.read().columns == ["k", "amount"]
    assert {(r.k, r.amount) for r in c.read().collect()} == {(1, 10.0), (2, 20.0)}
    c.append(spark.createDataFrame([(3, 30.0)], "k int, amount double"))
    assert {r.k for r in c.read().collect()} == {1, 2, 3}


def test_datasource_reads_mapped_table(spark, tmp_path):
    from airbnb_listings_data_pipelines_spark.sources import txlog_source

    txlog_source.register(spark)
    t = _t(spark, tmp_path)
    t.rename_column("price", "amount")
    t.drop_column("amount")
    t.add_column("amount", "double")
    t.append(spark.createDataFrame([(3, 42.0)], "k int, amount double"))
    got = spark.read.format("txlog").load(t.path)
    assert got.columns == ["k", "amount"]
    assert {(r.k, r.amount) for r in got.collect()} == {
        (1, None),
        (2, None),
        (3, 42.0),
    }
    # time travel through the DataSource reads the pre-rename binding
    v0 = spark.read.format("txlog").option("versionAsOf", 0).load(t.path)
    assert v0.columns == ["k", "price"]
    assert {(r.k, r.price) for r in v0.collect()} == {(1, 10.0), (2, 20.0)}
