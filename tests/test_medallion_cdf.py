"""Medallion composition (streaming/upsert.cdf_apply_stream_txlog):
bronze table A's Change Data Feed streamed into silver table B through
the txlog DataSource, with exactly-once txn markers on BOTH per-batch
merge commits (upserts then deletes). B must converge to A's snapshot
at every drain, across checkpoint restarts, and a crash replay at
either commit boundary must be a no-op by log state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.txlog import (
    TxLogTable,
    merge_into_txlog,
)
from airbnb_listings_data_pipelines_spark.sources import txlog_source
from airbnb_listings_data_pipelines_spark.streaming.upsert import (
    cdf_apply_stream_txlog,
)


@pytest.fixture(scope="module")
def registered(spark):
    txlog_source.register(spark)
    return spark


def _snap(t):
    return sorted(map(tuple, t.read().collect()))


def _drain(spark, a_path, b_path, ckpt):
    stream = (
        spark.readStream.format("txlog")
        .option("readChangeFeed", "true")
        .load(a_path)
    )
    q = cdf_apply_stream_txlog(stream, b_path, ["k"], ckpt, app_id="med")
    q.awaitTermination(180)


def test_silver_converges_across_restarts_and_replays(registered, tmp_path):
    spark = registered
    a_path, b_path, ckpt = (
        str(tmp_path / "a"),
        str(tmp_path / "b"),
        str(tmp_path / "ck"),
    )
    a = TxLogTable.create(
        spark,
        a_path,
        spark.createDataFrame(
            [(k, float(k)) for k in range(20)], "k int, v double"
        ).repartitionByRange(4, "k"),
    )
    # drain 1: create-only feed -> B bootstraps to A@v0
    _drain(spark, a_path, b_path, ckpt)
    b = TxLogTable(spark, b_path)
    assert _snap(b) == _snap(a)

    # upstream DML between drains: delete + update + re-insert of a
    # deleted key (exercises delete-then-insert ACROSS commits)
    a.delete_where("k % 5 = 1")
    a.update_where("k % 4 = 2", {"v": F.col("v") + 100.0})
    a.append(spark.createDataFrame([(1, -1.0)], "k int, v double"))
    # drain 2 resumes from the SAME checkpoint (a restart, not a rebuild)
    _drain(spark, a_path, b_path, ckpt)
    assert _snap(b) == _snap(a)

    # crash replay at the LAST commit boundary: both of the final
    # batch's txn ids are spent — re-running either merge with its id
    # must change nothing (poison values would break equality)
    last = b.last_txn_version("med")
    before = _snap(b)
    hist_before = len(b.history())
    poison = spark.createDataFrame([(2, -999.0)], "k int, v double")
    merge_into_txlog(spark, b, poison, ["k"], txn=("med", last))
    if last >= 1:
        merge_into_txlog(
            spark, b, poison, ["k"],
            when_matched="delete", when_not_matched="ignore",
            txn=("med", last - 1),
        )
    assert _snap(b) == before
    assert len(b.history()) == hist_before, "replays must commit nothing"


def test_netting_rule_update_pair_and_rewrite_noise(registered, tmp_path):
    """A copy-on-write update's CDF is delete+insert pairs for every row
    of the touched files (rewrite noise included). The sink's netting
    (insert orders above delete at equal commit) must apply post-images
    only — B equals A even though the raw feed carried deletes for rows
    that never logically changed."""
    spark = registered
    a_path, b_path, ckpt = (
        str(tmp_path / "a"),
        str(tmp_path / "b"),
        str(tmp_path / "ck"),
    )
    a = TxLogTable.create(
        spark,
        a_path,
        spark.createDataFrame(
            [(k, "x") for k in range(8)], "k int, s string"
        ).coalesce(1),  # ONE file: any DML rewrites every row (max noise)
    )
    a.update_where("k = 3", {"s": F.lit("upd")})
    a.delete_where("k = 5")
    _drain(spark, a_path, b_path, ckpt)
    b = TxLogTable(spark, b_path)
    assert _snap(b) == _snap(a)
    assert {r.s for r in b.read().filter("k = 3").collect()} == {"upd"}
    assert b.read().filter("k = 5").count() == 0


def test_silver_converges_with_dv_upstream(registered, tmp_path):
    """Round-9 verdict item 6: bronze takes MERGE-ON-READ DML
    (mode='dv') — no rewrite noise, just vectors. The streaming CDF
    tail must emit each DV growth as row-level deletes per trigger
    (dv_take index-delta slices), a DV update as its exact
    delete+insert pair, and a SECOND growth of the same file's vector
    as only the newly-deleted rows — silver converges at every drain."""
    spark = registered
    a_path, b_path, ckpt = (
        str(tmp_path / "a"),
        str(tmp_path / "b"),
        str(tmp_path / "ck"),
    )
    a = TxLogTable.create(
        spark,
        a_path,
        spark.createDataFrame(
            [(k, float(k)) for k in range(20)], "k int, v double"
        ).repartitionByRange(4, "k"),
    )
    _drain(spark, a_path, b_path, ckpt)
    b = TxLogTable(spark, b_path)
    assert _snap(b) == _snap(a)

    a.delete_where("k % 5 = 1", mode="dv")
    a.update_where("k % 4 = 2", {"v": F.col("v") + 100.0}, mode="dv")
    _drain(spark, a_path, b_path, ckpt)
    assert _snap(b) == _snap(a)

    # vector GROWTH on files already vectored + re-insert of a deleted
    # key across commits; the delta slices must carry only the new rows
    a.delete_where("k < 4", mode="dv")
    a.append(spark.createDataFrame([(1, -1.0)], "k int, v double"))
    _drain(spark, a_path, b_path, ckpt)
    assert _snap(b) == _snap(a)
    assert a.dvs(), "upstream must still hold live vectors (no COW fold)"
