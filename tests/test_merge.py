from __future__ import annotations

import os

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.merge import merge_into_parquet


def _write_target(spark, path, rows):
    spark.createDataFrame(rows, ["k", "v", "p"]).write.mode("overwrite").parquet(path)


def test_merge_update_and_insert(spark, tmp_path):
    path = str(tmp_path / "tgt")
    _write_target(spark, path, [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")])
    src = spark.createDataFrame([(2, "B", "x"), (4, "d", "y")], ["k", "v", "p"])
    out = merge_into_parquet(spark, path, src, keys=["k"])
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # idempotent: merging the same source again changes nothing
    again = merge_into_parquet(spark, path, src, keys=["k"])
    assert {r.k: r.v for r in again.collect()} == got


def test_merge_delete_and_ignore(spark, tmp_path):
    path = str(tmp_path / "tgt")
    _write_target(spark, path, [(1, "a", "x"), (2, "b", "x")])
    src = spark.createDataFrame([(2, "ZZ", "x"), (9, "new", "x")], ["k", "v", "p"])
    out = merge_into_parquet(
        spark, path, src, keys=["k"], when_matched="delete", when_not_matched="ignore"
    )
    assert {r.k: r.v for r in out.collect()} == {1: "a"}


def test_merge_partition_scoped_rewrites_only_touched(spark, tmp_path):
    path = str(tmp_path / "tgt")
    spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")], ["k", "v", "p"]
    ).write.partitionBy("p").mode("overwrite").parquet(path)
    before = set(os.listdir(os.path.join(path, "p=y")))
    src = spark.createDataFrame([(1, "A", "x"), (5, "e", "x")], ["k", "v", "p"])
    out = merge_into_parquet(
        spark, path, src, keys=["k", "p"], partition_col="p"
    )
    got = {r.k: (r.v, r.p) for r in out.collect()}
    assert got == {1: ("A", "x"), 2: ("b", "x"), 3: ("c", "y"), 5: ("e", "x")}
    # untouched partition p=y kept its physical files (not rewritten)
    assert set(os.listdir(os.path.join(path, "p=y"))) == before


def test_merge_staged_swap_preserves_target_on_schema_error(spark, tmp_path):
    path = str(tmp_path / "tgt")
    _write_target(spark, path, [(1, "a", "x")])
    bad = spark.createDataFrame([(1, "zz")], ["k", "other"])
    try:
        merge_into_parquet(spark, path, bad, keys=["k"])
        raise AssertionError("expected schema mismatch")
    except AssertionError as e:
        if "schema" not in str(e):
            raise
    assert {r.k: r.v for r in spark.read.parquet(path).collect()} == {1: "a"}


def test_schema_evolution_new_source_column(spark):
    """Delta autoMerge semantics: a column NEW in the source appears in the
    output; untouched target rows carry NULL, updated/inserted rows get the
    source value."""
    from airbnb_listings_data_pipelines_spark.operators.merge import merge_frames

    target = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    source = spark.createDataFrame([(2, "b2", 9.5), (3, "c", 7.0)], "k int, v string, score double")
    out = merge_frames(target, source, ["k"], evolve_schema=True)
    rows = {r.k: (r.v, r.score) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b2", 9.5), 3: ("c", 7.0)}
    assert out.columns == ["k", "v", "score"]


def test_schema_evolution_missing_source_column_keeps_target(spark):
    """A column the source LACKS keeps its target value on update (update
    sets only provided columns) and is NULL on insert."""
    from airbnb_listings_data_pipelines_spark.operators.merge import merge_frames

    target = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "k int, v string, extra int")
    source = spark.createDataFrame([(2, "b2"), (3, "c")], "k int, v string")
    out = merge_frames(target, source, ["k"], evolve_schema=True)
    rows = {r.k: (r.v, r.extra) for r in out.collect()}
    assert rows == {1: ("a", 10), 2: ("b2", 20), 3: ("c", None)}


def test_schema_evolution_through_txlog_backend(spark, tmp_path):
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        TxLogTable,
        merge_into_txlog,
    )

    t = TxLogTable.create(
        spark, str(tmp_path / "evo"), spark.createDataFrame([(1, "a")], "k int, v string")
    )
    source = spark.createDataFrame([(1, "a2", 5), (2, "b", 6)], "k int, v string, n int")
    out = merge_into_txlog(spark, t, source, keys=["k"], evolve_schema=True)
    assert {(r.k, r.v, r.n) for r in out.collect()} == {(1, "a2", 5), (2, "b", 6)}
    # pre-evolution snapshot still readable with the OLD schema (time travel)
    assert t.read_version(0).columns == ["k", "v"]


def test_mismatched_schema_still_rejected_without_evolution(spark):
    from airbnb_listings_data_pipelines_spark.operators.merge import merge_frames

    target = spark.createDataFrame([(1, "a")], "k int, v string")
    source = spark.createDataFrame([(1, "a", 1)], "k int, v string, extra int")
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        merge_frames(target, source, ["k"])
