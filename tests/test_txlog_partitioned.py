"""Partitioned commit-log tables (operators/txlog with partition_by) —
the reference's own fact-table shape (design.sql:413 partitions
fact_listing by monthly snapshot date; SURVEY §1.4.1). Verifies the
hive-layout write, exact partition-column reconstruction (types recorded
in commit 0, never re-inferred), directory-level partition pruning in
read_where, time travel, MERGE, vacuum recursion into partition dirs,
and the change feed — all over the partitioned layout."""

from __future__ import annotations

import datetime
import glob
import os

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.txlog import (
    TxLogTable,
    merge_into_txlog,
)

D = datetime.date


def _df(spark, rows):
    # `code` is a STRING with leading zeros — the partition-type-inference
    # trap: default inference would read code=07 back as int 7
    return spark.createDataFrame(rows, "k int, v string, file_date date, code string")


@pytest.fixture()
def ptable(spark, tmp_path):
    df = _df(
        spark,
        [
            (1, "a", D(2024, 1, 1), "07"),
            (2, "b", D(2024, 1, 2), "07"),
            (3, "c", D(2024, 1, 2), "08"),
            (4, "d", D(2024, 2, 1), "07"),
        ],
    )
    return TxLogTable.create(
        spark, str(tmp_path / "pt"), df, partition_by=["file_date", "code"]
    )


def test_partitioned_layout_and_roundtrip(spark, ptable):
    # hive-style dirs on disk, relative paths in the log
    assert all("/" in f and "file_date=" in f and "code=" in f for f in ptable.files())
    got = ptable.read()
    # exact schema: partition columns keep their recorded types
    assert dict(got.dtypes)["file_date"] == "date"
    assert dict(got.dtypes)["code"] == "string"
    rows = {(r.k, r.v, r.file_date, r.code) for r in got.collect()}
    assert rows == {
        (1, "a", D(2024, 1, 1), "07"),
        (2, "b", D(2024, 1, 2), "07"),
        (3, "c", D(2024, 1, 2), "08"),
        (4, "d", D(2024, 2, 1), "07"),
    }


def test_partition_column_values_exact_not_inferred(spark, ptable):
    # "07" must come back as the string "07", not the integer 7 —
    # the recorded commit-0 types are authoritative
    codes = {r.code for r in ptable.read().select("code").distinct().collect()}
    assert codes == {"07", "08"}


def test_read_where_prunes_by_directory(spark, ptable):
    got = ptable.read_where("file_date", D(2024, 1, 1), D(2024, 1, 31))
    assert {r.k for r in got.collect()} == {1, 2, 3}
    # pruning proof: only files under matching partition dirs are scanned
    scanned = {
        os.path.relpath(p, ptable.path)
        for p in (
            r[0].replace("file:", "")
            for r in got.select(F.input_file_name()).distinct().collect()
        )
    }
    assert scanned, "expected a non-empty scan"
    assert all(f.startswith("file_date=2024-01-0") for f in scanned)
    # and on the string partition column too
    got2 = ptable.read_where("code", "08", "08")
    assert {r.k for r in got2.collect()} == {3}


def test_read_where_data_column_still_works(spark, ptable):
    got = ptable.read_where("k", 2, 3)
    assert {(r.k, r.code) for r in got.collect()} == {(2, "07"), (3, "08")}


def test_merge_time_travel_and_change_feed(spark, ptable):
    src = _df(spark, [(2, "B", D(2024, 1, 2), "07"), (5, "e", D(2024, 3, 1), "09")])
    merge_into_txlog(spark, ptable, src, keys=["k"])
    assert ptable.version() == 1
    now = {(r.k, r.v) for r in ptable.read().collect()}
    assert now == {(1, "a"), (2, "B"), (3, "c"), (4, "d"), (5, "e")}
    # time travel reconstructs the pre-merge snapshot incl. partition cols
    then = {(r.k, r.v, r.code) for r in ptable.read_version(0).collect()}
    assert then == {(1, "a", "07"), (2, "b", "07"), (3, "c", "08"), (4, "d", "07")}
    # change feed carries the partition columns
    feed = ptable.diff_versions(0, 1)
    changes = {(r.k, r.v, r.change_type) for r in feed.collect()}
    assert (5, "e", "insert") in changes and (2, "b", "delete") in changes
    assert (2, "B", "insert") in changes
    assert "file_date" in feed.columns and "code" in feed.columns


def test_vacuum_recurses_into_partition_dirs(spark, ptable):
    merge_into_txlog(
        spark, ptable, _df(spark, [(1, "A", D(2024, 1, 1), "07")]), keys=["k"]
    )
    on_disk_before = len(glob.glob(os.path.join(ptable.path, "**", "*.parquet"), recursive=True))
    deleted = ptable.vacuum(retain_versions=1)
    assert deleted, "v0 files replaced by the merge must be vacuumable"
    assert all("/" in f for f in deleted), "deletions happen inside partition dirs"
    on_disk_after = len(glob.glob(os.path.join(ptable.path, "**", "*.parquet"), recursive=True))
    assert on_disk_after == on_disk_before - len(deleted)
    # live snapshot unharmed
    assert {(r.k, r.v) for r in ptable.read().collect()} == {
        (1, "A"), (2, "b"), (3, "c"), (4, "d"),
    }


def test_optimize_preserves_partitioning(spark, ptable):
    v = ptable.optimize()
    assert v == 1
    assert all("file_date=" in f for f in ptable.files())
    assert {(r.k, r.code) for r in ptable.read().collect()} == {
        (1, "07"), (2, "07"), (3, "08"), (4, "07"),
    }


def test_null_partition_value_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x")], "k int, v string, p string"
    )
    t = TxLogTable.create(spark, str(tmp_path / "nt"), df, partition_by=["p"])
    rows = {(r.k, r.p) for r in t.read().collect()}
    assert rows == {(1, None), (2, "x")}
    # a range read_where on p never matches the null partition
    assert {r.k for r in t.read_where("p", "a", "z").collect()} == {2}


def test_unpartitioned_tables_unchanged(spark, tmp_path):
    df = _df(spark, [(1, "a", D(2024, 1, 1), "07")])
    t = TxLogTable.create(spark, str(tmp_path / "flat"), df)
    assert t.partition_meta() == ([], None)
    assert all("/" not in f for f in t.files())
    assert {r.code for r in t.read().collect()} == {"07"}


def test_convert_adopts_partitioned_hive_dir(spark, tmp_path):
    """CONVERT over an existing hive-partitioned directory: files adopted
    in place (recursively, no rewrite), partition columns recorded and
    reconstructed, merges work afterwards."""
    path = str(tmp_path / "hive")
    _df(
        spark,
        [(1, "a", D(2024, 1, 1), "07"), (2, "b", D(2024, 1, 2), "08")],
    ).write.partitionBy("file_date").parquet(path)
    before = {
        os.path.relpath(p, path)
        for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    }
    t = TxLogTable.convert(spark, path, partition_by=["file_date"])
    assert set(t.files()) == before, "no rewrite — original files referenced"
    got = t.read()
    assert dict(got.dtypes)["file_date"] == "date"
    assert {(r.k, r.file_date) for r in got.collect()} == {
        (1, D(2024, 1, 1)), (2, D(2024, 1, 2)),
    }
    merge_into_txlog(
        spark, t, _df(spark, [(3, "c", D(2024, 2, 1), "09")]), keys=["k"]
    )
    assert {r.k for r in t.read().collect()} == {1, 2, 3}
    assert {r.k for r in t.read_where("file_date", D(2024, 2, 1), D(2024, 2, 28)).collect()} == {3}


def test_convert_never_adopts_underscore_dirs(spark, tmp_path):
    """Review fix (round 6): sorted(os.walk(...)) materialized the walk
    before dirs[:] pruning, so convert descended into _delta_log/_staging
    dirs and adopted e.g. checkpoint parquets as data files."""
    path = str(tmp_path / "hive")
    _df(spark, [(1, "a", D(2024, 1, 1), "07")]).write.partitionBy(
        "file_date"
    ).parquet(path)
    # plant a parquet inside an underscore dir (a checkpoint-like file
    # whose basename does NOT start with '_' or '.')
    trap = os.path.join(path, "_delta_log")
    os.makedirs(trap)
    _df(spark, [(9, "x", D(2030, 1, 1), "99")]).coalesce(1).write.parquet(
        os.path.join(trap, "ckpt")
    )
    inner = next(
        f for f in os.listdir(os.path.join(trap, "ckpt")) if f.endswith(".parquet")
    )
    os.rename(
        os.path.join(trap, "ckpt", inner),
        os.path.join(trap, "00000000000000000001.checkpoint.parquet"),
    )
    t = TxLogTable.convert(spark, path, partition_by=["file_date"])
    assert all(not f.startswith("_") for f in t.files())
    assert {r.k for r in t.read().collect()} == {1}


def test_optimize_zorder_prunes_on_both_columns(spark, tmp_path):
    """OPTIMIZE ... ZORDER BY through the commit log: after a z-ordered
    rewrite, footer envelopes are tight on BOTH z-columns, so read_where
    skips files on either — which a single-column sort cannot give. Also
    proves the rewrite is logically a no-op and export-composable."""
    import pyspark.sql.functions as F

    from airbnb_listings_data_pipelines_spark.operators.deltalog import (
        read_delta_where,
    )

    n = 4096
    df = (
        spark.range(n)
        .select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") % 64).cast("int").alias("a"),
            F.floor(F.col("id") / 64).cast("int").alias("b"),
        )
        .repartition(16)  # scattered layout: every file spans all of a and b
    )
    t = TxLogTable.create(spark, str(tmp_path / "z"), df)
    before = {tuple(r) for r in t.read().collect()}
    v = t.optimize(target_files=8, zorder_by=["a", "b"])
    assert v == 1
    assert {tuple(r) for r in t.read().collect()} == before  # no-op logically
    total = len(t.files())
    assert total >= 4

    def kept(column, lo, hi):
        return sum(
            1
            for f, env in t.file_stats([column]).items()
            if column not in env or (env[column][0] <= hi and env[column][1] >= lo)
        )

    assert kept("a", 0, 7) < total, "z-order must prune on column a"
    assert kept("b", 0, 7) < total, "z-order must prune on column b"
    assert {r.a for r in t.read_where("a", 0, 7).collect()} == set(range(8))
    # the Delta export publishes the tightened stats; skipping composes
    t.to_delta_log()
    got = read_delta_where(spark, t.path, "b", 0, 7)
    assert {r.b for r in got.collect()} == set(range(8))


def test_optimize_zorder_refuses_partition_columns(spark, ptable):
    with pytest.raises(ValueError, match="partition columns"):
        ptable.optimize(zorder_by=["file_date"])


def test_optimize_zorder_string_prefix_quantization(spark, tmp_path):
    """Z-order on a STRING column (Delta supports it; round-8 addition):
    the first-6-byte prefix quantization clusters lexicographically-near
    values into the same files, so footer envelopes tighten and
    read_where prunes on the string column. Logical no-op as always."""
    rows = [(i, f"{chr(97 + i % 4)}-key-{i:04d}") for i in range(400)]
    t = TxLogTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame(rows, "k int, name string").repartition(4),
    )
    before = sorted(map(tuple, t.read().collect()))
    t.optimize(target_files=4, zorder_by=["name"])
    assert sorted(map(tuple, t.read().collect())) == before
    # prefix clustering: each rewritten file's (min, max) name envelope
    # must span at most 2 of the 4 leading-letter groups
    stats = t.file_stats(["name"])
    assert len(stats) == 4
    for env in stats.values():
        mn, mx = env["name"]
        assert ord(mx[0]) - ord(mn[0]) <= 1, (mn, mx)
    # and skipping works on the string column via those envelopes
    got = {r.k for r in t.read_where("name", "a", "a~").collect()}
    assert got == {i for i in range(400) if i % 4 == 0}


def test_partition_scoped_dml_discovery_never_leaves_partition(spark, ptable):
    """A DELETE/UPDATE with the partition prune hint must bound BOTH the
    touched-file discovery scan and the rewrite to the hinted partition's
    files — directory-name pruning, zero reads of other partitions (the
    x72 contract). Spied at the _scan_with_filepath seam: every candidate
    list the discovery scan receives stays inside the partition dir."""
    scanned_lists = []
    orig = ptable._scan_with_filepath

    def spy(files, schema_json, **kw):
        scanned_lists.append(list(files))
        return orig(files, schema_json, **kw)

    ptable._scan_with_filepath = spy
    before = set(ptable.files())
    ptable.delete_where(
        (F.col("file_date") == D(2024, 1, 2)) & (F.col("v") == "b"),
        prune=("file_date", D(2024, 1, 2), D(2024, 1, 2)),
    )
    assert scanned_lists, "discovery scan ran"
    for files in scanned_lists:
        assert files and all(f.startswith("file_date=2024-01-02/") for f in files)
    after = set(ptable.files())
    # untouched partitions carry over by NAME (no rewrite, no read)
    outside = {f for f in before if not f.startswith("file_date=2024-01-02/")}
    assert outside <= after
    # the touched file held ONLY the deleted row, so the rewrite adds
    # nothing — pure file retirement, the cheapest possible delete
    assert after < before
    assert all(f.startswith("file_date=2024-01-02/") for f in after - before)
    got = {(r.k, r.v) for r in ptable.read().collect()}
    assert got == {(1, "a"), (3, "c"), (4, "d")}

    # same contract for UPDATE
    scanned_lists.clear()
    ptable._scan_with_filepath = spy  # re-arm on the new snapshot
    ptable.update_where(
        (F.col("file_date") == D(2024, 2, 1)) & (F.col("k") == 4),
        {"v": F.lit("D")},
        prune=("file_date", D(2024, 2, 1), D(2024, 2, 1)),
    )
    for files in scanned_lists:
        assert files and all(f.startswith("file_date=2024-02-01/") for f in files)
    assert {(r.k, r.v) for r in ptable.read().collect()} == {
        (1, "a"), (3, "c"), (4, "D"),
    }
