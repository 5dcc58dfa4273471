from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.maintenance import (
    compact_parquet_dir,
    write_zordered,
    zvalue,
)


def _file_envelopes(path: str, col: str) -> list[tuple[int, int]]:
    """Per-file (min, max) of a column from parquet footers — the stats a
    scan uses for file/row-group skipping."""
    envs = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        envs.append((min(mins), max(maxs)))
    return envs


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], ["x", "y"])
    z = df.select(zvalue([F.col("x"), F.col("y")], bits=3).alias("z")).collect()[0].z
    # x bits at even positions, y bits at odd: x=101, y=011
    # -> z = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 0b011011
    assert z == 0b011011


def test_zorder_prunes_on_second_column(spark, tmp_path):
    n, files = 20_000, 8
    df = (
        spark.range(n)
        .select(
            (F.xxhash64("id") % 256).alias("x"),
            (F.xxhash64("id", F.lit(1)) % 256).alias("y"),
        )
        .select(F.abs("x").alias("x"), F.abs("y").alias("y"))
    )
    linear = str(tmp_path / "linear")
    zordered = str(tmp_path / "zorder")
    # linear layout: range-partitioned + sorted on x only
    df.repartitionByRange(files, "x").sortWithinPartitions("x").write.parquet(linear)
    write_zordered(df, zordered, ["x", "y"], num_files=files, bits=8)

    def files_hit(path: str, lo: int, hi: int) -> int:
        return sum(1 for mn, mx in _file_envelopes(path, "y") if mn <= hi and mx >= lo)

    # a predicate on y prunes nothing in the x-sorted layout ...
    assert files_hit(linear, 10, 20) == files
    # ... but skips most files in the z-ordered layout
    assert files_hit(zordered, 10, 20) <= files // 2
    # and the data is unchanged
    assert (
        spark.read.parquet(zordered).agg(F.sum("x"), F.sum("y")).collect()
        == df.agg(F.sum("x"), F.sum("y")).collect()
    )


def test_compact_parquet_dir(spark, tmp_path):
    path = str(tmp_path / "many")
    df = spark.range(10_000).select("id", (F.col("id") % 7).alias("k"))
    df.repartition(64).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 64

    n_files = compact_parquet_dir(spark, path, target_file_mb=128)
    got = glob.glob(f"{path}/*.parquet")
    assert len(got) == n_files < 64
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).collect() == df.agg(F.sum("id")).collect()


def test_compact_sorted_tightens_envelopes(spark, tmp_path):
    path = str(tmp_path / "sorted")
    spark.range(400_000).select(
        (F.col("id") % 1000).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),  # defeat dictionary encoding
    ).repartition(16).write.parquet(path)
    compact_parquet_dir(spark, path, target_file_mb=1, sort_within_partitions=["k"])
    envs = _file_envelopes(path, "k")
    assert len(envs) > 1
    # range-partitioned compaction: each file covers a narrow key range
    assert all(mx - mn < 600 for mn, mx in envs)
    assert spark.read.parquet(path).count() == 400_000
