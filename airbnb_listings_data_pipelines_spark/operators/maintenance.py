"""Table-maintenance operators: small-file compaction and Z-order
clustering — the storage-layout levers that keep a 100 TB parquet lake
scannable (public analogs: Delta OPTIMIZE / OPTIMIZE ZORDER BY, Iceberg
rewrite_data_files).

Why they matter at scale:

- **Compaction**: streaming sinks and partition-scoped merges accrete
  many small files; each file costs a task + open + footer parse, and
  the 100 TB failure mode is a scan dominated by scheduling overhead
  rather than IO. Compaction rewrites a directory into ~target-size
  files (one job, no shuffle beyond the repartition).
- **Z-order**: multi-dimensional data skipping. Parquet prunes row
  groups by min/max stats; a sort on one column gives skipping on that
  column only. Interleaving the bits of several key columns (a Z-curve /
  Morton code) and sorting by the interleaved value gives each file a
  tight min/max envelope on EVERY participating column, so predicates on
  any of them prune files (Morton 1966 — public).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_within_partitions: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_mb`` files.

    File count is derived from the CURRENT on-disk bytes (Hadoop
    listing via the JVM — no data read), so compaction is proportional
    to the data, not guesswork. Returns the new file count.

    Crash-safety scope (narrower than operators/merge, stated honestly):
    the rewrite lands in a staging dir, then swaps in TWO renames
    (path -> backup, staging -> path) through the same Hadoop FileSystem
    used for sizing — so it runs against HDFS/object stores, not just
    local disk. Readers never observe a HALF-WRITTEN directory, but
    between the two renames the path briefly does not exist, and a crash
    in that window leaves the data at ``path + '.__old__'`` needing a
    manual rename back. Directory-swap atomicity is exactly what the
    open-table formats add (Delta/Iceberg metadata commit); see
    operators/merge for that discussion.

    At 100 TB this runs per-partition (compact the partitions a
    streaming sink touched today, not the table) — callers pass the
    partition directory as ``path``.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    if sort_within_partitions:
        # range-partition on the sort key so each FILE covers a disjoint
        # key range (tight file-level min/max envelopes -> file skipping);
        # a round-robin repartition + local sort would only tighten
        # row-group stats inside files that still span the whole domain
        out = df.repartitionByRange(n_files, *sort_within_partitions).sortWithinPartitions(
            *sort_within_partitions
        )
    else:
        # always a round-robin repartition: the whole directory is being
        # rewritten anyway, and repartition balances bytes across the
        # target files where coalesce would merely glue scan partitions
        # together (skewed output files). This also avoids the
        # df.rdd.getNumPartitions() probe the branch needed, which
        # instantiated the deserialized-row RDD plan just to read a count.
        out = df.repartition(n_files)

    staging = path.rstrip("/") + ".__compact__"
    out.write.mode("overwrite").parquet(staging)
    backup_p = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".__old__")
    staging_p = jvm.org.apache.hadoop.fs.Path(staging)
    if not fs.rename(hpath, backup_p):
        raise OSError(f"compact_parquet_dir: rename {path} -> {backup_p} failed")
    if not fs.rename(staging_p, hpath):
        fs.rename(backup_p, hpath)  # roll back; original data untouched
        raise OSError(f"compact_parquet_dir: rename {staging} -> {path} failed")
    fs.delete(backup_p, True)
    return n_files


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-curve) interleave of non-negative integer columns: bit j
    of column i lands at position ``j * len(cols) + i``. Pure built-ins
    (shiftright / bitwise AND / shiftleft folded into one expression), so
    it runs inside whole-stage codegen — no UDF. ``bits`` per column;
    len(cols) * bits must stay < 63.

    Columns must already be scaled to [0, 2^bits): callers quantize
    (e.g. rank or truncate) before interleaving.
    """
    n = len(cols)
    assert n * bits < 63, "interleaved value must fit a signed 64-bit long"
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * n + i)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write parquet clustered along a Z-curve over ``zorder_cols``.

    ``repartitionByRange`` on the z-value assigns contiguous curve
    segments to files (range partitioning samples the distribution — no
    driver collect), and the within-file sort tightens row-group min/max
    stats. Result: a predicate on ANY z-ordered column prunes most
    files, which a single-column sort cannot do (verified against a
    linear layout in tests/test_maintenance.py using parquet footer
    min/max envelopes).
    """
    cols = [F.col(c) for c in zorder_cols]
    z = zvalue(cols, bits=bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
