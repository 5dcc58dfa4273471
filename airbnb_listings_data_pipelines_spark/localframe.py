"""Driver-local DataFrame construction without the 32-empty-slice tax.

``spark.createDataFrame(list, schema)`` parallelizes the list over
``sc.defaultParallelism`` slices (32 on local[32] — and cores x executors
on a cluster). Every slice is a pickled Python partition, so EVERY action
over the frame pays one Python-worker round-trip per slice — measured
~0.65 s per action for a 12-row frame on local[32], and a narrow
``coalesce(1)`` (single-file metadata writes: Delta checkpoints, DV
sidecars) evaluates all slices SEQUENTIALLY in one task: ~5 s per write
for 12 rows. The guide's §4 lesson (bound Python round-trips) applied to
frame construction.

:func:`local_df` parallelizes with an explicit slice count sized to the
data instead — one slice per ``rows_per_slice`` rows (default 10k,
minimum 1 slice) — so a metadata-sized frame is ONE Python partition and
a large driver-local list still parallelizes. Semantics are identical to
``createDataFrame(list, schema)``: the RDD path runs the same schema
verifier/converter, just executor-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def fan_out(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Raise a DataFrame's partition count to the cluster's parallelism
    when the upstream scan under-parallelizes — the guide §2.5 "input
    skew" remedy (one huge unsplittable file / single row group →
    repartition immediately after the read), made scale-adaptive.

    A parquet file is splittable only at row-group boundaries, so a
    single-row-group table scans as ONE task no matter how many cores
    exist; every CPU-heavy operator downstream (char shingling, SimHash,
    TF-IDF) then runs serially. This helper round-robin repartitions to
    ``defaultParallelism`` ONLY when the current partition count is
    below it — on a production table with many files/row groups the scan
    already carries >= cores partitions and this is a no-op, so no
    full-payload shuffle is ever added at scale. Call it on the
    PROJECTED frame (keys + the text column the operator needs) so the
    shuffle moves only those bytes (guide §2.3).

    Intended for scan-side frames (scan + narrow projections/filters).
    ``df.rdd`` on a post-exchange AQE plan would execute the upstream
    stages eagerly, so exchange-bearing plans are returned unchanged —
    their post-shuffle parallelism is AQE's job, and at scale AQE sizes
    those partitions fine; only leaf scans can't be re-split after the
    fact.
    """
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    # pre-AQE physical plan: pure planning, nothing executes
    if "Exchange" in df._jdf.queryExecution().sparkPlan().toString():
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def local_df(
    spark: SparkSession,
    rows,
    schema,
    rows_per_slice: int = 10_000,
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with data-sized slicing.

    Error-locality trade-off (round-13 ADVICE): the RDD path defers the
    schema verifier to executors at first action, so a malformed row
    surfaces as an executor task failure instead of the list path's
    immediate driver-side TypeError. All callers here build rows from
    their own metadata structures (not user input), so the deferred
    check is acceptable; when debugging a new call site, reproduce with
    ``spark.createDataFrame(rows, schema)`` to get the eager error.
    """
    rows = rows if isinstance(rows, list) else list(rows)
    n_slices = max(1, min(len(rows) // rows_per_slice + 1, 64))
    if not rows:
        # parallelize([]) refuses 0 partitions on some versions; one empty
        # slice keeps actions to a single worker round-trip
        return spark.createDataFrame(
            spark.sparkContext.parallelize([], 1), schema
        )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema
    )
