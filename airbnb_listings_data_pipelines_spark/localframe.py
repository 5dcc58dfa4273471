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


def local_df(
    spark: SparkSession,
    rows,
    schema,
    rows_per_slice: int = 10_000,
) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` with data-sized slicing."""
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
