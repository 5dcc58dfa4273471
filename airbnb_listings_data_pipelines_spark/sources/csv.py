"""Raw-layer CSV ingestion — the Spark twin of the reference's external
tables + file format (workfile_design_data_warehouse.sql:38-44, 101-128).

Semantics reproduced:
- ``SKIP_HEADER=1`` + positional access ``value:c1..cN``  ->  read with
  header, then rename columns positionally to ``c1..cN`` (1-based).
- ``FIELD_OPTIONALLY_ENCLOSED_BY='"'``                    ->  quote/escape '"'.
- multi-token ``NULL_IF ('\\N','NULL','NUL','')``         ->  post-read pass.
- ``PATTERN = '.*listings.*[.]csv'``                      ->  pathGlobFilter.
- ``metadata$filename`` lineage                           ->  input_file_name.

Scale: Spark lists + splits files in parallel; at 100 TB the same reader
points at an object-store prefix and Catalyst prunes files by glob before
listing tasks are scheduled. Everything below is JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dialect import NULL_TOKENS, split_part


def read_positional_csv(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    with_filename: bool = True,
    null_tokens: tuple[str, ...] = NULL_TOKENS,
    n_cols: int | None = None,
) -> DataFrame:
    """Read CSV files as positional columns ``c1..cN`` (header skipped),
    every field a nullable string, multi-token NULLs applied, plus a
    ``filename`` column (basename, as SPLIT_PART(metadata$filename,'/',-1)
    — workfile_design_data_warehouse.sql:263).

    Pass ``n_cols`` when the caller knows the column count (the reference's
    external tables are fixed-width positional — design.sql:101-128): the
    read then carries an explicit all-string schema and Spark schedules NO
    header-discovery job at plan time. Omitting it keeps the
    self-describing path (one header-peek job per source).
    """
    reader = spark.read.options(header=True, quote='"', escape='"', mode="PERMISSIVE")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if n_cols is not None:
        # positional names directly; header=True still skips the first line
        reader = reader.schema(" ".join(f"c{i + 1} string," for i in range(n_cols)).rstrip(","))
    df = reader.csv(path)
    # bulk rename + bulk NULL-token replace: one driver call each instead of
    # a per-column when(isin(...)) chain (74 columns x py4j round-trips cost
    # ~2 s of plan-construction latency per source before any job ran)
    df = df.toDF(*[f"c{i + 1}" for i in range(len(df.columns))])
    df = df.na.replace(list(null_tokens), None)
    if with_filename:
        df = df.withColumn("filename", split_part(F.input_file_name(), "/", -1))
    return df


def peek_header(spark: SparkSession, path: str, glob: str | None = None) -> list[str]:
    """Header-peek probe (design.sql:49-95 ``SELECT * ... LIMIT 1``):
    discover the column names of a CSV set."""
    reader = spark.read.options(header=True, quote='"', escape='"')
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.csv(path).columns


def harmonize_by_name(frames: list[DataFrame], canonical: list[str] | None = None) -> DataFrame:
    """Cross-file schema harmonization — the notebook's column-set
    intersection + curated-column fill (workfile_preprocess.ipynb cells
    11-17): unionByName with missing columns null-filled, optionally
    projected to a canonical column list."""
    if not frames:
        raise ValueError("no frames to harmonize")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    if canonical:
        cols = [
            F.col(c) if c in out.columns else F.lit(None).cast("string").alias(c)
            for c in canonical
        ]
        out = out.select(*cols)
    return out
