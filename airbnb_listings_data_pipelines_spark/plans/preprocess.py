"""Preprocessing entry point — the Spark twin of the reference's pandas
notebook (workfile_preprocess.ipynb, SURVEY §3 entry point 1):

    glob files -> per-file schema inspection -> column-set intersection
    -> + curated late-added columns -> canonical 74-col ordering
    -> per-file aligned output (missing columns null-filled)

The notebook materialized *_new.csv per month; here the harmonized result is
one lazy DataFrame (unionByName) that the raw layer consumes directly —
at scale this is a map-only plan over every file with no driver-side
per-file loop.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the 7 columns present only in later monthly dumps, re-added after the
# intersection (workfile_preprocess.ipynb cell 13)
CURATED_LATE_COLUMNS = [
    "bathrooms_text",
    "bedrooms",
    "beds",
    "amenities",
    "minimum_nights",
    "maximum_nights",
    "number_of_reviews_l30d",
]


def inspect_schemas(spark: SparkSession, paths: list[str]) -> dict[str, list[str]]:
    """Per-file header inspection (nb cell 8: shape/dtype eyeballing)."""
    return {
        p: spark.read.options(header=True, quote='"', escape='"').csv(p).columns
        for p in paths
    }


def canonical_columns(per_file: dict[str, list[str]], curated: list[str] | None = None) -> list[str]:
    """Intersection of all files' column sets (nb cell 11) plus the curated
    late-added columns (nb cell 13), ordered by the first file's layout."""
    curated = CURATED_LATE_COLUMNS if curated is None else curated
    sets = [set(cols) for cols in per_file.values()]
    common = reduce(set.intersection, sets)
    first = next(iter(per_file.values()))
    ordered = [c for c in first if c in common]
    ordered += [c for c in curated if c not in ordered]
    return ordered


def harmonize_files(
    spark: SparkSession, paths: list[str], canonical: list[str] | None = None
) -> DataFrame:
    """Read every monthly file, align to the canonical column list (missing
    -> NULL, extras dropped, order fixed — nb cell 17), tag each row with
    its source file."""
    per_file = inspect_schemas(spark, paths)
    cols = canonical or canonical_columns(per_file)
    frames = []
    for p in paths:
        df = spark.read.options(header=True, quote='"', escape='"').csv(p)
        have = set(df.columns)
        frames.append(
            df.select(
                *[
                    F.col(f"`{c}`").cast("string").alias(c)
                    if c in have
                    else F.lit(None).cast("string").alias(c)
                    for c in cols
                ]
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.withColumn(
        "filename", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
