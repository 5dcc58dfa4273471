"""Slowly-changing-dimension operators.

The reference answers its brief's "be careful of SCDs" with an
accumulating-snapshot fact — one full row per (id, monthly file)
(workfile_design_data_warehouse.sql:413; report p5; SURVEY §1.4(1)). These
operators complete the story:

- ``scd2_from_snapshots``: collapse a snapshot series into true SCD-2
  history — one row per (key, version) with valid_from/valid_to/is_current,
  consecutive identical snapshots merged. Pure window functions: one
  shuffle on key, no state.
- ``scd2_upsert``: maintain an SCD-2 dimension incrementally — close
  changed current rows and append new versions (the parquet-native MERGE
  substitute; at scale, write partitioned by is_current so the hot
  'current' partition stays small).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _change_flag(attrs: list[str], w: Window) -> Column:
    """1 when any attribute differs from the previous snapshot (the first
    snapshot per key always flags: lag is NULL, eqNullSafe False)."""
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    return F.when(changed, 1).otherwise(0)


def scd2_from_snapshots(
    snapshots: DataFrame,
    key_cols: list[str],
    snapshot_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Snapshot series -> SCD-2 history.

    Output: key_cols + attr_cols + (valid_from, valid_to, is_current);
    valid_to is the next version's valid_from (NULL for current rows);
    runs of identical consecutive snapshots collapse into one version.
    """
    w = Window.partitionBy(*key_cols).orderBy(snapshot_col)
    flagged = snapshots.withColumn("__chg", _change_flag(attr_cols, w))
    versioned = flagged.withColumn(
        "__ver", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    versions = versioned.groupBy(*key_cols, "__ver", *attr_cols).agg(
        F.min(snapshot_col).alias("valid_from")
    )
    w2 = Window.partitionBy(*key_cols).orderBy("valid_from")
    return (
        versions.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__ver")
    )


def scd2_upsert(
    current_dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_col: str = "valid_from",
) -> DataFrame:
    """Apply a batch of updates (key_cols + attr_cols + effective_col) to an
    SCD-2 dimension (schema as produced by scd2_from_snapshots):

    - unchanged keys pass through,
    - changed keys: the current row closes (valid_to = update's effective
      date, is_current false) and a new current version is appended,
    - brand-new keys are inserted as current.
    """
    cur = current_dim.filter(F.col("is_current"))
    hist = current_dim.filter(~F.col("is_current"))

    u = updates.select(
        *key_cols, *attr_cols, F.col(effective_col).alias("__eff")
    ).alias("u")
    c = cur.alias("c")
    on = None
    for k in key_cols:
        e = F.col(f"c.{k}") == F.col(f"u.{k}")
        on = e if on is None else (on & e)

    changed_cond = F.lit(False)
    for a in attr_cols:
        changed_cond = changed_cond | ~F.col(f"c.{a}").eqNullSafe(F.col(f"u.{a}"))

    joined = c.join(u, on, "full")
    untouched = joined.filter(F.col(f"u.{key_cols[0]}").isNull()).select("c.*")
    unchanged = joined.filter(
        F.col(f"c.{key_cols[0]}").isNotNull()
        & F.col(f"u.{key_cols[0]}").isNotNull()
        & ~changed_cond
    ).select("c.*")
    closed = (
        joined.filter(
            F.col(f"c.{key_cols[0]}").isNotNull()
            & F.col(f"u.{key_cols[0]}").isNotNull()
            & changed_cond
        )
        .select(
            *[F.col(f"c.{k}").alias(k) for k in key_cols],
            *[F.col(f"c.{a}").alias(a) for a in attr_cols],
            F.col("c.valid_from").alias("valid_from"),
            F.col("u.__eff").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    fresh = (
        joined.filter(
            F.col(f"u.{key_cols[0]}").isNotNull()
            & (F.col(f"c.{key_cols[0]}").isNull() | changed_cond)
        )
        .select(
            *[F.col(f"u.{k}").alias(k) for k in key_cols],
            *[F.col(f"u.{a}").alias(a) for a in attr_cols],
            F.col("u.__eff").alias("valid_from"),
            F.lit(None).cast(dict(current_dim.dtypes)["valid_to"]).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return hist.unionByName(untouched).unionByName(unchanged).unionByName(closed).unionByName(fresh)
