"""Time-series join operators Spark lacks as built-ins, composed from
DataFrame primitives so Catalyst keeps optimizing them.

- ``as_of_join``: per left row, the most recent right row at-or-before its
  timestamp (same key) — merge-asof. Implemented as union + carried-forward
  window (ONE shuffle on the key, no inequality join, no range explosion):
  tag both sides, sort by (ts, right-first, seq), and let
  ``last(ignorenulls=True)`` carry each right row's payload forward to the
  left rows that follow it. At 100 TB this is a single hash shuffle +
  per-partition sort — the same cost as any windowed aggregate, vs the
  quadratic per-key blowup of the naive ``l.ts >= r.ts`` theta join.
- ``range_join_binned``: equi-key + time-range join executed as an
  equi-join on (key, time_bin) with the right side exploded into covering
  bins, then the exact predicate applied to candidates only. Turns
  Spark's nested-loop inequality join into a shuffle join whose extra cost
  is the bin fan-out (range/bin_width + 1 copies), the standard interval-
  join strategy in streaming/OLAP engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    seq_col: str,
) -> DataFrame:
    """Most-recent-at-or-before join (merge-asof).

    Ties on the timestamp are broken by ``seq_col`` (highest wins), making
    the result total-order deterministic — required for cross-engine
    verification. Left columns are preserved; each payload column arrives
    as ``asof_<name>`` (NULL when no right row precedes the left row).
    """
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.col(seq_col).alias("__rseq"),
        F.lit(0).alias("__side"),  # right sorts before left at equal ts (<= semantics)
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    l_cols = left.columns
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.col(seq_col).alias("__rseq"),
        F.lit(1).alias("__side"),
    )
    for c in [f"__p_{p}" for p in payload_cols]:
        l = l.withColumn(c, F.lit(None))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side", "__rseq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in payload_cols
    ]
    return (
        u.select("*", *carried)
        .filter(F.col("__side") == 1)
        .select(*l_cols, *[f"asof_{c}" for c in payload_cols])
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    bin_width: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with the same key and
    ``left_ts + lower <= right_ts <= left_ts + upper`` (integer time units).

    The right side is exploded into every bin its timestamp could match
    from (ceil(range/bin) + 1 copies); the join is then a plain equi-join
    on (key, bin) and the exact range predicate filters candidates. Choose
    ``bin_width`` ~ (upper - lower): one extra copy per row, candidates
    within a ~2x window of the true range.
    """
    bin_width = bin_width or max(upper - lower, 1)
    n_bins = (upper - lower) // bin_width + 1
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("__lts"),
        (F.floor((F.col(left_ts) + lower) / bin_width)).alias("__bin"),
        *[F.col(c) for c in left.columns if c not in (key, left_ts)],
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__rts"),
        F.explode(
            F.sequence(
                F.floor(F.col(right_ts) / bin_width) - n_bins,
                F.floor(F.col(right_ts) / bin_width),
            )
        ).alias("__bin"),
        *[F.col(c) for c in right.columns if c not in (key, right_ts)],
    )
    return (
        l.join(r, [key, "__bin"])
        .filter(
            (F.col("__rts") >= F.col("__lts") + lower)
            & (F.col("__rts") <= F.col("__lts") + upper)
        )
        .drop("__bin")
    )
