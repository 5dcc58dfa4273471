"""Skew-handling operators.

Hot keys (the reference's 'SYDNEY'-ish suburb keys — SURVEY §4.2) overload
single reducers at scale. Two mitigations live here; AQE's runtime skew-join
splitting (enabled in session.py) covers the join side.

- ``salted_agg``: two-phase aggregation — add a random-free deterministic
  salt (hash of a high-cardinality column mod N), partial-aggregate on
  (key, salt), then final-aggregate on key. The first shuffle spreads a hot
  key over N reducers; the second touches only |keys| x N rows.
  Works for any algebraic aggregate (sum/count/min/max).
- ``salted_count_distinct``: exact distinct count via two shuffles with the
  *distinct value* folded into the first-phase key, so no reducer ever holds
  a hot key's full value set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: Sequence[str], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    group_keys: list[str],
    salt_source: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    ``aggs``: output_name -> (function, column) with function in
    {sum, count, min, max}. Results are exactly equal to a direct
    ``groupBy(group_keys).agg(...)`` — only the shuffle shape changes.
    """
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    second = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial = (
        df.withColumn("__salt", _salt(salt_source, buckets))
        .groupBy(*group_keys, "__salt")
        .agg(*[first[fn](col).alias(name) for name, (fn, col) in aggs.items()])
    )
    return partial.groupBy(*group_keys).agg(
        *[second[fn](name).alias(name) for name, (fn, _col) in aggs.items()]
    )


def salted_count_distinct(
    df: DataFrame, group_keys: list[str], distinct_col: str, out_name: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per group without a hot-key
    reducer: dedupe on (keys, value) first (shuffle spread by value), then
    count per key."""
    return (
        df.select(*group_keys, distinct_col)
        .distinct()
        .groupBy(*group_keys)
        .agg(F.count(F.lit(1)).alias(out_name))
    )
