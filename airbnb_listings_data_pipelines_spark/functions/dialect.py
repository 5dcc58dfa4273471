"""Dialect shims — the only places where the reference's Snowflake SQL and
Spark differ enough to need a wrapper (SURVEY.md §7 phase 1).

Everything here compiles to built-in Catalyst expressions (JVM-side,
whole-stage-codegen) — no Python UDFs.

Reference parity notes (cited file:line refer to /root/reference):
- ``split_part`` incl. negative index — workfile_design_data_warehouse.sql:142,
  172-173, 228, 263, 451-455.
- multi-token NULLs ``('\\N','NULL','NUL','')`` —
  workfile_design_data_warehouse.sql:42.
- QUALIFY row_number idiom — workfile_design_data_warehouse.sql:181, 265-266.
- decimal KPI casts — workfile_populate_data_warehouse.py:527-544.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NULL_TOKENS = ("\\N", "NULL", "NUL", "")


def half_up_long(col: Column | str) -> Column:
    """HALF_UP round of a double to BIGINT via ``floor`` (a JVM
    intrinsic) — ~2x cheaper per row than ``F.round(col, 0)``, which
    routes every double through ``BigDecimal.valueOf`` + ``setScale``
    (an allocation and a decimal string conversion per value).

    CONTRACT (narrower than round(), per the round-13 advisor): matches
    ``F.round(col, 0).cast("long")`` only when |x| < 2**52 AND the
    fractional part of x is bounded away from .5 by more than one ulp.
    Known divergences: doubles one ulp below .5 (0.49999999999999994 ->
    1 here vs 0 from round(), mirrored for negatives) because the +0.5
    addition rounds up to exactly 0.5; odd integer doubles >= 2**52
    (4503599627370497.0 -> ...98) because +0.5 is no longer exact there.

    Safe for the money/cents call sites (2-decimal values * 100 — the
    fractional part is ~0 or ~.5 exactly, never a half-ulp neighbor) and
    verified bit-exact against round() on every such column of all three
    test SFs (tests/test_dialect.py keeps a lineage-keyed parity sweep).
    Do NOT use it on arbitrary reals (sqrt/ln outputs) — keep F.round()
    there. NULL propagates through the otherwise-branch; non-finite
    inputs are out of contract for money columns.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c >= 0, F.floor(c + F.lit(0.5))).otherwise(
        -F.floor(F.lit(0.5) - c)
    )


def split_part(col: Column | str, delim: str, n: int) -> Column:
    """Snowflake ``SPLIT_PART(s, delim, n)`` with negative-index support.

    Spark >= 3.5 ships ``F.split_part`` with the same contract (literal
    delimiter, 1-based index, negative counts from the end, missing part
    -> '').  Kept as a wrapper so the call sites read like the reference.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split_part(c, F.lit(delim), F.lit(n))


def multi_replace(col: Column | str, pairs: Sequence[tuple[str, str]]) -> Column:
    """Nested ``REPLACE(REPLACE(...))`` chain, applied left-to-right
    (workfile_design_data_warehouse.sql:452-453 nests four deep)."""
    c = F.col(col) if isinstance(col, str) else col
    for src, dst in pairs:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def nullify_tokens(col: Column | str, tokens: Iterable[str] = NULL_TOKENS) -> Column:
    """Replicate Snowflake's multi-token ``NULL_IF`` CSV option
    (workfile_design_data_warehouse.sql:42) as a post-read pass."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(*tokens), F.lit(None)).otherwise(c)


def try_decimal(col: Column | str, precision: int = 10, scale: int = 2) -> Column:
    """``TRY_CAST(x AS NUMERIC)`` — null on malformed input, never error.

    Load-bearing quirk (SURVEY.md §2.10(2)): comma-formatted prices like
    ``'1,234.00'`` must produce NULL, exactly as the reference's
    workfile_design_data_warehouse.sql:228 does.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(f"decimal({precision},{scale})")


def dec(col: Column, precision: int = 10, scale: int = 2) -> Column:
    """`(expr)::DECIMAL(10,2)` KPI rounding cast (HALF_UP in both engines)."""
    return col.cast(f"decimal({precision},{scale})")


def pct(num: Column, den: Column, precision: int = 10, scale: int = 2) -> Column:
    """``(100 * num / den)::DECIMAL`` rate pattern
    (workfile_populate_data_warehouse.py:527, 536, 540-544)."""
    return dec(F.lit(100) * num / den, precision, scale)


def top1_per_group(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column],
    keep_ties: bool = False,
) -> DataFrame:
    """The reference's ``QUALIFY ROW_NUMBER()/RANK() OVER (...) = 1`` idiom
    (no QUALIFY in Spark SQL): window + filter + drop.

    ``keep_ties=True`` uses RANK so tied rows all survive — required by
    adhoc query b (workfile_ad-hoc_analysis.sql:77; report p8-10 shows the
    tied rows in the golden output).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = F.rank() if keep_ties else F.row_number()
    return df.withColumn("__rn", fn.over(w)).filter(F.col("__rn") == 1).drop("__rn")
