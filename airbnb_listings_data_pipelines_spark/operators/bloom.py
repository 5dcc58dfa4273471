"""Mergeable Bloom filter as a RELATION — the distributed membership
structure behind CCNet/Dolma-style "have we seen this paragraph before"
checks at corpus scale.

A Bloom filter over keys is represented as rows ``(word, bits)``: bit
position p lives in word ``p div 63`` at bit ``p mod 63`` (63 bits per
word keeps every mask a positive int64, identical in Spark and DuckDB —
bit 63 would need unsigned semantics). Building is one hash aggregate
with ``bit_or`` (map-side partial combine: each partition ORs its own
words, the shuffle merges word-sized partials — the Bloom OR-merge *is*
the aggregate's combine step, which is what makes the structure
mergeable for free). Probing is an equi-join on ``word`` plus a bit
test; a key is "maybe present" iff ALL ``k`` of its probe bits are set.

No false negatives ever (set bits are never cleared); false positives
at the standard (1 - e^{-kn/m})^k rate — callers verify against an
exact semi-join where the build side still fits one (the x58 oracle
does), and trust the filter alone when it doesn't.

Hashing is ``md5_hash32(key || '#' || i)`` so DuckDB reproduces every
bit position exactly (at-scale swap: xxhash64(key, i)).

Scale shape: the filter relation has at most m/63 rows (a 2^20-bit
filter = 16,644 rows) regardless of corpus size — broadcastable — while
the build is a single pass over keys. Sizing: m ~ 10 bits/key gives
~1% fp at k=3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash32


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(md5_hash32(F.concat(key, F.lit(f"#{i}"))), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame, key_col: str = "key", m_bits: int = 65536, k: int = 3
) -> DataFrame:
    """Build the filter relation ``(word, bits)`` from a key column."""
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("p")
    )
    return (
        pos.select(
            F.expr("p div 63").alias("word"),
            F.expr("shiftleft(1L, CAST(p % 63 AS INT))").alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    row_cols: list[str],
    m_bits: int = 65536,
    k: int = 3,
) -> DataFrame:
    """Append ``maybe_present`` (1/0) per input row: 1 iff every probe bit
    of ``key_col`` is set in ``bloom``. ``row_cols`` must identify rows
    uniquely (they key the all-bits-set regroup). The filter side is
    broadcast (bounded by m/63 rows)."""
    probes = df.select(
        *row_cols,
        F.posexplode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("i", "p"),
    ).select(
        *row_cols,
        "i",
        F.expr("p div 63").alias("word"),
        F.expr("CAST(p % 63 AS INT)").alias("b"),
    )
    hit = probes.join(F.broadcast(bloom), "word", "left").select(
        *row_cols,
        F.coalesce(
            F.expr("(shiftright(bits, b) & 1L)"), F.lit(0)
        ).alias("hit"),
    )
    return hit.groupBy(*row_cols).agg(
        F.min("hit").cast("long").alias("maybe_present")
    )
