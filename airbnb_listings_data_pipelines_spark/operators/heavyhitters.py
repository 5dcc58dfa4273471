"""Misra-Gries heavy-hitters sketch — the mergeable frequent-items summary
(Misra & Gries 1982; merge rule and error bound from Agarwal, Cormode,
Huang, Phillips, Wei, Yi 2012, "Mergeable Summaries", PODS — both public).

Why this exists next to exact token counts (x12's top-tokens): at 100 TB
an exact per-token count is a corpus-wide shuffle whose key cardinality is
the full vocabulary. The MG sketch caps per-partition state at ``m``
counters, ships ``m`` rows per partition to the merge, and still
guarantees every token's count is underestimated by at most N/(m+1) —
with every item whose true frequency exceeds N/(m+1) guaranteed present.
That is the same partial-aggregate discipline as the HLL rollup
(queries/sketches.py): bounded state, one narrow merge, provable error.

Execution shape:

- ``misra_gries_partial``: one ``mapInPandas`` pass (Arrow-batched, never
  per-row Python) maintaining the m-counter MG state across the
  partition's batches; emits <= m (token, cnt) rows per partition. No
  shuffle.
- ``misra_gries_merge``: keyed sum of the partials (<= m x P rows — a
  trivially small aggregate), then the paper's reduce: subtract the
  (m+1)-th largest summed counter from all and drop non-positives,
  restoring the m-counter invariant while keeping total error <= N/(m+1).
  The (m+1)-th value is a 1-row broadcast scalar (SURVEY J9 idiom).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PARTIAL_SCHEMA = "token string, cnt long"
# ASCII whitespace, matching operators/text.tokens()'s Java \s+ split on
# the ASCII corpora this engine tokenizes (documented divergence: Python
# \s would also split on unicode spaces).
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _mg_update(counters: dict[str, int], token: str, m: int) -> None:
    if token in counters:
        counters[token] += 1
    elif len(counters) < m:
        counters[token] = 1
    else:
        # decrement-all: the O(1)-amortized implementation deletes zeros
        dead = []
        for k in counters:
            counters[k] -= 1
            if counters[k] == 0:
                dead.append(k)
        for k in dead:
            del counters[k]


def misra_gries_partial(df: DataFrame, text_col: str = "text", m: int = 64) -> DataFrame:
    """Per-partition MG summaries over the whitespace tokens of ``text_col``:
    at most ``m`` (token, cnt) rows per partition, one streaming pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for s in pdf[text_col]:
                if s is None:
                    continue
                s = s.strip().lower()
                if not s:
                    continue
                for tok in _WS.split(s):
                    _mg_update(counters, tok, m)
        yield pd.DataFrame(
            {"token": list(counters.keys()), "cnt": list(counters.values())}
        )

    return df.select(text_col).mapInPandas(run, schema=_PARTIAL_SCHEMA)


def misra_gries_merge(partials: DataFrame, m: int = 64) -> DataFrame:
    """Agarwal et al.'s MERGE of MG summaries: keyed sum, then subtract the
    (m+1)-th largest summed counter and drop non-positive results. The
    output is again a valid m-counter MG summary of the concatenated
    streams, with underestimation error <= N/(m+1) overall."""
    summed = partials.groupBy("token").agg(F.sum("cnt").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), "token")
    ranked = summed.withColumn("__rn", F.row_number().over(w))
    # 0-or-1-row scalar frame; joined on a literal key so it applies to
    # every row and is NULL when there is no (m+1)-th counter (summed
    # table already fits in m -> subtract nothing).
    kth = (
        ranked.filter(F.col("__rn") == m + 1)
        .select(F.col("cnt").alias("__kth"))
        .withColumn("__k", F.lit(1))
    )
    return (
        ranked.withColumn("__k", F.lit(1))
        .join(F.broadcast(kth), "__k", "left")
        .select("token", (F.col("cnt") - F.coalesce("__kth", F.lit(0))).alias("est"))
        .filter(F.col("est") > 0)
    )


def misra_gries_token_sketch(
    df: DataFrame, text_col: str = "text", m: int = 64
) -> DataFrame:
    """End-to-end mergeable heavy-hitters: partial per-partition sketches +
    one merge. Returns (token, est) with est <= true <= est + N/(m+1)."""
    return misra_gries_merge(misra_gries_partial(df, text_col, m), m)
