"""Driver-contract query registry.

Each entry maps one row of SURVEY.md §2's operator inventory to an executable
(spark, sf_dir) -> DataFrame plus (when SQL-expressible) an ANSI-SQL oracle
that DuckDB runs over the same parquet tables.

Cross-engine hash-stability rules (both sides must follow them — the driver
compares an order-insensitive value hash):

1. Never SUM/AVG a raw double: reduction order differs between engines.
   Cast to DECIMAL first (exact, associative), then cast the final result to
   DOUBLE (bit-identical in both engines).
2. Output columns are only BIGINT / DOUBLE / VARCHAR — no dates, timestamps,
   decimals, or 32-bit ints in the result (pandas dtype and repr mismatches).
3. Identical column names on both sides (driver sorts columns by name).
4. Never project a raw events.ts — Spark reads it at µs, DuckDB at ns.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    survey_rows: tuple[str, ...] = ()  # SURVEY.md §2 inventory ids covered
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None,
    survey_rows: tuple[str, ...] = (),
    doc: str = "",
):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, survey_rows=survey_rows, doc=doc)
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side-effect: fills REGISTRY)."""
    from . import extensions, inventory, sketches, streaming_batch, timeseries  # noqa: F401

    return REGISTRY
