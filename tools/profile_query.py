"""Phase-level wall-clock profile of one registry query.

Wraps every Spark action-inducing method (DataFrameWriter.save/parquet,
DataFrame.collect/count/toPandas, StreamingQuery.awaitTermination) with a
timer so one run of a multi-commit lakehouse query decomposes into its
actual Spark actions — the measurement §1 of the optimization guide asks
for before touching anything.

Usage: python tools/profile_query.py <query> [sf_dir] [--repeat N]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airbnb_listings_data_pipelines_spark.queries.registry import load_all
from airbnb_listings_data_pipelines_spark.session import get_spark

EVENTS: list[tuple[str, float, str]] = []


def _wrap(cls, name: str, label: str | None = None) -> None:
    orig = getattr(cls, name)
    tag = label or f"{cls.__name__}.{name}"

    def timed(self, *a, **kw):
        # one stack frame of caller context so repeated ops are tellable apart
        caller = ""
        for fr in traceback.extract_stack()[-12:-1][::-1]:
            fn = os.path.basename(fr.filename)
            if fn not in ("profile_query.py",) and "pyspark" not in fr.filename:
                caller = f"{fn}:{fr.lineno}:{fr.name}"
                break
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            EVENTS.append((tag, time.perf_counter() - t0, caller))

    setattr(cls, name, timed)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=2)
    ns = ap.parse_args()
    repeat = ns.repeat
    qname = ns.query
    sf_dir = ns.sf_dir

    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter
    from pyspark.sql.streaming.query import StreamingQuery

    _wrap(DataFrameWriter, "save")
    _wrap(DataFrame, "localCheckpoint")
    _wrap(DataFrameWriter, "parquet")
    _wrap(DataFrame, "collect")
    _wrap(DataFrame, "count")
    _wrap(DataFrame, "toPandas")
    _wrap(DataFrame, "persist")
    _wrap(StreamingQuery, "awaitTermination")

    reg = load_all()
    spark = get_spark("profile", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    for i in range(repeat):
        EVENTS.clear()
        t0 = time.perf_counter()
        df = reg[qname].fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t1
        total = time.perf_counter() - t0
        print(f"\n=== run {i}: total {total:.3f}s (build {t_build:.3f}s, final exec {t_exec:.3f}s)")
        acc: dict[str, tuple[int, float]] = {}
        for tag, dt, caller in EVENTS:
            key = f"{tag:28s} {caller}"
            n, s = acc.get(key, (0, 0.0))
            acc[key] = (n + 1, s + dt)
        for key, (n, s) in sorted(acc.items(), key=lambda kv: -kv[1][1]):
            if s > 0.01:
                print(f"  {s:7.3f}s  n={n:<3d} {key}")
    spark.stop()


if __name__ == "__main__":
    main()
