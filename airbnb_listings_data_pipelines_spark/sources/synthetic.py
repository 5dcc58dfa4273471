"""Custom Python DataSource: distributed deterministic synthetic events.

Spark 4's Python DataSource API (`pyspark.sql.datasource`) is the public
extension point for formats/feeds Spark lacks built-ins for. This module
uses it for the capability a 100 TB test harness actually needs: generating
benchmark/test data ON THE EXECUTORS, in parallel, with NO driver-side
materialization — `spark.createDataFrame(big_list)` ships the whole dataset
through the driver; this source ships only (seed, split bounds) per task.

Determinism: every row is a pure function of (seed, row index) via a
splitmix64-style hash — the same (rows, partitions, seed) options always
produce the same dataset, on any cluster size, so goldens stay stable.

Usage::

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("rows", 1_000_000).option("partitions", 32)
          .option("seed", 7).load())
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("view", "click", "cart", "purchase", "refund")

_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer — a public-domain integer hash; full 64-bit
    avalanche so consecutive indices give independent-looking draws."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def _row(seed: int, i: int) -> tuple:
    h = _mix((seed << 32) ^ i)
    user = h % 100_000
    etype = EVENT_TYPES[(h >> 17) % len(EVENT_TYPES)]
    # value in cents -> exact at any aggregation depth
    value = ((h >> 24) % 1_000_000) / 100.0
    ts_epoch = 1_704_067_200 + (h >> 8) % (365 * 86_400)  # within 2024
    return (i, user, etype, value, ts_epoch)


class _Range(InputPartition):
    def __init__(self, seed: int, start: int, end: int):
        self.seed, self.start, self.end = seed, start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 0))

    def partitions(self) -> list[_Range]:
        per = -(-self.rows // self.num_parts)  # ceil
        return [
            _Range(self.seed, lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(partition.seed, i)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, event_type string, "
            "value double, ts_epoch bigint"
        )

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)
