"""Streaming upsert sink: CDC-style ``foreachBatch`` MERGE into a parquet
target — the production pattern for landing a change stream in a
warehouse table (public analog: Structured Streaming foreachBatch +
Delta/Iceberg MERGE; here backed by operators/merge.merge_into_parquet).

Why foreachBatch: MERGE is not an incremental streaming operator (it
needs the full target), but each micro-batch IS a bounded DataFrame, so
the loop is: dedup the batch to the latest row per key, then run one
batch MERGE per trigger. Exactly-once comes from the checkpoint (a
replayed batch re-merges the same rows — upserts are idempotent by key).

Scale shape: per-trigger cost is one merge of |batch| rows against the
touched partitions only (pass ``partition_col``), never a full-table
rewrite per trigger; compaction of the accreted partitions is
operators/maintenance.compact_parquet_dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.merge import merge_into_parquet


def latest_per_key(batch: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Collapse a micro-batch to its last change per key (highest
    ``order_col``, ties broken arbitrarily-but-deterministically by the
    remaining columns is unnecessary: CDC streams carry a monotonic
    ordinal). One window, no join."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    return batch.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def upsert_stream(
    stream: DataFrame,
    target_path: str,
    keys: list[str],
    order_col: str,
    checkpoint_dir: str,
    partition_col: str | None = None,
    available_now: bool = True,
):
    """Start a foreachBatch MERGE sink; returns the StreamingQuery.

    First batch bootstraps the target (plain write) when ``target_path``
    does not exist yet; subsequent batches MERGE (update-on-match,
    insert-on-miss).
    """

    def apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.columns:
            return
        b = latest_per_key(batch, keys, order_col)
        spark = batch.sparkSession
        if not os.path.exists(target_path):
            if partition_col:
                b.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
            else:
                b.write.mode("overwrite").parquet(target_path)
            return
        merge_into_parquet(
            spark,
            target_path,
            b,
            keys,
            when_matched="update",
            when_not_matched="insert",
            partition_col=partition_col,
        )

    writer = stream.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
