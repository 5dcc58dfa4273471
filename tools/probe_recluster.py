"""10x probe: incremental re-clustering cost must track the BATCH's
bytes, not the table's. Builds a clustered table at N and 10N rows,
appends the SAME-SIZE batch to each, and times the bare OPTIMIZE
(incremental) against a full=True pass at 10N for contrast.

Usage: python tools/probe_recluster.py
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airbnb_listings_data_pipelines_spark.operators.txlog import TxLogTable
from airbnb_listings_data_pipelines_spark.session import get_spark


def build(spark, root, n, tag):
    t = TxLogTable.create(
        spark,
        os.path.join(root, f"t{tag}_{n}"),
        spark.range(n).selectExpr(
            "id AS a", "id * 7 % 1000 AS b",
            "CAST(id AS DOUBLE) AS amt",
            "repeat('x', 64) AS pad",
        ).repartition(16),
    )
    t.cluster_by(["a", "b"])
    t.optimize(target_files=16)  # initial pass
    return t


def probe(spark, root, n, batch, full=False, tag="p"):
    t = build(spark, root, n, tag)
    t.append(
        spark.range(batch).selectExpr(
            "id + 2000000000 AS a", "id % 1000 AS b",
            "CAST(id AS DOUBLE) AS amt", "repeat('x', 64) AS pad",
        ).repartition(4)
    )
    t0 = time.time()
    t.optimize(target_files=4, full=full)
    return time.time() - t0


def main():
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="recluster_probe_")
    try:
        n, batch = 400_000, 100_000
        # warm-up to amortize JVM/codegen
        probe(spark, root, 50_000, 10_000, tag="warm")
        t1 = probe(spark, root, n, batch, tag="n1")
        t10 = probe(spark, root, n * 10, batch, tag="n10")
        tfull = probe(spark, root, n * 10, batch, full=True, tag="full")
        print(
            f"incremental@N={n}: {t1:.2f}s  incremental@10N: {t10:.2f}s  "
            f"ratio {t10 / t1:.2f}  full@10N: {tfull:.2f}s "
            f"({tfull / t10:.1f}x the incremental pass)"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
