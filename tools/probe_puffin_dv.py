"""10x probe: the Iceberg v3 Puffin deletion-vector export must cost
O(deleted rows) — and the per-row cost must hold as the DELETED set
grows 10x at fixed table size (blob encode is driver-side roaring
serialization; the dangerous failure mode would be a corpus-sized term
hiding in the export).

Usage: python tools/probe_puffin_dv.py
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airbnb_listings_data_pipelines_spark.operators.txlog import TxLogTable
from airbnb_listings_data_pipelines_spark.session import get_spark


def run(spark, root, n_rows, del_mod):
    path = os.path.join(root, f"t_{del_mod}")
    shutil.rmtree(path, ignore_errors=True)
    t = TxLogTable.create(
        spark,
        path,
        spark.range(n_rows)
        .selectExpr("id AS k", "CAST(id AS DOUBLE) AS amt")
        .repartition(8),
    )
    t.delete_where(f"k % {del_mod} = 1", mode="dv")
    n_del = n_rows // del_mod
    t0 = time.time()
    t.to_iceberg(format_version=3)
    wall = time.time() - t0
    meta = os.path.join(path, "metadata")
    puffin = next(
        f for f in os.listdir(meta) if f.endswith(".puffin")
    )
    size = os.path.getsize(os.path.join(meta, puffin))
    return n_del, wall, size


def main():
    spark = get_spark("probe-puffin-dv")
    root = "/tmp/probe_puffin_dv"
    os.makedirs(root, exist_ok=True)
    n_rows = 2_000_000
    run(spark, root, 200_000, 100)  # warm the JVM/code paths
    d1, w1, s1 = run(spark, root, n_rows, 100)   # ~20k deleted
    d2, w2, s2 = run(spark, root, n_rows, 10)    # ~200k deleted (10x)
    print(
        f"deleted {d1:>8} rows: export {w1:6.2f} s, puffin {s1:>9} B "
        f"({s1 / max(d1, 1):.2f} B/row)"
    )
    print(
        f"deleted {d2:>8} rows: export {w2:6.2f} s, puffin {s2:>9} B "
        f"({s2 / max(d2, 1):.2f} B/row)"
    )
    print(
        f"10x deleted rows -> {w2 / w1:.2f}x export wall, "
        f"{s2 / s1:.2f}x blob bytes"
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
