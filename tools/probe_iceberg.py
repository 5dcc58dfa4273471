"""10x probe: the Iceberg metadata export must scale with LIVE FILE
COUNT (manifest entries), not row count. Same rows, 10x the files —
export time should scale ~linearly with files; same files, 10x the
rows — flat.

Usage: python tools/probe_iceberg.py
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airbnb_listings_data_pipelines_spark.operators.iceberg import (
    export_iceberg_metadata,
)
from airbnb_listings_data_pipelines_spark.operators.txlog import TxLogTable
from airbnb_listings_data_pipelines_spark.session import get_spark


def build(spark, root, tag, rows, files):
    t = TxLogTable.create(
        spark,
        os.path.join(root, tag),
        spark.range(rows).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS amt"
        ).repartition(files),
    )
    return t


def main():
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="iceberg_probe_")
    try:
        build(spark, root, "warm", 1000, 4)
        export_iceberg_metadata(build(spark, root, "w2", 1000, 4))
        t_f1 = build(spark, root, "f200", 200_000, 200)
        t0 = time.time(); export_iceberg_metadata(t_f1); e_f1 = time.time() - t0
        t_f10 = build(spark, root, "f2000", 200_000, 2000)
        t0 = time.time(); export_iceberg_metadata(t_f10); e_f10 = time.time() - t0
        t_r10 = build(spark, root, "r10", 2_000_000, 200)
        t0 = time.time(); export_iceberg_metadata(t_r10); e_r10 = time.time() - t0
        print(
            f"export @200 files: {e_f1:.2f}s  @2000 files: {e_f10:.2f}s "
            f"(files-ratio {e_f10 / e_f1:.2f})  @200 files x10 rows: "
            f"{e_r10:.2f}s (rows-ratio {e_r10 / e_f1:.2f})"
        )
        # INCREMENTAL refresh: append ONE file to the 2000-file table —
        # manifest reuse must make the refresh cost track the CHANGE
        # (one small fresh manifest), not the live-file count
        t_f10.append(spark.range(10).selectExpr(
            "id + 9000000 AS k", "CAST(id AS DOUBLE) AS amt"
        ).coalesce(1))
        t0 = time.time()
        export_iceberg_metadata(t_f10)
        e_incr = time.time() - t0
        print(
            f"incremental refresh @2000 files (+1 file): {e_incr:.2f}s "
            f"(vs full {e_f10:.2f}s, ratio {e_incr / e_f10:.2f})"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
