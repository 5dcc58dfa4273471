"""Deletion-vector cost probe: measure the claim "a merge-on-read DML
writes O(matched rows) bytes, not O(touched files)".

Builds a commit-log table from sf0.1 orders as 64 key-ranged files, then
runs the same statement two ways on fresh copies:

- COW (mode='cow'): copy-on-write rewrites every file containing a hit.
- DV (mode='dv'): matched row positions go into one parquet sidecar
  (delete) or sidecar + updated-rows-only files (update); no touched
  file is rewritten.

Two scenarios per op:

- SPREAD: ``o_orderkey % 997 = 0`` — a hit in (nearly) every file, the
  copy-on-write worst case. COW rewrites ~64 files; DV writes one tiny
  sidecar.
- POINT: a single-key predicate (1 matched row). COW still rewrites the
  whole containing file; DV writes a 1-row sidecar — the verdict's
  "1-row delete should not cost a full-file rewrite".

``bytes_written`` counts everything the commit added on disk: add data
files + the DV sidecar. That is the scale-faithful metric — at 100 TB
cluster throughput is bytes-bound; local wall times are also printed but
a 64-file rewrite takes two task waves on local[32] so wall understates
the separation (see tools/probe_dml.py's discussion).

Usage: python tools/probe_dv.py [factor] — prints one JSON line.
``factor`` key-offset-replicates orders (bench_scaling's scheme) so the
per-file bytes dominate fixed commit overhead.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.txlog import TxLogTable
from airbnb_listings_data_pipelines_spark.session import get_spark
from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = 64


def _orders(spark, factor: int):
    base = load_table(spark, SRC, "orders")
    if factor <= 1:
        return base
    copies = [
        base.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000))
        for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _fresh_table(spark, root: str, name: str, factor: int) -> TxLogTable:
    path = os.path.join(root, name)
    shutil.rmtree(path, ignore_errors=True)
    return TxLogTable.create(
        spark,
        path,
        _orders(spark, factor).repartitionByRange(N_FILES, "o_orderkey"),
    )


def _last_commit_bytes(t: TxLogTable) -> int:
    """Bytes the newest commit added on disk: add files + DV sidecars."""
    last = sorted(f for f in os.listdir(t.log_dir) if f.endswith(".json"))[-1]
    with open(os.path.join(t.log_dir, last)) as fh:
        c = json.load(fh)
    total = sum(
        os.path.getsize(os.path.join(t.path, f)) for f in c.get("adds", [])
    )
    sidecars = {
        desc["sidecar"]
        for key in ("dvs", "dv_added")
        for desc in c.get(key, {}).values()
    }
    total += sum(os.path.getsize(os.path.join(t.path, s)) for s in sidecars)
    return total


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    spark = get_spark("dv-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="dvprobe_")
    out: dict[str, object] = {"sf_dir": SRC, "factor": factor, "n_files": N_FILES}
    assigns = {"o_totalprice": F.col("o_totalprice") + F.lit(10.0)}
    try:
        for op in ("delete", "update"):
            rec: dict[str, object] = {}
            for scenario, pred in (
                ("spread", "o_orderkey % 997 = 0"),
                ("point", None),  # resolved per-table below
            ):
                row: dict[str, object] = {}
                for mode in ("cow", "dv"):
                    t = _fresh_table(spark, root, f"{op}_{scenario}_{mode}", factor)
                    if pred is None:
                        key = int(
                            t.read().selectExpr("min(o_orderkey)").first()[0]
                        ) + 7
                        cond = f"o_orderkey = {key}"
                    else:
                        cond = pred
                    if op == "delete":
                        sec = _timed(
                            lambda: t.delete_where(cond, mode=mode)
                        )
                    else:
                        sec = _timed(
                            lambda: t.update_where(cond, assigns, mode=mode)
                        )
                    row[f"{mode}_sec"] = round(sec, 3)
                    row[f"{mode}_bytes"] = _last_commit_bytes(t)
                    row[f"{mode}_files_rewritten"] = t.history()[-1].get(
                        "n_removes", 0
                    )
                row["byte_ratio_cow_over_dv"] = round(
                    row["cow_bytes"] / max(row["dv_bytes"], 1), 1
                )
                rec[scenario] = row
            out[op] = rec
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
