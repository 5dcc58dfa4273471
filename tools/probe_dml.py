"""Copy-on-write DML sliver probe: measure the claim "a DML touching a
sliver of rows rewrites that sliver, not the table".

Builds a commit-log table from sf0.1 orders as 8 key-ranged files, then
times the same statement class two ways:

- SLIVER: predicate confined to one file's key range, with the prune hint
  a partition/range-scoped production DML would pass — discovery scan and
  rewrite both touch 1 of N_FILES.
- FULL-SPREAD: predicate matching rows in every file (key % 8 == 0) —
  every file contains hits, so copy-on-write rewrites all of them (the
  worst case, equivalent to a full rewrite).

Two metrics, because local[32] masks one of them:

- ``bytes_rewritten`` is the scale-faithful cost: at 100 TB cluster
  throughput is bytes-bound, and the sliver path provably writes
  1/N_FILES of the spread path's bytes (exact, not a timing).
- wall seconds: on local[32] a spread rewrite of <=32 files completes in
  ONE parallel task wave, so wall time ties until files exceed cores —
  which is why N_FILES=64 here (two waves vs one) and why the byte ratio,
  not the local wall ratio, is the 1000-executor story.

Table rebuild time is excluded.

Usage: python tools/probe_dml.py [factor]  — prints one JSON line.
``factor`` key-offset-replicates orders first (bench_scaling's scheme):
at 1x the 8 files are ~340 KB each and fixed job/commit overhead hides
the sliver advantage; at 10x+ the rewrite bytes dominate and the measured
speedup approaches files_total/files_touched.
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


N_FILES = 64


def _fresh_table(spark, root: str, name: str, factor: int) -> TxLogTable:
    path = os.path.join(root, name)
    shutil.rmtree(path, ignore_errors=True)
    return TxLogTable.create(
        spark,
        path,
        _orders(spark, factor).repartitionByRange(N_FILES, "o_orderkey"),
    )


def _last_commit_bytes(t: TxLogTable) -> tuple[int, int]:
    """(n_adds, bytes of the add files) of the newest commit."""
    import json as _json

    last = sorted(
        f for f in os.listdir(t.log_dir) if f.endswith(".json")
    )[-1]
    with open(os.path.join(t.log_dir, last)) as fh:
        c = _json.load(fh)
    return len(c["adds"]), sum(
        os.path.getsize(os.path.join(t.path, f)) for f in c["adds"]
    )


def _one_file_range(t: TxLogTable) -> tuple[int, int]:
    """The [lo, hi] o_orderkey envelope of a single middle file."""
    stats = t.file_stats(["o_orderkey"])
    envs = sorted(env["o_orderkey"] for env in stats.values())
    lo, hi = envs[3]
    return int(lo), int(hi)


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    spark = get_spark("dml-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="dmlprobe_")
    out: dict[str, object] = {"sf_dir": SRC, "factor": factor}
    try:
        for op in ("delete", "update"):
            # -- sliver: one file's key range, with the prune hint
            t = _fresh_table(spark, root, f"{op}_sliver", factor)
            lo, hi = _one_file_range(t)
            n_before = len(t.files())
            if op == "delete":
                sliver_sec = _timed(lambda: t.delete_where(
                    (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") <= hi)
                    & (F.col("o_orderstatus") == "F"),
                    prune=("o_orderkey", lo, hi),
                ))
            else:
                sliver_sec = _timed(lambda: t.update_where(
                    f"o_orderkey BETWEEN {lo} AND {hi} AND o_orderstatus = 'P'",
                    {"o_totalprice": F.col("o_totalprice") + F.lit(10.0)},
                    prune=("o_orderkey", lo, hi),
                ))
            sliver_touched = t.history()[-1]["n_removes"]
            _, sliver_bytes = _last_commit_bytes(t)

            # -- full-spread: hits in every file
            t2 = _fresh_table(spark, root, f"{op}_full", factor)
            if op == "delete":
                full_sec = _timed(
                    lambda: t2.delete_where("o_orderkey % 8 = 0")
                )
            else:
                full_sec = _timed(lambda: t2.update_where(
                    "o_orderkey % 8 = 0",
                    {"o_totalprice": F.col("o_totalprice") + F.lit(10.0)},
                ))
            _, full_bytes = _last_commit_bytes(t2)
            out[op] = {
                "sliver_sec": round(sliver_sec, 3),
                "full_sec": round(full_sec, 3),
                "wall_speedup": round(full_sec / sliver_sec, 2),
                "bytes_rewritten_sliver": sliver_bytes,
                "bytes_rewritten_full": full_bytes,
                "byte_ratio": round(full_bytes / max(sliver_bytes, 1), 1),
                "files_rewritten_sliver": sliver_touched,
                "files_rewritten_full": t2.history()[-1]["n_removes"],
                "files_total": n_before,
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
