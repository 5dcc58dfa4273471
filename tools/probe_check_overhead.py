"""CHECK-constraint enforcement overhead probe.

Enforcement is ONE aggregate scan over the newly written files (pushed
down, O(batch)); this measures what that costs a write in practice:
time N appends of sf0.1 orders into a commit-log table with 0 vs 3
active constraints and report the per-append delta.

Usage: python tools/probe_check_overhead.py [n_appends]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airbnb_listings_data_pipelines_spark.operators.txlog import TxLogTable
from airbnb_listings_data_pipelines_spark.session import get_spark
from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("check-probe")
    spark.sparkContext.setLogLevel("ERROR")
    orders = load_table(spark, SRC, "orders").localCheckpoint(eager=True)
    root = tempfile.mkdtemp(prefix="ckprobe_")
    out = {"sf_dir": SRC, "n_appends": n}
    try:
        for label, checks in (("no_checks", 0), ("three_checks", 3)):
            t = TxLogTable.create(
                spark, os.path.join(root, label), orders.limit(0)
            )
            if checks:
                t.add_check("price_pos", "o_totalprice >= 0")
                t.add_check("status_known", "o_orderstatus IN ('F','O','P')")
                t.add_check("key_pos", "o_orderkey >= 0")
            t0 = time.monotonic()
            for _ in range(n):
                t.append(orders)
            out[label + "_sec_per_append"] = round(
                (time.monotonic() - t0) / n, 3
            )
        out["overhead_sec_per_append"] = round(
            out["three_checks_sec_per_append"] - out["no_checks_sec_per_append"], 3
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
