"""Headline benchmark — driver contract.

Runs a representative slice of the query registry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Execution is forced with the noop sink (full pipeline runs, no driver-side
collect cost). Session startup is excluded; one warm-up query primes the JVM.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airbnb_listings_data_pipelines_spark.queries.registry import load_all
from airbnb_listings_data_pipelines_spark.session import get_spark

# Representative mix: scan+agg, join+topk, window dedup, percentile, lag,
# events windows, exact dedup, text map ops, cosine top-k, minhash+LSH.
HEADLINE = [
    "q01_pricing_summary",
    "q03_join_topk_revenue",
    "q07_dedup_row_number",
    "q09_lag_mom_change",
    "q11_median_percentile",
    "q19_events_tumbling",
    "q22_conditional_rates",
    "x01_dedup_exact",
    "x02_token_count",
    "x03_quality_scores",
    "x07_simhash",
    "x09_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    reg = load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up (not timed)
    reg["q21_global_topk"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):  # first run pays whole-stage-codegen compilation
            t0 = time.perf_counter()
            reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
