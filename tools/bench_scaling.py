"""Scaling probe: replicate the sf0.1 tables 10x (key-offset copies — same
distributions, 6M lineitem rows) into a local parquet dir, then run a
headline-query subset at 1x and 10x and report the runtime ratio per query.

Linear-ish ratios (~10x work on 32 threads => ratio well under 10 until
cores saturate) indicate the plan scales; super-linear ratios expose
operators that would break at 100 TB.

Usage: python tools/bench_scaling.py [factor]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.queries.registry import load_all
from airbnb_listings_data_pipelines_spark.session import get_spark
from airbnb_listings_data_pipelines_spark.sources.tpch import TPCH_TABLES, load_table

SRC = "/root/testdata/sf0.1"
SUBSET = [
    "q01_pricing_summary",
    "q03_join_topk_revenue",
    "q07_dedup_row_number",
    "q11_median_percentile",
    "q19_events_tumbling",
    "q22_conditional_rates",
    "x01_dedup_exact",
    "x03_quality_scores",
    "x09_cosine_topk",
    # round-2 operators
    "q48_asof_join_last_click",
    "q49_range_join_click_counts",
    "x10_lsh_ann_recall",
    "x22_dedup_components",
    "x23_tfidf_top_terms",
    # round-3 operators
    "x31_repetition_stats",
    "x32_corpus_line_dedup",
    "x33_pii_redaction",
    "x34_quantized_ann",
    "q56_higher_order_array_functions",
    "q62_cube_status_year",
    "q63_gapfill_locf",
    "q64_retention_cohorts",
    "x36_mergeable_hll_rollup",
    "q65_variant_semistructured",
    "q66_stats_aggregate_breadth",
    "q67_map_functions",
    "q68_native_session_window",
    "x37_embedding_decontamination",
    "x38_retrieve_rerank",
    # round-5 operators
    "x61_training_shard_manifest",
    "x62_embedding_dispersion",
    "x63_char_coverage",
    "x64_cross_source_dup_matrix",
]


def _tumbling_hll_default(spark, sf_dir):
    """q19's at-scale default: the tumbling aggregate with the HLL distinct
    switch (streaming/events.tumbling_aggregate, distinct='auto' with no
    small-cardinality hint -> approx). Measured here so SCALING.md records
    the ratio of the path a 100 TB deployment actually runs."""
    from airbnb_listings_data_pipelines_spark.streaming.events import tumbling_aggregate

    return tumbling_aggregate(load_table(spark, sf_dir, "events"))


EXTRA = {"q19_tumbling_hll_default": _tumbling_hll_default}

KEY_COLS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "supplier": [],
    "part": [],
    "nation": [],
    "region": [],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
KEY_SPANS = {
    "o_orderkey": 10_000_000,
    "l_orderkey": 10_000_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def replicate(spark, out_dir: str, factor: int) -> None:
    for t in TPCH_TABLES:
        df = load_table(spark, SRC, t)
        if t == "events":
            # keep µs timestamps; re-written parquet avoids the nanos quirk
            pass
        copies = []
        for i in range(factor if KEY_COLS[t] else 1):
            c = df
            for k in KEY_COLS[t]:
                c = c.withColumn(k, F.col(k) + F.lit(i * KEY_SPANS[k]))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.repartition(8).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2:]  # optional query subset for targeted 30x/100x probes
    big = tempfile.mkdtemp(prefix="sfbig_")
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, big, factor)
    reg = load_all()

    if only:
        fns = {name: reg[name].fn for name in only}
    else:
        fns = {name: reg[name].fn for name in SUBSET} | EXTRA

    def run(sf_dir: str) -> dict[str, float]:
        out = {}
        for name, fn in fns.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
        return out

    base = run(SRC)
    scaled = run(big)
    report = {
        name: {
            "sf0.1_s": base[name],
            f"x{factor}_s": scaled[name],
            "ratio": round(scaled[name] / base[name], 2),
        }
        for name in fns
    }
    print(json.dumps({"factor": factor, "queries": report}))
    spark.stop()


if __name__ == "__main__":
    main()
