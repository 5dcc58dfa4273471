"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 (+ the training-data-pipeline extensions), registered in
``airbnb_listings_data_pipelines_spark.queries``. As of round 2 EVERY query
carries an oracle: direct SQL twins, shared-md5-hash twins for hash-based
ops, and invariant oracles (exact truth set + precision/recall/error
flags) for approximate ops — see queries/extensions.py docstring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airbnb_listings_data_pipelines_spark.queries.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = load_all()
    return reg["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


# The driver checks the first 50 registry entries per round. Round-7
# window: never-driver-checked queries lead (x70/x71 — added in the
# round-6 snapshot commit after that round's correctness run — and the
# round-7 additions x72-x74), then the 43 queries whose latest driver
# evidence is round 4 (the union over CORRECTNESS_r01..r06 of each
# query's newest green round), then 2 fillers from the round-5-stale
# set in registry order (5 + 43 + 2 = 50 slots). After this
# window, no registry query's driver evidence predates round 5.
# Membership is derived from the committed CORRECTNESS files and
# enforced by tests/test_repo_consistency.py::
# test_window_rotation_covers_stalest_evidence. Everything outside the
# window stays covered by tools/check_oracle.py's full bit-exact
# registry sweep (145/145 at the start of round 7; x72-x76 added and gate-checked in round 7).
#
# Evidence-audit note: the round-1 driver files contain three names that
# never passed — x06_minhash_lsh_pairs, x10_lsh_ann_topk,
# x14_ivf_ann_topk. Those are pre-oracle round-1 names; the queries were
# renamed to x06_minhash_lsh_recall / x10_lsh_ann_recall /
# x14_ivf_ann_recall when they gained invariant oracles in round 2, and
# the renamed successors are driver-green (r2/r4/r5). They are renames,
# not never-checked queries.
_CHECK_FIRST = [
    # never driver-checked — slots 1-5
    "x70_cow_dml_delete_update",
    "x71_merge_changefeed",
    "x72_dml_partition_scoped",
    "x73_stream_exactly_once_ingest",
    "x74_tag_restore_roundtrip",
    # latest driver evidence round 4 — slots 6-48
    "x37_embedding_decontamination",
    "x38_retrieve_rerank",
    "x39_winnowing_fingerprints",
    "x40_winnowing_neardup_pairs",
    "x41_pq_ann_recall",
    "x42_bpe_pair_counts",
    "x43_lang_id_ngram",
    "x45_duplicate_span_coverage",
    "x46_leakage_safe_split",
    "x47_heavy_hitters_mg",
    "x48_temperature_mixture_sample",
    "x49_bm25_retrieval",
    "x50_dsir_importance_selection",
    "x52_semdedup_prune",
    "x53_hard_negative_mining",
    "x54_fuzzy_record_linkage",
    "x55_bigram_lm_quality",
    "x56_span_decontaminate",
    "x57_pagerank_trade_graph",
    "x58_bloom_line_membership",
    "x59_hybrid_rrf_retrieval",
    "q28_approx_sketch_aggregates",
    "q32_rollup_hierarchy",
    "q34_intersect_except",
    "q35_pivot_status_by_priority",
    "q37_month_spine_gap_fill",
    "q38_lateral_top2_per_customer",
    "q39_snowflake_dialect_frontend",
    "q59_intersect_except_all",
    "q61_bitwise_breadth",
    "q62_cube_status_year",
    "q67_map_functions",
    "q69_content_hashing_encoding",
    "q70_pivot_revenue_matrix",
    "q71_exists_semi_anti",
    "q72_group_by_all_ergonomics",
    "q73_filter_clause_aggregates",
    "x51_mergeable_quantile_histogram",
    "q19_events_tumbling",
    "q23_events_sessionize_gap",
    # never driver-checked round-7 additions — slots 46-50 (they
    # displace the round-5-stale fillers and the last three
    # round-4-stale entries in registry order,
    # q33_events_daily_top_users, q36_json_extraction and
    # x44_attribution_join: never-checked leads per the window guard's
    # rule; q33/q36/x44 head the round-8 rotation)
    "x75_change_data_feed",
    "x76_zero_copy_clone",
    "x77_python_datasource_read",
    "x78_column_mapping_evolution",
    "x79_convert_from_delta",
]


def _ordered():
    reg = load_all()
    ordered = [n for n in _CHECK_FIRST if n in reg]
    ordered += [n for n in reg if n not in set(ordered)]
    return {n: reg[n] for n in ordered}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
