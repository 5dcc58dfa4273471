"""BM25 retrieval and DSIR importance selection: semantic sanity checks
beyond the registry oracles (which pin cross-engine exactness)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators import retrieval, sampling


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, "spark shuffle join broadcast"),
        (1, "spark shuffle join broadcast"),  # exact copy of 0
        (2, "parquet scan pushdown filter pruning"),
        (3, "window rank dense ties frame"),
        (4, "spark window rank frame"),
        (5, "zebra quux xylophone unique hapax"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_self_retrieval_is_top1(spark, corpus):
    postings = retrieval.bm25_postings(corpus)
    qterms = (
        corpus.filter(F.col("doc_id") == 2)
        .select(F.col("doc_id").alias("q_id"), F.explode(F.split("text", " ")).alias("term"))
        .distinct()
    )
    top = retrieval.bm25_topk(postings, qterms, k=3).orderBy("rnk").collect()
    assert top[0].doc_id == 2  # a doc is its own best lexical match
    # doc 2's vocabulary is unique to it -> it is the ONLY candidate
    assert [r.doc_id for r in top] == [2]


def test_bm25_exact_copies_tie_break_by_doc_id(spark, corpus):
    postings = retrieval.bm25_postings(corpus)
    qterms = spark.createDataFrame(
        [(99, "shuffle"), (99, "broadcast")], ["q_id", "term"]
    )
    top = retrieval.bm25_topk(postings, qterms, k=2).orderBy("rnk").collect()
    # docs 0 and 1 are identical -> identical score, doc_id ascending tiebreak
    assert [r.doc_id for r in top] == [0, 1]
    assert top[0].score == top[1].score


def test_bm25_rare_term_outscores_common(spark, corpus):
    postings = retrieval.bm25_postings(corpus)
    qterms = spark.createDataFrame(
        [(1, "hapax"), (2, "spark")], ["q_id", "term"]
    )
    res = {
        (r.q_id, r.rnk): r.score
        for r in retrieval.bm25_topk(postings, qterms, k=1).collect()
    }
    # 'hapax' (df=1) must contribute more than 'spark' (df=3)
    assert res[(1, 1)] > res[(2, 1)]


def test_dsir_prefers_target_like_raw_docs(spark):
    rows = (
        # target corpus: legal-ish vocabulary
        [(i, "court law statute ruling appeal", "tgt") for i in range(5)]
        # raw docs: one legal-like, several off-domain
        + [(10, "court law statute verdict", "raw")]
        + [(11 + i, "pizza soccer weather holiday", "raw") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text", "grp"])
    out = {
        r.doc_id: r
        for r in sampling.dsir_importance_scores(
            docs, is_target=F.col("grp") == "tgt"
        ).collect()
    }
    assert set(out) == {10, 11, 12, 13, 14}  # only raw docs scored
    legal, off = out[10], out[11]
    assert legal.lr_per_token > off.lr_per_token
    assert legal.selected == 1 and off.selected == 0


def test_fuzzy_linkage_name_collapse_matches_naive(spark):
    """x54's unique-name collapse must equal the naive per-record pair join,
    including the branches sf0.01 never hits (singleton names, records that
    hold the min key of a duplicated name)."""
    from airbnb_listings_data_pipelines_spark.queries.registry import load_all
    from airbnb_listings_data_pipelines_spark.sources import tpch

    rows = [
        (10, "small ring"),    # dup pair (10, 11); 10 holds min key
        (11, "small ring"),
        (12, "small rings"),   # singleton, dist 1 to "small ring"
        (13, "small bolt"),    # singleton, dist > 2 to others in block
        (14, "red widget"),    # singleton block -> no matches, excluded
    ]
    p = spark.createDataFrame(rows, ["p_partkey", "p_name"])

    import airbnb_listings_data_pipelines_spark.queries.extensions as ext
    orig = tpch.load_table
    try:
        tpch.load_table = lambda s, d, t: p if t == "part" else orig(s, d, t)
        ext.load_table = tpch.load_table
        out = {
            r.p_partkey: r
            for r in load_all()["x54_fuzzy_record_linkage"].fn(spark, "ignored").collect()
        }
    finally:
        tpch.load_table = orig
        ext.load_table = orig

    assert set(out) == {10, 11, 12}  # 13: no dist<=2 partner; 14: alone in block
    assert (out[10].n_matches, out[10].min_dist, out[10].best_match_key) == (2, 0, 11)
    assert (out[11].n_matches, out[11].min_dist, out[11].best_match_key) == (2, 0, 10)
    assert (out[12].n_matches, out[12].min_dist, out[12].best_match_key) == (2, 1, 10)


def test_dsir_raises_on_empty_target(spark):
    """Zero target tokens would silently NULL the Spark side while the
    DuckDB oracle errors — the operator must fail loudly instead."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "only raw words", "raw"), (2, "more raw words", "raw")],
        ["doc_id", "text", "grp"],
    )
    with pytest.raises(Exception, match="at least one token"):
        # collect(), not count(): column pruning would eliminate the guarded
        # ratio expression from a bare row-count plan
        sampling.dsir_importance_scores(docs, is_target=F.col("grp") == "tgt").collect()
