"""The x01-first production ordering, tested (round-5 verdict item 5):
on a corpus with verbatim replication, running exact dedup BEFORE the
winnowing candidate generator must collapse the candidate-pair count by
an order of magnitude while preserving the pair semantics exactly
(pairs over representatives == pairs over the unreplicated originals).
Encoded as API in operators/curation.neardup_candidates_production."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators import curation, dedup
from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

from .conftest import SF_SMALL

REPL = 5  # copies per document


@pytest.fixture()
def replicated(spark):
    """Every sf0.001 document replicated REPL times under distinct ids:
    id*REPL+r, so the min-id representative of each clique is id*REPL —
    a deterministic mapping back to the original corpus."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    spine = spark.range(REPL).select(F.col("id").alias("__r"))
    return docs.crossJoin(F.broadcast(spine)).select(
        (F.col("doc_id") * REPL + F.col("__r")).alias("doc_id"), "text"
    )


def test_exact_dedup_first_collapses_candidate_pairs(spark, replicated):
    naive = dedup.winnowing_neardup_pairs(replicated).count()
    cands, reps = curation.neardup_candidates_production(replicated)
    prod = cands.count()
    assert prod > 0, "the fixture corpus must contain real near-dup candidates"
    assert naive >= 10 * prod, (
        f"x01-first must collapse candidates >=10x on a {REPL}x-replicated "
        f"corpus: naive={naive}, production={prod}"
    )
    # every clique collapsed to exactly one representative with exact size
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert reps.count() == n_docs
    assert {r.n_copies for r in reps.collect()} == {REPL}


def test_production_pairs_equal_unreplicated_pairs(spark, replicated):
    """Ordering must not change SEMANTICS: candidates over representatives
    are exactly the original corpus's candidates under the id mapping
    orig_id -> orig_id * REPL (min id of each replica clique)."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    orig = {
        (r.id_a * REPL, r.id_b * REPL, r.shared_fps)
        for r in dedup.winnowing_neardup_pairs(docs).collect()
    }
    cands, _ = curation.neardup_candidates_production(replicated)
    prod = {(r.id_a, r.id_b, r.shared_fps) for r in cands.collect()}
    assert prod == orig
