"""Empty-input robustness: every operator family must return an empty
result with the right schema — not raise — when fed zero rows (at 100 TB a
partition-pruned read legitimately produces empty frames)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from airbnb_listings_data_pipelines_spark.operators import curation, dedup, similarity, text
from airbnb_listings_data_pipelines_spark.operators.skew import salted_agg


def _empty_docs(spark):
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    return spark.createDataFrame([], schema)


def test_dedup_ops_on_empty(spark):
    docs = _empty_docs(spark)
    assert dedup.exact_dedup(docs, ["text"], "doc_id").count() == 0
    assert dedup.ngram_jaccard_pairs(docs).count() == 0
    assert dedup.minhash_lsh_pairs(docs).count() == 0
    assert dedup.simhash(docs).count() == 0
    assert dedup.simhash_neardup_pairs(docs).count() == 0


def test_text_and_curation_on_empty(spark):
    docs = _empty_docs(spark)
    feats = text.quality_features(docs)
    assert feats.count() == 0
    assert set(feats.columns) == {
        "doc_id", "n_chars", "n_tokens", "punct_ratio", "stopword_ratio", "mean_token_len",
    }
    assert curation.curate_documents(docs).count() == 0


def test_similarity_on_empty_queries(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    none = emb.filter(F.col("vec_id") < 0)
    assert similarity.brute_force_topk(emb, none).count() == 0


def test_salted_agg_on_empty(spark):
    df = spark.createDataFrame([], "k string, v double, salt_src long")
    out = salted_agg(df, ["k"], ["salt_src"], {"s": ("sum", "v"), "n": ("count", "v")})
    assert out.count() == 0
    assert not isinstance(out.schema, StructType) or {"k", "s", "n"} <= set(out.columns)
