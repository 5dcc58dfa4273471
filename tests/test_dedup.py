from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
            (3, "the quick brown fox jumped over the lazy dog"),  # near dup
            (4, "completely different content about spark engines"),
        ],
        ["doc_id", "text"],
    )


def test_exact_dedup_keeps_lowest_id(docs):
    out = dedup.exact_dedup(docs, ["text"], "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [1, 3, 4]


def test_char_shingles(spark):
    df = spark.createDataFrame([("ABCD",)], ["t"])
    sh = df.select(dedup.char_shingles(F.col("t"), 3).alias("s")).collect()[0].s
    assert sh == ["abc", "bcd"]
    # shorter than n -> single padded-window shingle of the whole string
    df2 = spark.createDataFrame([("ab",)], ["t"])
    sh2 = df2.select(dedup.char_shingles(F.col("t"), 3).alias("s")).collect()[0].s
    assert sh2 == ["ab"]


def test_ngram_jaccard_identical_is_one(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] > 0.7  # near dup
    assert (1, 4) not in pairs


def test_minhash_lsh_finds_dup_pair(docs):
    out = dedup.minhash_lsh_pairs(docs, verify_threshold=0.5)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 2) in got  # identical docs always collide in every band
    assert all(a < b for a, b in got)


def test_simhash_identical_texts_equal(docs):
    fp = {r.id: r.simhash for r in dedup.simhash(docs).collect()}
    assert fp[1] == fp[2]
    # near-dup should be close in Hamming distance, far doc should differ more
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(fp[1], fp[3]) <= ham(fp[1], fp[4])
