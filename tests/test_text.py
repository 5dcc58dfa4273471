from __future__ import annotations

import pytest

from airbnb_listings_data_pipelines_spark.operators import text


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("  x ",), ("",)], ["text"])
    vals = [r.n for r in df.select(text.token_count("text").alias("n")).collect()]
    assert vals == [3, 1, 0]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("hello world42!",)], ["text"])
    n = df.select(text.bpe_ish_token_count("text").alias("n")).collect()[0].n
    # hello | world | 42 | !
    assert n == 4


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is happy"),
            (2, "le chat est sur la table et la chaise"),
            (3, "der hund und die katze ist ein tier"),
            (4, "el perro y los gatos es una familia"),
            (5, "这是中文文本"),
            (6, "xyzzy plugh qwerty"),
        ],
        ["id", "text"],
    )
    got = {r.id: r.lang for r in df.select("id", text.lang_id("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "zh", 6: "und"}


def test_quality_features(spark):
    df = spark.createDataFrame([(1, "Hello, world! Fine.")], ["doc_id", "text"])
    r = text.quality_features(df).collect()[0]
    assert r.n_chars == 19
    assert r.n_tokens == 3
    assert r.punct_ratio == 3 / 19  # , ! .
    assert r.mean_token_len == (19 - 2) / 3


def test_stratified_sample_deterministic(spark):
    from airbnb_listings_data_pipelines_spark.queries.registry import load_all

    from .conftest import SF_SMALL

    fn = load_all()["x19_stratified_sample"].fn
    a = sorted(r.doc_id for r in fn(spark, SF_SMALL).collect())
    b = sorted(r.doc_id for r in fn(spark, SF_SMALL).collect())
    assert a == b and len(a) > 0
    # en is downsampled vs the rest
    import collections

    langs = collections.Counter(r.lang for r in fn(spark, SF_SMALL).collect())
    from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

    full = collections.Counter(
        r.lang for r in load_table(spark, SF_SMALL, "documents").collect()
    )
    assert langs["en"] / full["en"] < 0.55
    assert langs["de"] / full["de"] > 0.5


def test_chunking_jvm_and_udtf_agree(spark):
    from airbnb_listings_data_pipelines_spark.operators import udtf_ops
    from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

    from .conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").limit(30)
    jvm = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in text.chunk_tokens(docs).collect()
    }
    udtf_ops.register(spark)
    docs.createOrReplaceTempView("__docs_chunk")
    py = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in spark.sql(
            "SELECT doc_id, c.chunk_idx, c.chunk_text "
            "FROM __docs_chunk, LATERAL chunk_tokens_udtf(text) c"
        ).collect()
    }
    assert jvm == py and len(jvm) > 30  # overlapping chunks, identical both paths


def test_word_shingles(spark):
    from airbnb_listings_data_pipelines_spark.operators.text import word_shingles

    df = spark.createDataFrame(
        [(1, "A b c d"), (2, "one two"), (3, ""), (4, "x y x y x y")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: sorted(r.sh)
        for r in df.select("doc_id", word_shingles("text", 3).alias("sh")).collect()
    }
    assert got[1] == ["a b c", "b c d"]          # lowercased, sliding
    assert got[2] == [] and got[3] == []         # < k tokens -> empty
    assert got[4] == ["x y x", "y x y"]          # distinct applied


def test_word_ngrams_keeps_duplicates(spark):
    df = spark.createDataFrame([("a a a b",), ("solo",)], ["text"])
    got = [r.g for r in df.select(text.word_ngrams("text", 2).alias("g")).collect()]
    assert got[0] == ["a a", "a a", "a b"]  # multiset, not distinct
    assert got[1] == []


def test_repetition_features(spark):
    df = spark.createDataFrame([(1, "a a a b"), (2, "solo")], ["doc_id", "text"])
    rows = {r.doc_id: r for r in text.repetition_features(df).collect()}
    r1 = rows[1]
    assert r1.n_tokens == 4
    assert r1.distinct_token_frac == 2 / 4
    assert r1.top_token_frac == 3 / 4
    assert r1.top_bigram_frac == 2 / 3  # "a a" twice of 3 bigrams
    r2 = rows[2]
    assert r2.n_tokens == 1 and r2.top_bigram_frac == 0.0


def test_pii_redaction_and_counts(spark):
    t = "mail bob.smith+x@corp.example.org then 10.1.2.3 and call 555-0199 end"
    df = spark.createDataFrame([(t,)], ["text"])
    r = df.select(
        text.redact_pii("text").alias("red"),
        text.pii_count("text", "email").alias("ne"),
        text.pii_count("text", "ip").alias("ni"),
        text.pii_count("text", "phone").alias("np"),
    ).collect()[0]
    assert r.red == "mail <EMAIL> then <IP> and call <PHONE> end"
    assert (r.ne, r.ni, r.np) == (1, 1, 1)


def test_pii_redaction_clean_text_untouched(spark):
    df = spark.createDataFrame([("no pii here at all",)], ["text"])
    r = df.select(text.redact_pii("text").alias("red")).collect()[0]
    assert r.red == "no pii here at all"


def test_ngram_lang_id_separates_real_char_distributions(spark):
    """Train/test on corpora with genuinely distinct character statistics
    (the driver's synthetic documents share one vocabulary across lang
    labels, so label recovery there is impossible by design — x43's gate
    is cross-engine parity instead)."""
    from airbnb_listings_data_pipelines_spark.operators.text import (
        lang_id_ngram,
        ngram_lang_profiles,
    )

    en = "the quick brown fox jumps over the lazy dog while the other dogs watch"
    fr = "le renard brun saute par dessus le chien paresseux pendant que les autres chiens regardent"
    de = "der schnelle braune fuchs springt über den faulen hund während die anderen hunde zuschauen"
    train = spark.createDataFrame(
        [(i, t, lang) for i, (t, lang) in enumerate([(en, "en"), (fr, "fr"), (de, "de")])],
        ["doc_id", "text", "lang"],
    )
    profiles = ngram_lang_profiles(train)
    test = spark.createDataFrame(
        [
            (10, "the dog jumps over the brown fox", "en"),
            (11, "le chien saute par dessus les autres", "fr"),
            (12, "der hund springt über die braune füchse", "de"),
        ],
        ["doc_id", "text", "lang"],
    )
    pred = {r.doc_id: r.pred_lang for r in lang_id_ngram(test, profiles).collect()}
    truth = {r.doc_id: r.lang for r in test.collect()}
    assert pred == truth, f"{pred} != {truth}"
    # profile table is bounded: <= langs x top_k rows
    assert profiles.count() <= 3 * 40


def test_ngram_lang_id_unmatched_doc_is_und(spark):
    from airbnb_listings_data_pipelines_spark.operators.text import (
        lang_id_ngram,
        ngram_lang_profiles,
    )

    train = spark.createDataFrame(
        [(1, "the cat and the dog and the bird", "en")], ["doc_id", "text", "lang"]
    )
    profiles = ngram_lang_profiles(train)
    target = spark.createDataFrame([(9, "zzzzqqqq")], ["doc_id", "text"])
    out = lang_id_ngram(target, profiles).collect()
    assert out[0].pred_lang == "und"


def test_ngram_lang_id_profile_join_is_broadcast(spark):
    from airbnb_listings_data_pipelines_spark.operators.text import (
        lang_id_ngram,
        ngram_lang_profiles,
    )
    from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        lang_id_ngram(docs, ngram_lang_profiles(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_pack_sequence_spans_semantics(spark):
    """Hand-checkable packing: one shard, seq_len=5, docs of 3/4/5/2
    tokens -> stream of 14 tokens -> blocks [0,5) [5,10) [10,14).
    Spans are contiguous, block ranges follow the floor math, and the
    4-token doc spanning tokens [3,7) crosses the block boundary."""
    from airbnb_listings_data_pipelines_spark.operators.text import (
        pack_sequence_spans,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c"),
            (1, "d e f g"),
            (2, "h i j k l"),
            (3, "m n"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["tok_start"], r["tok_end"], r["first_block"], r["last_block"]
        )
        for r in pack_sequence_spans(
            docs, seq_len=5, shards=1
        ).collect()
    }
    assert got == {
        0: (0, 3, 0, 0),
        1: (3, 7, 0, 1),   # spans the block-0/1 boundary
        2: (7, 12, 1, 2),
        3: (12, 14, 2, 2),
    }


def test_pack_sequence_spans_drops_empty_and_shards(spark):
    from airbnb_listings_data_pipelines_spark.operators.text import (
        pack_sequence_spans,
    )

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "   "), (2, "c"), (3, "")],
        "doc_id long, text string",
    )
    rows = pack_sequence_spans(docs, seq_len=4, shards=2).collect()
    # empty/whitespace docs occupy no span; shard = doc_id % 2
    assert sorted((r["doc_id"], r["shard"]) for r in rows) == [(0, 0), (2, 0)]
    # each shard's stream starts at token 0 (packing never crosses shards)
    assert {r["tok_start"] for r in rows if r["tok_end"] == r["n_tokens"]} == {0}


def test_pack_sequence_spans_validation(spark):
    from airbnb_listings_data_pipelines_spark.operators.text import (
        pack_sequence_spans,
    )

    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequence_spans(docs, seq_len=0)
    with pytest.raises(ValueError, match="shards"):
        pack_sequence_spans(docs, shards=0)
