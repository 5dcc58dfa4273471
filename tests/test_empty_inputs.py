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


def test_empty_text_docs_match_oracle(spark):
    """Empty/whitespace-only docs: x31 keeps them with n_tokens=0 and zero
    fractions; x32 gives them zero lines — and both engines agree. Guards
    the F.sequence(0, -1) phantom-line trap (step defaults to -1 when
    start > stop) and the explode-drops-empty-arrays row loss."""
    import duckdb

    from airbnb_listings_data_pipelines_spark.operators import dedup, text
    from airbnb_listings_data_pipelines_spark.queries.registry import load_all

    reg = load_all()
    docs = spark.createDataFrame(
        [
            (1, "a a a b"),
            (2, ""),            # empty
            (3, "    "),        # space-only: trim -> '' -> zero tokens
            # tab inside spaces: trim strips only U+0020 on BOTH engines, the
            # '\t' remnant splits to two empty tokens on BOTH engines — pinned
            # below as consistent (if odd) rather than papered over.
            (4, "  \t  "),
            (5, "x y z a b c"),
            (6, "x y z"),
        ],
        ["doc_id", "text"],
    )
    docs_pd = docs.toPandas()

    con = duckdb.connect()
    con.register("documents", docs_pd)

    def canon(df):
        df = df[sorted(df.columns)]
        return sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False))

    rep = text.repetition_features(docs).toPandas()
    rep_oracle = con.sql(reg["x31_repetition_stats"].oracle).df()
    assert sorted(rep.columns) == sorted(rep_oracle.columns)
    assert canon(rep) == canon(rep_oracle)
    by_id = {int(r.doc_id): r for r in rep.itertuples(index=False)}
    assert by_id[2].n_tokens == 0 and by_id[2].distinct_token_frac == 0.0
    assert by_id[3].n_tokens == 0
    assert by_id[4].n_tokens == 2  # tab remnant: both engines see 2 empty tokens

    cld = dedup.corpus_line_dedup(docs, line_len=3, max_occurrences=2).toPandas()
    cld_oracle = con.sql(reg["x32_corpus_line_dedup"].oracle).df()
    assert sorted(cld.columns) == sorted(cld_oracle.columns)
    assert canon(cld) == canon(cld_oracle)
    by_id = {int(r.doc_id): r for r in cld.itertuples(index=False)}
    assert by_id[2].n_lines == 0 and by_id[2].n_kept == 0 and by_id[2].new_text == ""
    assert by_id[3].n_lines == 0


def test_round4_ops_on_empty_and_whitespace_docs(spark):
    """The round-4 text/retrieval/dedup additions must survive zero-row
    AND empty/whitespace-text inputs (the round-3 advisor's divergence
    class) with correct schemas and no phantom rows."""
    from airbnb_listings_data_pipelines_spark.operators import bloom, retrieval, sampling

    empty = _empty_docs(spark)
    assert retrieval.bm25_postings(empty).count() == 0
    assert dedup.remove_duplicate_spans(empty).count() == 0
    assert dedup.duplicate_span_coverage(empty).count() == 0
    assert sampling.dsir_importance_scores(empty, is_target=F.col("source") == "src0").count() == 0

    ws = spark.createDataFrame(
        [(1, "", "en", "src0", 0), (2, "   ", "en", "src1", 3),
         (3, "real words here", "en", "src1", 15)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # whitespace-only docs: zero tokens -> zero postings/spans, no crash
    assert retrieval.bm25_postings(ws).filter(F.col("doc_id") != 3).count() == 0
    spans = {r.doc_id: r for r in dedup.remove_duplicate_spans(ws).collect()}
    assert spans[1].n_tokens == 0 and spans[1].new_text == ""
    assert spans[2].n_tokens == 0 and spans[2].n_removed == 0

    # bloom over zero keys: empty filter, every probe negative
    nokeys = spark.createDataFrame([], "key string")
    filt = bloom.bloom_build(nokeys, "key")
    assert filt.count() == 0
    probe = spark.createDataFrame([("a",), ("b",)], ["key"])
    out = bloom.bloom_probe(probe, filt, "key", ["key"])
    assert out.filter(F.col("maybe_present") == 1).count() == 0


def test_semdedup_and_pagerank_on_empty(spark):
    from airbnb_listings_data_pipelines_spark.operators import graph

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert dedup.semdedup_prune(emb).count() == 0
    edges = spark.createDataFrame([], "src long, dst long, w long")
    nodes = spark.createDataFrame([], "node long")
    assert graph.pagerank_integer(edges, nodes).count() == 0
