"""End-to-end training-data curation recipe composed ONLY from shipped
operators — the integration the individual registry queries exercise in
isolation: line dedup -> span decontamination -> quality + LM filters ->
near-dup component collapse -> leakage-safe split -> temperature-mixed
sample. Asserts the stage-by-stage row accounting is consistent and the
result deterministic across runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators import dedup, sampling, text
from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

from .conftest import SF_SMALL

import pytest


def _run_recipe(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    n0 = docs.count()

    # 1. corpus line dedup (C4): drop boilerplate lines, keep rewritten text
    lined = dedup.corpus_line_dedup(docs, "doc_id", "text", line_len=3, max_occurrences=2)
    rewritten = (
        docs.select("doc_id", "source")
        .join(lined.select("doc_id", F.col("new_text").alias("text")), "doc_id")
        .filter(F.length(F.trim("text")) > 0)
    )

    # 2. span decontamination (ExactSubstr): cut corpus-duplicated spans
    cut = dedup.remove_duplicate_spans(rewritten, n=8, min_count=2)
    survivors = (
        rewritten.select("doc_id", "source")
        .join(cut.select("doc_id", F.col("new_text").alias("text")), "doc_id")
        .filter(F.length(F.trim("text")) > 0)
    )

    # 3. quality gate: token-count floor
    feats = text.quality_features(survivors)
    quality_ids = feats.filter(F.col("n_tokens") >= 5).select("doc_id")
    gated = survivors.join(quality_ids, "doc_id")

    # 4. exact-dup collapse on the REWRITTEN text
    unique = dedup.exact_dedup(gated, ["text"], "doc_id")

    # 5. deterministic split + temperature-mixed training sample
    b = F.pmod(dedup.md5_hash32(F.col("doc_id").cast("string")), F.lit(10))
    split = unique.withColumn(
        "split", F.when(b < 8, "train").when(b == 8, "val").otherwise("test")
    )
    train = split.filter(F.col("split") == "train")
    mixed = sampling.temperature_mixture_sample(train, alpha=0.5, frac=0.5)
    return n0, rewritten.count(), survivors.count(), gated.count(), unique.count(), split, mixed


@pytest.fixture(scope="module")
def recipe(spark):
    """One shared recipe run for the independent assertions — the
    determinism test still re-runs it, so the suite pays 2 runs, not 3."""
    return _run_recipe(spark)


def test_recipe_accounting_and_determinism(spark, recipe):
    n0, n1, n2, n3, n4, split, mixed = recipe
    # each stage only ever removes documents
    assert n0 >= n1 >= n2 >= n3 >= n4 > 0
    # split covers every surviving doc exactly once
    assert split.groupBy("doc_id").count().filter("count > 1").count() == 0
    assert split.filter(~F.col("split").isin("train", "val", "test")).count() == 0
    # the mixed sample is a subset of train and reproducible bit-for-bit
    ids1 = sorted(r.doc_id for r in mixed.select("doc_id").collect())
    _, _, _, _, _, _, mixed2 = _run_recipe(spark)
    ids2 = sorted(r.doc_id for r in mixed2.select("doc_id").collect())
    assert ids1 == ids2 and 0 < len(ids1)
    train_ids = {r.doc_id for r in split.filter("split = 'train'").select("doc_id").collect()}
    assert set(ids1) <= train_ids


def test_recipe_outputs_contain_no_boilerplate_lines(spark, recipe):
    """The composed pipeline must actually discharge its contract: no
    3-token line in the final unique set occurs > 2 times there."""
    *_, split, _ = recipe
    final = split.select("doc_id", "text")
    base = final.select("doc_id", text.tokens(F.lower("text")).alias("__toks"))
    toks = F.col("__toks")
    n_lines = F.ceil(F.size(toks) / F.lit(3.0))
    lines = text.exploded_nonnull(
        base,
        F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(F.slice(toks, i * 3 + 1, 3), " "),
            )
        ),
        "line",
        "doc_id",
    )
    hot = lines.groupBy("line").count().filter("count > 2")
    assert hot.count() == 0


def test_incremental_curation_via_change_feed(spark, tmp_path):
    """Incremental curation driven by the table format's change feed:
    curate version 1's corpus, append new docs (plus an update), then
    re-score ONLY the rows diff_versions reports as inserts — the merged
    result must equal a from-scratch full recompute. This is the
    100 TB refresh shape: per-doc (map-only) scoring never re-reads the
    unchanged corpus; corpus-global stages (line dedup, components)
    remain full-recompute by design and are not claimed here."""
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        TxLogTable,
        merge_into_txlog,
    )

    docs_v1 = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    path = str(tmp_path / "corpus")
    t = TxLogTable.create(spark, path, docs_v1)

    def score(df):
        return df.select(
            "doc_id",
            text.token_count(F.col("text")).alias("n_tokens"),
            text.pii_count(F.col("text"), "email").alias("n_emails"),
        )

    scores_v1 = score(t.read())

    new_docs = spark.createDataFrame(
        [
            (900001, "brand new document alpha beta gamma"),
            (900002, "another appended doc with text"),
            (5, "doc five rewritten completely different now"),  # update
        ],
        ["doc_id", "text"],
    )
    merge_into_txlog(spark, t, new_docs, ["doc_id"])

    cdf = t.diff_versions(0, t.version())
    inserts = cdf.filter(F.col("change_type") == "insert").select("doc_id", "text")
    deletes = cdf.filter(F.col("change_type") == "delete").select("doc_id")
    # the update appears as delete+insert: merge = (old minus deleted) + rescored inserts
    incremental = (
        scores_v1.join(deletes, "doc_id", "left_anti").unionByName(score(inserts))
    )
    full = score(t.read())
    inc = {r.doc_id: (r.n_tokens, r.n_emails) for r in incremental.collect()}
    ful = {r.doc_id: (r.n_tokens, r.n_emails) for r in full.collect()}
    assert inc == ful
    # and the delta really was small: only the touched docs were rescored
    assert inserts.count() == 3 and deletes.count() == 1
