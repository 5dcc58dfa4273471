"""Distributed BPE training vs a pure-Python reference implementation of
Sennrich et al. 2016 Algorithm 1 (learning AND encoding, including the
greedy left-to-right merge application and deterministic tie-breaks)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators import bpe

CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new newer"),
    (3, "wider wide wide widest low"),
    (4, ""),  # empty docs contribute no words
]


def _py_apply(syms, a, b):
    out, jm = [], False
    for s in syms:
        if not jm and out and out[-1] == a and s == b:
            out[-1] = a + b
            jm = True
        else:
            out.append(s)
            jm = False
    return out


def _py_learn(texts, n):
    wf = Counter(w for t in texts for w in t.lower().split())
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wf.items()}
    merges = []
    for _ in range(n):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
        new = {}
        for syms, c in vocab.items():
            t = tuple(_py_apply(list(syms), *best[0]))
            new[t] = new.get(t, 0) + c
        vocab = new
    return merges


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_learn_matches_python_reference(spark, corpus_df):
    stats = {}
    got = bpe.learn_bpe_merges(corpus_df, n_merges=12, stats=stats)
    assert got == _py_learn([t for _, t in CORPUS], 12)
    assert stats == {"stopped_early": False, "n_merges": 12, "driver_rounds": 12}


def test_batched_learning_bounds_driver_rounds(spark):
    """merge_batch=16 learns >=10 merges in <=2 driver rounds on a corpus
    of symbol-disjoint words (one round can batch all the letter-pair
    merges), and the batched merge list still encodes every word down to
    (word, '</w>')-style fused units."""
    words = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st", "uv", "wx"]
    df = spark.createDataFrame([(1, " ".join(words * 3))], ["doc_id", "text"])
    stats = {}
    got = bpe.learn_bpe_merges(df, n_merges=12, stats=stats, merge_batch=16)
    assert stats["n_merges"] >= 10
    assert stats["driver_rounds"] <= 2, stats
    # all 12 disjoint letter pairs are learned, counts exact at application
    assert {(w[0], w[1]) for w in words} <= set(got)
    enc = bpe.bpe_encode(df, got).collect()[0]
    # every word fused to at most 2 symbols ('ab' + '</w>' or 'ab</w>')
    assert len(enc.bpe_tokens) <= 2 * 3 * len(words)


def test_batched_picks_are_non_conflicting(spark):
    """A round's picks may not share symbols: with corpus 'ababab...' the
    top pairs (a,b) and (b,a) conflict, so one round keeps only (a,b) and
    (b,a)'s count is re-evaluated next round against the merged words —
    exactly what strict sequential training computes."""
    df = spark.createDataFrame([(1, "ababab ababab abab")], ["doc_id", "text"])
    stats = {}
    got = bpe.learn_bpe_merges(df, n_merges=3, stats=stats, merge_batch=4)
    assert got == bpe.learn_bpe_merges(df, n_merges=3)
    assert stats["driver_rounds"] >= 2  # (b,a) could not ride round 1


def test_encode_matches_python_reference(spark, corpus_df):
    merges = bpe.learn_bpe_merges(corpus_df, n_merges=10)
    enc = {r.doc_id: r.bpe_tokens for r in bpe.bpe_encode(corpus_df, merges).collect()}
    for did, text in CORPUS:
        ref = []
        for w in text.lower().split():
            syms = list(w) + ["</w>"]
            for a, b in merges:
                syms = _py_apply(syms, a, b)
            ref.extend(syms)
        assert enc[did] == ref, f"doc {did}"


def test_overlapping_pair_merges_greedily(spark):
    """'aaaa' with merge (a,a) must become ('aa','aa'), not ('aa','a','a')
    or a cascading ('aaa','a') — the just-merged flag in the fold."""
    df = spark.createDataFrame([(1, "aaaa aaaa")], ["doc_id", "text"])
    out = bpe.bpe_encode(df, [("a", "a")]).collect()[0]
    assert out.bpe_tokens == ["aa", "aa", "</w>", "aa", "aa", "</w>"]


def test_early_stop_when_no_repeated_pair(spark):
    df = spark.createDataFrame([(1, "xy")], ["doc_id", "text"])
    stats = {}
    merges = bpe.learn_bpe_merges(df, n_merges=5, stats=stats)
    assert merges == [] and stats["stopped_early"]


def test_merge_application_is_jvm_side(spark, corpus_df):
    """The per-row merge fold must stay in the JVM (no Python eval nodes)."""
    words = bpe.word_frequency_table(corpus_df).select(
        "count", bpe._chars(F.col("word")).alias("syms")
    )
    plan = (
        words.select(bpe.apply_merge(F.col("syms"), "l", "o").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
