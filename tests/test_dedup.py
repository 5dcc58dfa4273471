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


def test_salted_agg_equals_direct(spark):
    from pyspark.sql import functions as F

    from airbnb_listings_data_pipelines_spark.operators.skew import (
        salted_agg,
        salted_count_distinct,
    )
    from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

    from .conftest import SF_SMALL

    li = load_table(spark, SF_SMALL, "lineitem").withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(18,2)")
    )
    direct = {
        r.l_returnflag: (str(r.s), r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("qty_dec").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r.l_returnflag: (str(r.s), r.n)
        for r in salted_agg(
            li, ["l_returnflag"], ["l_orderkey"],
            {"s": ("sum", "qty_dec"), "n": ("count", "l_orderkey")},
        ).collect()
    }
    assert direct == salted

    o = load_table(spark, SF_SMALL, "orders")
    direct_cd = {
        r.o_orderstatus: r.n
        for r in o.groupBy("o_orderstatus").agg(F.countDistinct("o_custkey").alias("n")).collect()
    }
    salted_cd = {
        r.o_orderstatus: r.n_distinct
        for r in salted_count_distinct(o, ["o_orderstatus"], "o_custkey").collect()
    }
    assert direct_cd == salted_cd


def test_approx_sketches_bounded_error(spark):
    from pyspark.sql import functions as F

    from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

    from .conftest import SF_SMALL

    li = load_table(spark, SF_SMALL, "lineitem")
    both = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact_cd"),
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_cd"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact_med"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_med"),
        )
        .collect()
    )
    for r in both:
        assert abs(r.approx_cd - r.exact_cd) / r.exact_cd < 0.05
        assert abs(r.approx_med - r.exact_med) / r.exact_med < 0.02


def test_simhash_neardup_pairs_bands(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),  # identical
            (3, "pelican architecture summary document completely unrelated words"),
        ],
        ["doc_id", "text"],
    )
    got = {(r.id_a, r.id_b): r.hamming for r in dedup.simhash_neardup_pairs(df).collect()}
    assert got.get((1, 2)) == 0          # identical docs: distance 0
    assert (1, 3) not in got and (2, 3) not in got


def test_corpus_line_dedup_drops_boilerplate(spark):
    # "x y z" appears in 3 docs -> every copy dropped; doc 3 is ONLY
    # boilerplate and survives with empty text; unique lines survive.
    docs = spark.createDataFrame(
        [
            (1, "x y z a b c"),
            (2, "x y z d e f"),
            (3, "x y z"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in dedup.corpus_line_dedup(
            docs, line_len=3, max_occurrences=2
        ).collect()
    }
    assert out[1].n_lines == 2 and out[1].n_kept == 1 and out[1].new_text == "a b c"
    assert out[2].new_text == "d e f"
    assert out[3].n_kept == 0 and out[3].new_text == ""


def test_winnowing_matches_python_reference(spark):
    """Bit-exact vs a from-the-paper Python implementation, including the
    rightmost-min tie rule and the short/empty-doc edge cases."""
    import hashlib

    K, W = 3, 4
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),
        (3, "a a a a a a a a"),  # all-equal hashes exercise the tie rule
        (4, "tiny doc"),  # < k tokens -> no fingerprints
        (5, ""),  # empty -> no fingerprints
        (6, "a b c d e"),  # fewer grams than the window -> single window
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.pos, r.fp)
        for r in dedup.winnowing_fingerprints(
            df, k=K, window=W, hash_fn=dedup.md5_hash32
        ).collect()
    )

    def md5h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    ref = []
    for doc_id, txt in rows:
        toks = txt.strip().lower().split() if txt.strip() else []
        hs = [md5h(" ".join(toks[i : i + K])) for i in range(len(toks) - K + 1)]
        n = len(hs)
        if n == 0:
            continue
        sels = set()
        for j in range(max(n - W, 0) + 1):
            mn = min(hs[j : j + W])
            sels.add(max(i for i in range(j, min(j + W, n)) if hs[i] == mn))
        ref.extend((doc_id, p + 1, hs[p]) for p in sorted(sels))
    assert got == sorted(ref)


def test_winnowing_shared_run_guarantee(spark):
    """The paper's guarantee: two docs sharing a token run of length
    >= window + k - 1 MUST share at least one fingerprint."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = 4 + 3 - 1
    df = spark.createDataFrame(
        [
            (1, "x1 y1 " + shared + " z1 w1"),
            (2, "p2 q2 r2 " + shared + " s2"),
            (3, "nothing in common with the others at all"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.winnowing_neardup_pairs(
            df, k=3, window=4, min_shared=1, hash_fn=dedup.md5_hash32
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_winnowing_map_only_plan(spark):
    """Fingerprinting itself must be shuffle-free (map-only per-doc array
    fold) — the property that makes it linear at 100 TB."""
    df = spark.createDataFrame([(1, "a b c d e f g h")], ["doc_id", "text"])
    plan = dedup.winnowing_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_duplicate_span_coverage_marks_shared_run(spark):
    # docs 1 and 2 share a verbatim 10-token run -> with n=4 spans, the run
    # yields 7 dup spans covering all 10 tokens of doc 1; doc 3 is unique.
    shared = "a b c d e f g h i j"
    rows = [
        (1, shared),
        (2, shared + " tail only here"),
        (3, "k l m n o p q r s t"),
        (4, ""),  # empty doc: kept, all-zero
        (5, "x y"),  # shorter than n: kept, zero spans
        (6, "r r r r r r"),  # within-doc repetition counts too (n=4: 3 spans, same gram)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in dedup.duplicate_span_coverage(df, n=4, min_count=2).collect()
    }
    d1 = out[1]
    assert (d1.n_tokens, d1.n_spans, d1.dup_spans, d1.dup_tokens) == (10, 7, 7, 10)
    assert d1.dup_fraction == 1.0
    d2 = out[2]
    assert d2.n_tokens == 13 and d2.dup_spans == 7 and d2.dup_tokens == 10
    assert abs(d2.dup_fraction - 10 / 13) < 1e-12
    d3 = out[3]
    assert (d3.dup_spans, d3.dup_tokens, d3.dup_fraction) == (0, 0, 0.0)
    assert (out[4].n_tokens, out[4].n_spans, out[4].dup_fraction) == (0, 0, 0.0)
    assert (out[5].n_tokens, out[5].n_spans, out[5].dup_spans) == (2, 0, 0)
    d6 = out[6]
    # "r r r r" occurs 3 times within doc 6 alone -> all 3 spans dup,
    # covering all 6 tokens
    assert (d6.dup_spans, d6.dup_tokens, d6.dup_fraction) == (3, 6, 1.0)


def test_leakage_safe_split_invariants(spark):
    from airbnb_listings_data_pipelines_spark.queries.registry import load_all
    from .conftest import SF_SMALL

    reg = load_all()
    split = reg["x46_leakage_safe_split"].fn(spark, SF_SMALL).cache()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    # every document assigned exactly once
    assert split.count() == docs.count()
    assert split.select("doc_id").distinct().count() == docs.count()
    # group atomicity: one split per group
    assert (
        split.groupBy("group_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )
    # exact duplicates (same text) can never straddle splits
    j = (
        docs.alias("a")
        .join(docs.alias("b"), F.col("a.text") == F.col("b.text"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("ia"), F.col("b.doc_id").alias("ib"))
    )
    pair_splits = (
        j.join(split.select(F.col("doc_id").alias("ia"), F.col("split").alias("sa")), "ia")
        .join(split.select(F.col("doc_id").alias("ib"), F.col("split").alias("sb")), "ib")
    )
    assert pair_splits.filter(F.col("sa") != F.col("sb")).count() == 0
    # deterministic: re-running yields the identical assignment
    again = reg["x46_leakage_safe_split"].fn(spark, SF_SMALL)
    assert split.exceptAll(again).count() == 0 and again.exceptAll(split).count() == 0
    split.unpersist()


def test_semdedup_prunes_within_cluster_duplicates(spark):
    # three exact-direction duplicates + two orthogonal singletons
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0, 0.0]),   # same direction as 0 -> cos 1.0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [3.0, 0.0, 0.0, 0.0]),   # same direction as 0/1
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in dedup.semdedup_prune(emb, n_clusters=2, tau=0.9).collect()}
    assert len(out) == 5
    dup_group = [0, 1, 4]
    clusters = {out[i].cluster for i in dup_group}
    assert len(clusters) == 1  # identical directions share a cluster
    kept_dups = [i for i in dup_group if out[i].kept == 1]
    assert kept_dups == [min(dup_group)]  # min-id representative survives
    assert out[2].kept == 1 and out[3].kept == 1  # orthogonal vecs untouched


def test_semdedup_drops_are_witnessed_by_smaller_neardup(spark):
    """Every dropped vec must have a smaller-id tau-neighbor (the one-shot
    rule's invariant) — cross-checked against the exact pair set."""
    from airbnb_listings_data_pipelines_spark.operators import similarity
    from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

    from .conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    out = dedup.semdedup_prune(emb, n_clusters=8, tau=0.4)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    witnesses = (
        a.join(b, F.col("ia") < F.col("ib"))
        .filter(similarity.cosine(F.col("va"), F.col("vb")) >= 0.4)
        .select(F.col("ib").alias("vec_id"))
        .distinct()
    )
    orphan_drops = (
        out.filter(F.col("kept") == 0).join(witnesses, "vec_id", "left_anti")
    )
    assert orphan_drops.count() == 0


def test_remove_duplicate_spans_consistent_with_coverage(spark):
    """x56's n_removed must equal x45's dup_tokens doc-for-doc (the same
    covered-position set drives both), and untouched docs keep every
    token."""
    from .conftest import SF_SMALL
    from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    cov = {
        r.doc_id: r
        for r in dedup.duplicate_span_coverage(docs, n=8, min_count=2).collect()
    }
    cut = {
        r.doc_id: r
        for r in dedup.remove_duplicate_spans(docs, n=8, min_count=2).collect()
    }
    assert set(cov) == set(cut)
    for did, c in cov.items():
        r = cut[did]
        assert r.n_removed == c.dup_tokens
        n_out = len(r.new_text.split()) if r.new_text else 0
        assert n_out == r.n_tokens - r.n_removed


def test_remove_duplicate_spans_handmade(spark):
    shared = "a b c d e f g h"  # one exact 8-token span shared by two docs
    rows = [
        (1, shared + " unique1 tail1"),
        (2, shared + " unique2 tail2"),
        (3, "totally different words here with no overlap at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dedup.remove_duplicate_spans(docs, n=8).collect()}
    assert out[1].n_removed == 8 and out[1].new_text == "unique1 tail1"
    assert out[2].n_removed == 8 and out[2].new_text == "unique2 tail2"
    assert out[3].n_removed == 0 and out[3].new_text.startswith("totally different")


def test_semdedup_zero_seed_fallback_keeps_corpus(spark):
    """Tiny input where the sqrt-rate hash threshold selects ZERO seeds
    (md5_hash32('1') and md5_hash32('2') both exceed floor(2^32/sqrt(2)))
    must fall back to fixed-k min-hash seeding instead of silently
    pruning the whole corpus."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    out = {r.vec_id: r for r in dedup.semdedup_prune(emb, tau=0.99).collect()}
    assert set(out) == {1, 2}  # corpus did NOT vanish
    assert all(r.kept == 1 for r in out.values())  # orthogonal, nothing pruned
    # two-level on the same tiny input exercises the coarse-cell fallback
    out2 = {r.vec_id: r for r in dedup.semdedup_prune(emb, tau=0.99, two_level=True).collect()}
    assert set(out2) == {1, 2}


def test_semdedup_two_level_assignment_invariants(spark):
    """Two-level (coarse-cell-routed) assignment must produce a valid
    clustering: every vector assigned to a REAL seed, seeds assigned to
    themselves, single-level's pick DOMINATES (it is the exact argmax,
    so the cell-restricted pick can never beat it), and — the round-5
    no-op regression guard — the two modes must NOT be identical on this
    data (the original coarse cut at 2^32/k^(1/4) made coarse == seeds,
    so two-level silently equaled single-level while doing more work)."""
    import math

    from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

    from .conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    one = {r.vec_id: r for r in dedup.semdedup_prune(emb, tau=0.4).collect()}
    two = {r.vec_id: r for r in dedup.semdedup_prune(emb, tau=0.4, two_level=True).collect()}
    assert set(one) == set(two)
    valid_clusters = {r.cluster for r in one.values()}
    assert {r.cluster for r in two.values()} <= valid_clusters  # real seeds only
    # seeds route to themselves (their own cell contains them at cos=1)
    for s in valid_clusters:
        assert two[s].cluster == s
    # exact-argmax dominance: cos(v, two's seed) <= cos(v, one's seed)
    vecs = {r.vec_id: r.embedding for r in emb.select("vec_id", "embedding").collect()}

    def _cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    for v in one:
        c1 = _cos(vecs[v], vecs[one[v].cluster])
        c2 = _cos(vecs[v], vecs[two[v].cluster])
        assert c2 <= c1 + 1e-12, (v, one[v].cluster, two[v].cluster)
    # non-degeneracy: the cell restriction must actually bite somewhere
    agree = sum(1 for v in one if one[v].cluster == two[v].cluster)
    assert agree < len(one), "two-level degenerated into single-level"
    # ... while still being a sane approximation, not noise
    assert agree / len(one) >= 0.25


def test_containment_detects_subset_that_jaccard_misses(spark):
    """A short doc quoted inside a long one: containment of the subset is
    ~1e6 while Jaccard stays low — the asymmetry x66 exists for."""
    short = "the quick brown fox jumps over the lazy dog"
    long = short + " " + "lorem ipsum dolor sit amet consectetur adipiscing elit " * 5
    docs = spark.createDataFrame([(1, short), (2, long)], ["doc_id", "text"])
    out = dedup.containment_pairs(docs, min_shared=1, hash_fn=dedup.md5_hash32)
    rows = {(r.id_a, r.id_b): r for r in out.collect()}
    r = rows[(1, 2)]
    assert r.cont_a_ppm == 1_000_000  # every shingle of the short doc is in the long one
    assert r.cont_b_ppm < 600_000     # but the long doc is NOT contained in the short
    # Jaccard on the same pair is low (inter/union dominated by the long doc)
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    assert all(row.jaccard < 0.6 for row in jac)


def test_containment_pairs_candidate_bounded(spark):
    """Docs sharing no winnowing fingerprint never reach the exact
    intersection: disjoint texts produce zero candidate pairs."""
    docs = spark.createDataFrame(
        [(1, "aaa bbb ccc ddd eee fff"), (2, "ggg hhh iii jjj kkk lll")],
        ["doc_id", "text"],
    )
    assert dedup.containment_pairs(docs, min_shared=1).count() == 0


def test_containment_matches_python_reference_on_random_corpora(spark):
    """Differential vs a pure-Python shingle-set reference on seeded random
    word-soup corpora: for every candidate pair the exact intersection and
    both ppm containments must match; candidate generation must be a
    subset of all pairs but include every heavy-overlap pair (winnowing
    guarantee on long shared runs)."""
    import random

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rng = random.Random(13)
    rows = []
    for d in range(8):
        n = rng.randrange(6, 14)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant a guaranteed subset pair: doc 100 is a verbatim slice of doc 101
    base = " ".join(rng.choice(vocab) for _ in range(12))
    rows.append((100, base))
    rows.append((101, base + " omega kappa"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): (r.shared_shingles, r.cont_a_ppm, r.cont_b_ppm)
        for r in dedup.containment_pairs(
            docs, min_shared=1, hash_fn=dedup.md5_hash32
        ).collect()
    }

    def shingles(t):
        t = t.lower()
        n = 3
        if len(t) <= n:
            return {t}
        return {t[i : i + n] for i in range(len(t) - n + 1)}

    sets = {d: shingles(t) for d, t in rows}
    for (a, b), (inter, ca, cb) in got.items():
        ref_inter = len(sets[a] & sets[b])
        assert inter == ref_inter, (a, b)
        assert ca == ref_inter * 1_000_000 // len(sets[a])
        assert cb == ref_inter * 1_000_000 // len(sets[b])
        assert inter <= min(len(sets[a]), len(sets[b]))
        assert ca <= 1_000_000 and cb <= 1_000_000
    assert (100, 101) in got
    assert got[(100, 101)][1] == 1_000_000  # the planted subset is detected


def test_incremental_lsh_probe_equals_full_restricted(spark):
    """A batch probed against the stored band index must produce
    EXACTLY the full-corpus LSH pairs restricted to batch-touching
    pairs — banding is per-document, so incremental == recompute."""
    rows = [
        (i, f"document number {i} with mostly shared filler text body")
        for i in range(20)
    ]
    # near-dups across the batch boundary and inside the batch
    rows += [
        (100, "the quick brown fox jumps over the lazy dog"),   # corpus
        (105, "the quick brown fox jumps over the lazy dog!"),  # batch
        (110, "the quick brown fox jumped over the lazy dog"),  # batch
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    batch = docs.filter("doc_id IN (105, 110, 0, 5)")
    corpus = docs.join(batch, "doc_id", "left_anti")
    index = dedup.lsh_band_index(corpus)
    inc = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_probe_pairs(
            batch, index, docs, verify_threshold=0.8
        ).collect()
    }
    batch_ids = {r["doc_id"] for r in batch.collect()}
    full = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(docs, verify_threshold=0.8).collect()
        if r["id_a"] in batch_ids or r["id_b"] in batch_ids
    }
    assert inc == full
    assert (100, 105) in inc  # cross-boundary near-dup found via index
    # index rows are per-document: appending the batch's bands equals
    # re-banding the whole corpus
    appended = index.unionByName(dedup.lsh_band_index(batch))
    rebanded = dedup.lsh_band_index(docs)
    assert appended.count() == rebanded.count()
    assert (
        appended.exceptAll(rebanded).count() == 0
        and rebanded.exceptAll(appended).count() == 0
    )
