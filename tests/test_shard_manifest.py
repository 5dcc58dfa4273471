"""Semantic properties of the round-5 curation queries beyond their
bit-exact oracles: shard-manifest seekability, dispersion identities,
coverage monotonicity."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.queries.registry import load_all

from .conftest import SF_SMALL


def test_shard_manifest_positions_and_offsets_are_seekable(spark):
    reg = load_all()
    rows = reg["x61_training_shard_manifest"].fn(spark, SF_SMALL).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(16))
    total_docs = sum(len(v) for v in by_shard.values())
    assert total_docs == len({r.doc_id for r in rows})  # every doc exactly once
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.pos)
        assert [r.pos for r in rs] == list(range(1, len(rs) + 1))  # dense positions
        # tok_offset is the running sum of previous docs' tokens (seek index)
        acc = 0
        for r in rs:
            assert r.tok_offset == acc, (shard, r)
            acc += r.n_tokens
    # the hash deal is roughly balanced (16 shards, 100 docs at sf0.001)
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 4 * max(1, min(sizes))


def test_shard_manifest_is_deterministic_across_runs(spark):
    reg = load_all()
    fn = reg["x61_training_shard_manifest"].fn
    a = {(r.doc_id): (r.shard, r.pos, r.tok_offset) for r in fn(spark, SF_SMALL).collect()}
    b = {(r.doc_id): (r.shard, r.pos, r.tok_offset) for r in fn(spark, SF_SMALL).repartition(7).collect()}
    assert a == b  # pure function of doc_id: partitioning-independent


def test_dispersion_zero_for_identical_vectors_and_positive_for_spread(spark):
    from airbnb_listings_data_pipelines_spark.operators import similarity

    def disperse(rows):
        emb = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
        scale = similarity.quantization_scale(emb)
        q = emb.crossJoin(F.broadcast(scale)).select(
            "label", similarity.quantize_int8("embedding", F.col("__qscale")).alias("q")
        )
        ex = q.select("label", F.posexplode("q").alias("dim", "v"))
        pd_ = ex.groupBy("label", "dim").agg(
            F.sum("v").alias("s"), F.sum(F.expr("v*v")).alias("ss"), F.count(F.lit(1)).alias("n")
        )
        out = pd_.groupBy("label").agg(F.sum(F.expr("n*ss - s*s")).alias("num")).collect()
        return {r.label: r.num for r in out}

    d = disperse(
        [
            (1, 0, [1.0, 1.0]),
            (2, 0, [1.0, 1.0]),  # identical pair: zero deviation
            (3, 1, [1.0, 0.0]),
            (4, 1, [-1.0, 0.0]),  # antipodal pair: max deviation
        ]
    )
    assert d[0] == 0
    assert d[1] > 0


def test_char_coverage_cumulative_is_monotone_and_bounded(spark):
    reg = load_all()
    rows = sorted(
        reg["x63_char_coverage"].fn(spark, SF_SMALL).collect(), key=lambda r: r.rnk
    )
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert all(a.n_occurrences >= b.n_occurrences for a, b in zip(rows, rows[1:]))
    ppm = [r.cum_ppm for r in rows]
    assert all(a < b for a, b in zip(ppm, ppm[1:]))  # strictly growing coverage
    assert ppm[-1] <= 1_000_000
    # the corpus is lowercase word soup: space must dominate
    assert rows[0].ch == " "


def test_cross_source_dup_matrix_brute_force(spark):
    """x64 against a hand-computed overlap on a tiny corpus, including the
    containment (smaller-source) normalization and the a<b orientation."""
    rows = [
        (1, "alpha", "s1"), (2, "beta", "s1"), (3, "gamma", "s1"),
        (4, "alpha", "s2"), (5, "beta", "s2"),
        (6, "alpha", "s3"),
        (7, "alpha", "s1"),  # within-source dup must not inflate the pair count
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    # same shared-pair math as the x64 registry query (which reads from
    # sf_dir and additionally zero-fills the full source-pair matrix),
    # over the hand-built frame
    ds = docs.select(F.md5("text").alias("h"), "source").distinct()
    per_source = ds.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = ds.select("h", F.col("source").alias("source_a"))
    b = ds.select("h", F.col("source").alias("source_b"))
    pairs = a.join(b, "h").filter(F.col("source_a") < F.col("source_b"))
    out = (
        pairs.groupBy("source_a", "source_b").agg(F.count(F.lit(1)).alias("k"))
        .join(per_source.select(F.col("source").alias("source_a"), F.col("n").alias("na")), "source_a")
        .join(per_source.select(F.col("source").alias("source_b"), F.col("n").alias("nb")), "source_b")
        .select("source_a", "source_b", "k", F.expr("k * 1000000L div least(na, nb)").alias("ppm"))
    )
    got = {(r.source_a, r.source_b): (r.k, r.ppm) for r in out.collect()}
    # s1 has texts {alpha,beta,gamma} (n=3), s2 {alpha,beta} (2), s3 {alpha} (1)
    assert got[("s1", "s2")] == (2, 2 * 1_000_000 // 2)
    assert got[("s1", "s3")] == (1, 1_000_000)
    assert got[("s2", "s3")] == (1, 1_000_000)
    assert all(p <= 1_000_000 for _k, p in got.values())


def test_cross_source_dup_matrix_single_corpus_scan(spark):
    """x64's three branches (pairs, per-source a, per-source b) must read
    the materialized per-digest aggregate, not re-scan the corpus: the
    query plan contains no parquet scan (the one scan ran at checkpoint
    time)."""
    reg = load_all()
    df = reg["x64_cross_source_dup_matrix"].fn(spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan, plan


def test_rolling_distinct_window_matches_brute_force(spark):
    """q74 vs a per-day brute force on the driver data: the trailing
    window must contain exactly the users of days d-6..d."""
    reg = load_all()
    from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

    got = {
        r.window_day: (r.rolling_users, r.rolling_events)
        for r in reg["q74_rolling_distinct_window"].fn(spark, SF_SMALL).collect()
    }
    ev = (
        load_table(spark, SF_SMALL, "events")
        .select(F.unix_timestamp(F.date_trunc("day", "ts")).alias("d"), "user_id")
        .collect()
    )
    from collections import defaultdict

    by_day = defaultdict(list)
    for r in ev:
        by_day[r.d].append(r.user_id)
    for d in by_day:
        users, events = set(), 0
        for off in range(7):
            prev = d - off * 86400
            users.update(by_day.get(prev, []))
            events += len(by_day.get(prev, []))
        assert got[d] == (len(users), events), d
    assert set(got) == set(by_day)  # only days that exist in the data


def test_unigram_tv_distance_bounds_and_extremes(spark):
    """TV on the ppm grid: ~0 for a source that IS the corpus distribution,
    near 1e6 for a disjoint-vocabulary source, always within [0, 1e6]."""
    reg = load_all()
    docs = spark.createDataFrame(
        [
            (1, "a b c a b c", "s_same1"),
            (2, "a b c a b c", "s_same2"),   # two identical sources
            (3, "zz yy xx zz yy xx", "s_diff"),  # disjoint vocabulary
        ],
        ["doc_id", "text", "source"],
    )
    import airbnb_listings_data_pipelines_spark.queries.extensions as ext
    from airbnb_listings_data_pipelines_spark.sources import tpch

    orig = tpch.load_table
    try:
        tpch_load = lambda sp, sf, name: docs  # noqa: E731
        ext.load_table = tpch_load
        out = {r.source: r for r in ext.x65_unigram_tv_distance(spark, "ignored").collect()}
    finally:
        ext.load_table = orig
    assert all(0 <= r.tv_ppm <= 1_000_000 for r in out.values())
    # corpus = 2/3 abc-words + 1/3 xyz-words: the identical abc sources sit
    # at TV ~ 1/3, the disjoint source at TV ~ 2/3 — strictly ordered
    assert out["s_same1"].tv_ppm == out["s_same2"].tv_ppm
    assert out["s_diff"].tv_ppm > out["s_same1"].tv_ppm
    assert abs(out["s_same1"].tv_ppm - 333_333) < 10
    assert abs(out["s_diff"].tv_ppm - 666_666) < 10


def test_threshold_curve_is_monotone_and_consistent(spark):
    """x67 invariants: cumulative counts are non-decreasing in the
    threshold, affected docs are bounded by 2*pairs, exactly 4 spine rows
    exist, and the curve agrees with the raw x16 pair distribution."""
    reg = load_all()
    rows = sorted(
        reg["x67_neardup_threshold_curve"].fn(spark, SF_SMALL).collect(),
        key=lambda r: r.hamming_threshold,
    )
    assert [r.hamming_threshold for r in rows] == [0, 1, 2, 3]
    assert all(a.n_pairs_le <= b.n_pairs_le for a, b in zip(rows, rows[1:]))
    assert all(a.n_docs_affected <= b.n_docs_affected for a, b in zip(rows, rows[1:]))
    for r in rows:
        assert r.n_docs_affected <= 2 * r.n_pairs_le
        assert 0 <= r.affected_ppm <= 1_000_000
    from collections import Counter

    pairs = reg["x16_simhash_neardup_pairs"].fn(spark, SF_SMALL).collect()
    dist = Counter(p.hamming for p in pairs)
    for r in rows:
        assert r.n_pairs_le == sum(v for h, v in dist.items() if h <= r.hamming_threshold)
