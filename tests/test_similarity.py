from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators import similarity
from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),   # close to 1
            (3, [0.0, 1.0, 0.0]),   # orthogonal to 1
            (4, [-1.0, 0.0, 0.0]),  # opposite of 1
        ],
        ["vec_id", "embedding"],
    )


def test_brute_force_topk_ordering(vecs):
    out = similarity.brute_force_topk(vecs, vecs.filter(F.col("vec_id") == 1), k=3)
    got = [(r.neighbor_id, round(r.cos_sim, 6)) for r in out.orderBy("rnk").collect()]
    assert [n for n, _ in got] == [2, 3, 4]
    assert got[1][1] == 0.0 and got[2][1] == -1.0


def test_lsh_recall_vs_brute_force(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_topk(emb, q, k=5)
    # dim via column metadata — the no-probe alternative to dim=64
    with_meta = emb.withColumn(
        "embedding", F.col("embedding").alias("embedding", metadata={"dim": 64})
    )
    q_meta = with_meta.filter(F.col("vec_id") < 8)
    approx = similarity.lsh_bucketed_topk(with_meta, q_meta, k=5)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 8 tables x 6 planes: union-of-tables recall on 64-dim embeddings
    assert recall >= 0.7, f"LSH recall too low: {recall}"


def test_ivf_recall_vs_brute_force(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    exact = similarity.brute_force_topk(emb, q, k=5)
    approx = similarity.ivf_topk(emb, q, k=5, num_centroids=8, nprobe=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # probing half the cells on a near-random corpus
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_arrow_udf_cosine_matches_jvm(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").limit(50)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    cos_udf = similarity.cosine_arrow_udf()
    both = pairs.select(
        "ia", "ib",
        similarity.cosine(F.col("va"), F.col("vb")).alias("jvm"),
        cos_udf(F.col("va"), F.col("vb")).alias("arrow"),
    ).collect()
    assert len(both) > 0
    for r in both:
        # numpy pairwise summation vs JVM sequential fold: equal to ~1e-12
        assert abs(r.jvm - r.arrow) <= 1e-9 * max(1.0, abs(r.jvm))


def test_hash_spread_sample_unbiased_across_id_ranges(spark):
    # The IVF fit sample must not collapse to the lowest ids (ids correlate
    # with source in concatenated corpora). hash_spread_sample(n=64) over
    # ids 0..9999 should hit many distinct 1000-wide id bands; the old
    # orderBy(id).limit(64) would hit exactly one.
    from airbnb_listings_data_pipelines_spark.operators.sampling import hash_spread_sample

    df = spark.range(10_000).withColumnRenamed("id", "vec_id")
    picked = [r.vec_id for r in hash_spread_sample(df, "vec_id", 64).collect()]
    assert len(picked) == 64
    bands = {i // 1000 for i in picked}
    assert len(bands) >= 8, f"sample concentrated in id bands {sorted(bands)}"
    # deterministic across invocations
    again = [r.vec_id for r in hash_spread_sample(df, "vec_id", 64).collect()]
    assert picked == again


def test_train_centroids_distributed_matches_structure(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = similarity.train_centroids_distributed(emb, num_centroids=4, iters=2)
    assert len(cents) == 4
    import math

    for c in cents:
        assert len(c) == 64
        n = math.sqrt(sum(x * x for x in c))
        assert abs(n - 1.0) < 1e-9  # spherical k-means: unit centroids
    # centroids from the full corpus still serve a working IVF index
    q = emb.filter(F.col("vec_id") < 4)
    exact = similarity.brute_force_topk(emb, q, k=5)
    approx = similarity.ivf_topk(emb, q, k=5, centroids=cents, nprobe=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.5


def test_ann_query_side_broadcast_guard(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb  # corpus-vs-corpus: query side too big to broadcast
    plan_bcast = similarity.lsh_bucketed_topk(
        emb, q.filter(F.col("vec_id") < 8), k=3, dim=64, broadcast_queries=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_bcast

    # auto mode with a tiny threshold must drop the broadcast hint; pin
    # autoBroadcastJoinThreshold off so Spark can't re-add it from size
    # stats (the sf0.001 tables are all broadcastable — at 100 TB they
    # aren't, which is the case the guard exists for)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_shuffle = similarity.lsh_bucketed_topk(
            emb, q, k=3, dim=64, broadcast_queries=None, broadcast_threshold_rows=10
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_shuffle

        plan_ivf_shuffle = similarity.ivf_topk(
            emb, q, k=3, num_centroids=8, broadcast_queries=False
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_ivf_shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # results identical either way: the hint changes strategy, not semantics
    small_q = emb.filter(F.col("vec_id") < 4)
    a = similarity.ivf_topk(emb, small_q, k=3, num_centroids=8, broadcast_queries=True)
    b = similarity.ivf_topk(emb, small_q, k=3, num_centroids=8, broadcast_queries=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_apply_in_pandas_group_centering(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    out = similarity.normalize_per_group(emb)
    assert out.count() == emb.count()
    import numpy as np

    pdf = out.toPandas()
    for label, grp in pdf.groupby("label"):
        mat = np.stack(grp["centered"].to_numpy())
        assert np.abs(mat.mean(axis=0)).max() < 1e-9  # centroid removed


def test_quantized_topk_recall_vs_float(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    quant = similarity.quantized_topk(emb, queries, k=5)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    qz = quant.collect()
    got = {(r.query_id, r.neighbor_id) for r in qz}
    # int8 quantization should preserve nearly all of the float top-5
    assert len(ex & got) / len(ex) >= 0.8
    # integer dot products stay in the int8 accumulation envelope
    assert all(abs(r.qdot) <= 127 * 127 * 64 for r in qz)
    assert all(isinstance(r.qdot, int) for r in qz)


def test_lsh_requires_dim_and_launches_no_preplan_job(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    # unknown dim -> hard error, never a silent full-scan probe job
    with pytest.raises(ValueError, match="dimension unknown"):
        similarity.lsh_bucketed_topk(emb, q, k=5)
    # building the plan with dim known must not launch ANY Spark job
    # (DAGScheduler's job counter is the ground truth)
    sched = spark.sparkContext._jsc.sc().dagScheduler()
    before = sched.numTotalJobs()
    similarity.lsh_bucketed_topk(emb, q, k=5, dim=64)
    assert sched.numTotalJobs() == before


def test_pq_recall_and_determinism(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    books = similarity.train_pq_codebooks(emb, m=16, ksub=16)
    assert len(books) == 16 and len(books[0]) == 16 and len(books[0][0]) == 4
    # fit is a pure function of the data (hash-spread sample + fixed iters)
    assert books == similarity.train_pq_codebooks(emb, m=16, ksub=16)
    exact = similarity.brute_force_topk(emb, q, k=5)
    approx = similarity.pq_topk(emb, q, books, k=5, shortlist=100)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"PQ recall too low: {recall}"


def test_pq_encode_codes_in_range(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    books = similarity.train_pq_codebooks(emb, m=8, ksub=16)
    codes = similarity.pq_encode(emb, books)
    rows = codes.select(
        F.size("pq_codes").alias("m"),
        F.array_min("pq_codes").alias("lo"),
        F.array_max("pq_codes").alias("hi"),
    ).agg(
        F.min("m"), F.max("m"), F.min("lo"), F.max("hi")
    ).collect()[0]
    assert rows[0] == rows[1] == 8
    assert rows[2] >= 0 and rows[3] <= 15


def test_pq_adc_scan_is_jvm_side(spark):
    """The ADC scoring stage must not evaluate Python per corpus row: the
    only Python in the plan is the Arrow-batched encode (ArrowEvalPython);
    row-at-a-time BatchEvalPython must never appear."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    books = similarity.train_pq_codebooks(emb, m=8, ksub=16)
    plan = similarity.pq_topk(emb, q, books, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan  # the encode pass
