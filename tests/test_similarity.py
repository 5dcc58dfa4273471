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
    approx = similarity.lsh_bucketed_topk(emb, q, k=5)
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


def test_apply_in_pandas_group_centering(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    out = similarity.normalize_per_group(emb)
    assert out.count() == emb.count()
    import numpy as np

    pdf = out.toPandas()
    for label, grp in pdf.groupby("label"):
        mat = np.stack(grp["centered"].to_numpy())
        assert np.abs(mat.mean(axis=0)).max() < 1e-9  # centroid removed
