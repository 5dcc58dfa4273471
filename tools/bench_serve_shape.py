"""Serve-shape scaling probe for the retrieval belt.

The registry shapes of x49/x59 (and x34/x37 before them) replicate the
QUERY SET together with the corpus (queries are carved out of the corpus by
``doc_id % 53``), so a corpus replication factor f multiplies scored pairs
by ~f^2 — an adversarial artifact of the oracle-registry construction, not
of the operators. The production ("serve") shape holds the query batch
FIXED at its sf0.1 size while the corpus grows: a deployment's query batch
is bounded by serving traffic, not by corpus size.

This probe times exactly that: corpus at 1x and at ``factor``x (key-offset
replicas via bench_scaling.replicate), query batch always built from the
1x tables. Near-flat ratios mean the corpus-side work (postings build, one
term shuffle, streamed cosine scan) is linear and absorbed by idle cores;
the numbers land in SCALING.md next to the registry-shape rows.

Usage: python tools/bench_serve_shape.py [factor] [ops...]   (default 30)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators import retrieval, similarity
from airbnb_listings_data_pipelines_spark.operators import text
from airbnb_listings_data_pipelines_spark.session import get_spark
from airbnb_listings_data_pipelines_spark.sources.tpch import load_table
from tools.bench_scaling import SRC, replicate


def _fixed_query_terms(spark: SparkSession) -> DataFrame:
    """x49/x59's lexical query batch, always from the 1x documents table."""
    docs = load_table(spark, SRC, "documents")
    return (
        docs.filter((F.col("doc_id") % 53 == 0) & (F.length(F.trim("text")) > 0))
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(text.tokens(F.lower(F.col("text")))).alias("term"),
        )
        .distinct()
    )


def _fixed_query_vecs(spark: SparkSession) -> DataFrame:
    emb = load_table(spark, SRC, "embeddings")
    return emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )


def x49_serve(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """BM25 serve shape: fixed query batch, corpus-sized postings."""
    postings = retrieval.bm25_postings(load_table(spark, corpus_dir, "documents"))
    return retrieval.bm25_topk(postings, _fixed_query_terms(spark), k=5)


def x59_serve(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """Hybrid RRF serve shape: fixed query batch for BOTH legs."""
    postings = retrieval.bm25_postings(load_table(spark, corpus_dir, "documents"))
    lex = retrieval.bm25_topk(postings, _fixed_query_terms(spark), k=20).select(
        "q_id", "doc_id", F.col("rnk").alias("lr")
    )
    emb = load_table(spark, corpus_dir, "embeddings")
    wd = Window.partitionBy("q_id").orderBy(F.desc("__cs"), F.asc("doc_id"))
    dense = (
        emb.crossJoin(F.broadcast(_fixed_query_vecs(spark)))
        .select(
            "q_id",
            F.col("vec_id").alias("doc_id"),
            similarity.cosine(F.col("qe"), F.col("embedding")).alias("__cs"),
        )
        .withColumn("rnk", F.row_number().over(wd))
        .filter(F.col("rnk") <= 20)
        .select("q_id", "doc_id", F.col("rnk").alias("dr"))
    )
    fused = lex.join(dense, ["q_id", "doc_id"], "full_outer").select(
        "q_id",
        "doc_id",
        (
            F.coalesce(F.expr("1000000000L div (60 + lr)"), F.lit(0))
            + F.coalesce(F.expr("1000000000L div (60 + dr)"), F.lit(0))
        ).alias("rrf"),
    )
    wf = Window.partitionBy("q_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return fused.withColumn("rnk", F.row_number().over(wf)).filter(F.col("rnk") <= 5)


OPS = {"x49_serve": x49_serve, "x59_serve": x59_serve}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    names = sys.argv[2:] or list(OPS)
    big = tempfile.mkdtemp(prefix="sfserve_")
    spark = get_spark("serve-shape")
    spark.sparkContext.setLogLevel("ERROR")
    replicate(spark, big, factor)

    def run(corpus_dir: str) -> dict[str, float]:
        out = {}
        for name in names:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                OPS[name](spark, corpus_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
        return out

    base = run(SRC)
    scaled = run(big)
    report = {
        n: {
            "sf0.1_s": base[n],
            f"x{factor}_s": scaled[n],
            "ratio": round(scaled[n] / base[n], 2),
        }
        for n in names
    }
    print(json.dumps({"factor": factor, "shape": "serve(fixed-query-batch)", "queries": report}))
    spark.stop()


if __name__ == "__main__":
    main()
