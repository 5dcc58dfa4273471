"""Lexical retrieval: distributed inverted-index construction and BM25
top-k scoring on an exact integer grid.

The reference pipeline has no retrieval layer (its queries are
warehouse SQL — see ``/root/reference`` ``adhoc.sql``); this module is
part of the training-data/RAG extension belt alongside the ANN family
(operators/similarity.py): ANN answers "semantically near", BM25
answers "lexically relevant", and retrieve-then-rerank compositions
(queries/extensions.py x38) want both.

Why an integer grid: BM25's textbook form sums ``idf * tf_component``
doubles, and float summation is reduction-order-dependent across
engines (registry rule 1). Both factors here are quantized to integer
grids — ``idf_int = N*1000 div df`` (the idf's monotone rational core;
log is monotone in it, so rankings on a shared corpus agree) and
``tfc_int = tf*(k1+1)*SCALE*T div (T*S*tf + T*S*(1-b)*k1 + S*b*k1*dl*N)``
with k1=1.2, b=0.75 folded into exact integer constants — so every
per-document score is a SUM of BIGINTs: exact, associative, and
bit-identical in Spark and DuckDB.

Overflow envelope (int64 max 9.2e18): with T = total corpus tokens and
tf ≤ 10^4, the widest intermediate is ``tf*22000*T`` — safe while
T ≤ 4e10 (a ~40-billion-token corpus per scoring universe; shard the
stats beyond that). ``idf_int ≤ 1000*N`` and ``tfc_int ≤ 2200``, so a
50-term query over N ≤ 8e10 docs stays far inside int64.

Scale shape (100 TB story):
- postings build = one explode + two hash aggs (map-side combine);
- the per-term join against df and the per-doc join against dl are
  shuffle-on-key joins; corpus stats (N, T) arrive as a 1-row
  broadcast scalar (SURVEY J9 idiom), never a collect;
- query terms are tiny relative to the corpus -> broadcast to the
  postings side, so the corpus shuffles ONCE (on term) per batch;
- top-k per query is row_number over (query, score) — Spark plans
  WindowGroupLimit, so executors keep k rows per query, not the full
  candidate list;
- stop-word skew: terms with df/N above a cap can be dropped up front
  (their idf_int is ~1000, contributing noise-level score); the cap is
  exposed but off by default so the oracle twin stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import text

# k1=1.2, b=0.75 on a x1000 grid:
#   tf_component = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))  with avgdl = T/N
# multiply numerator and denominator by 10*T (exact):
#   num = tf * 22 * T          -> x1000 grid: tf * 22000 * T
#   den = 10*T*tf + 3*T + 9*dl*N
_TFC_NUM = 22000  # (k1+1) * 10 * grid(1000)
_DEN_TF = 10  # 10
_DEN_CONST = 3  # 10 * k1 * (1-b)
_DEN_DLN = 9  # 10 * k1 * b


def bm25_postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Inverted-index postings with integer-grid BM25 term weights.

    Returns one row per (doc, term): ``doc_id, term, tf, contrib`` where
    ``contrib = idf_int * tfc_int`` (see module docstring). Downstream a
    query's score for a doc is the SUM of contribs over the query's
    distinct terms — exact BIGINT arithmetic end to end.
    """
    toks = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.explode(text.tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("dl").alias("__t")
    )  # 1 row -> broadcast scalar join (J9 idiom)
    return (
        tf.join(dl, "doc_id")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            "tf",
            F.expr(
                f"((__n * 1000L) div df) * "
                f"((tf * {_TFC_NUM}L * __t) div "
                f"({_DEN_TF}L * __t * tf + {_DEN_CONST}L * __t + {_DEN_DLN}L * dl * __n))"
            ).alias("contrib"),
        )
    )


def bm25_topk(
    postings: DataFrame, query_terms: DataFrame, k: int = 5
) -> DataFrame:
    """Score every (query, doc) pair sharing a term; keep top-k per query.

    ``query_terms`` must have columns ``q_id, term`` (distinct terms per
    query — BM25's query-side tf is 1 for short queries). The query side
    is broadcast: the corpus-sized postings relation shuffles only on
    ``term``, and the final window is WindowGroupLimit-bounded.
    """
    scored = (
        postings.join(F.broadcast(query_terms), "term")
        .groupBy("q_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("q_id").cast("long").alias("q_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("score").cast("long").alias("score"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )
