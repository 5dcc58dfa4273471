"""Python UDTF (table function) operators — Spark 4's arrow-backed
one-row-to-many-rows Python surface, completing the matrix alongside
pandas_udf (scalar), mapInPandas (partition stream), applyInPandas
(grouped map) and applyInPandasWithState (stateful stream).

The JVM chunker (operators/text.chunk_tokens) is the production path; this
UDTF expresses the same semantics for cases where chunking logic needs a
Python tokenizer (e.g. a real BPE) that built-ins can't express.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: bigint, chunk_text: string")
class ChunkTokensUDTF:
    """Overlapping token-window chunks of a text (size 50, stride 40 —
    matching text.chunk_tokens defaults)."""

    CHUNK_SIZE = 50
    STRIDE = 40

    def eval(self, text: str):  # noqa: D102
        toks = text.split() if text and text.strip() else []
        n = len(toks)
        n_chunks = max(0, -(-(n - self.CHUNK_SIZE) // self.STRIDE)) + 1
        for i in range(n_chunks):
            yield i, " ".join(toks[i * self.STRIDE: i * self.STRIDE + self.CHUNK_SIZE])


def register(spark: SparkSession) -> None:
    spark.udtf.register("chunk_tokens_udtf", ChunkTokensUDTF)
