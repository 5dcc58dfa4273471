"""Composed training-data curation pipeline over a documents table:

    exact dedup -> quality features -> language ID -> filter -> budgeted output

Everything is a single lazy Catalyst plan (one shuffle for the dedup window,
map-only afterwards): at 100 TB this runs as dedup-shuffle + streaming
projection, and the quality/lang filters push no data through Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, text


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 50,
    max_chars: int = 100_000,
    min_tokens: int = 10,
    drop_unknown_lang: bool = True,
) -> DataFrame:
    """Return curated documents with provenance columns
    (doc_id, predicted_lang, n_chars, n_tokens, stopword_ratio)."""
    deduped = dedup.exact_dedup(docs, [text_col], id_col)
    feats = text.quality_features(deduped, text_col=text_col, id_col=id_col)
    lang = deduped.select(F.col(id_col), text.lang_id(text_col).alias("predicted_lang"))
    out = (
        feats.join(lang, id_col)
        .filter(
            (F.col("n_chars") >= min_chars)
            & (F.col("n_chars") <= max_chars)
            & (F.col("n_tokens") >= min_tokens)
        )
    )
    if drop_unknown_lang:
        out = out.filter(F.col("predicted_lang") != "und")
    return out.select(id_col, "predicted_lang", "n_chars", "n_tokens", "stopword_ratio")
