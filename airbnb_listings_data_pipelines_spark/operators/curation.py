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


def neardup_candidates_production(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    hash_fn=None,
) -> tuple[DataFrame, DataFrame]:
    """The production near-dup ordering as an API, not prose: EXACT dedup
    first (x01), fingerprint candidate generation second (x16/x39/x40/
    x66/x67 machinery).

    SCALING.md's probes show why the order is load-bearing: on a corpus
    with verbatim replication, every clique of c identical documents
    contributes c*(c-1)/2 verbatim candidate pairs AND multiplies every
    cross-document pair by up to c^2 — the winnowing index is
    candidate-bounded, so the pair list (and everything downstream:
    exact shingle verification, containment, threshold curves) inflates
    quadratically in the replication factor. Collapsing identical texts
    to their min-id representative FIRST removes that term entirely; the
    10x-probe "clique artifact" recorded for x16/x40/x66/x67 is exactly
    what this function prevents.

    Returns ``(candidates, representatives)``:

    - ``candidates``: ``id_a, id_b, shared_fps`` over REPRESENTATIVE ids
      only (min ``id_col`` per distinct ``text_col``), ids ordered
      ``id_a < id_b`` — the x39-shaped pair list.
    - ``representatives``: ``id_col, n_copies`` — one row per kept
      representative with its exact-duplicate group size, so callers can
      fan group-level decisions back out to all copies (or weight by
      multiplicity) without ever re-pairing them.
    """
    from pyspark.sql import functions as F

    h = hash_fn if hash_fn is not None else F.xxhash64
    # ONE groupBy yields both outputs: the min-id representative IS the
    # exact-dedup survivor when text is the whole key, and groupBy
    # partial-aggregates map-side where exact_dedup's row_number window
    # cannot — so the candidates path shuffles the corpus once, not twice
    grouped = docs.groupBy(text_col).agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies")
    )
    reps_rows = grouped.select(id_col, text_col)
    counts = grouped.select(id_col, F.col("n_copies").cast("long").alias("n_copies"))
    cands = dedup.winnowing_neardup_pairs(
        reps_rows, id_col, text_col, k, window, min_shared, h
    )
    return cands, counts
