"""Text-analysis operators for training-data pipelines.

All JVM-side (built-in functions, no Python UDFs): at 100 TB these run inside
whole-stage codegen straight off the parquet scan, shuffle-free (pure map
operators), so throughput is bounded by scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def exploded_nonnull(
    df: DataFrame,
    arr: Column | str,
    alias: str,
    *keep: Column | str,
    pos: str | None = None,
) -> DataFrame:
    """``explode`` with Catalyst's InferFiltersFromGenerate trap defused.

    For an INNER generate, Catalyst injects ``Filter(size(gen) > 0 AND
    isnotnull(gen))`` below the Generate node, and filter pushdown then
    re-inlines the entire generator expression into that filter at the
    scan — including re-substituting every aliased sub-expression it
    references. For an array built by ``transform`` over a projected
    ``tokens()`` split, that filter re-runs the regex split at EVERY
    ``element_at`` reference of every element: duplicate_span_coverage
    measured **113 s for 236k generated rows at sf0.1, 0.74 s after this
    fix** (~150x). OUTER generates get no inferred filter; the cheap
    null-check on the generated output restores inner-explode semantics.

    Precondition: the array must not contain null ELEMENTS (true for
    every constructed array in this package — concat_ws/substring/struct
    never yield null); a null element would be dropped where inner
    explode would keep it.

    ``pos`` adds posexplode's ordinal column under that name.
    """
    a = F.col(arr) if isinstance(arr, str) else arr
    if pos is None:
        out = df.select(*keep, F.explode_outer(a).alias(alias))
        return out.filter(F.col(alias).isNotNull())
    out = df.select(*keep, F.posexplode_outer(a).alias(pos, alias))
    return out.filter(F.col(pos).isNotNull())


# Tiny per-language stopword marker sets (public, language-frequency folklore).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "los", "las", "y", "es", "una"),
}
EN_STOPWORDS = LANG_MARKERS["en"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (array<string>); empty input -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token estimate: split on whitespace AND on
    letter/digit/punct boundaries (a cheap BPE stand-in for budget checks)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(F.trim(c), r"\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|(?=[^\w\s])")
    return F.size(F.filter(pieces, lambda p: F.length(p) > 0)).cast("long")


def stopword_count(col: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    return F.size(F.filter(toks, lambda w: w.isin(*stopwords))).cast("long")


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, r"[^.!?,;:]", "")).cast("long")


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality scores: length, token count, punctuation ratio,
    stopword ratio, mean token length. All ratios are double divisions of
    exact integer counts (cross-engine bit-stable).

    The regex tokenization runs ONCE per row (projected intermediate
    array) — a naive per-metric retokenization costs ~4x on the hot path
    (Catalyst does not CSE regexp_split across aggregate expressions)."""
    stage = df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        tokens(text_col).alias("__toks"),
        punct_count(text_col).alias("__punct"),
    ).select(
        id_col,
        "n_chars",
        F.size("__toks").cast("long").alias("n_tokens"),
        "__punct",
        F.size(F.filter("__toks", lambda w: F.lower(w).isin(*EN_STOPWORDS)))
        .cast("long")
        .alias("__stop"),
    )
    return stage.select(
        id_col,
        "n_chars",
        "n_tokens",
        (F.col("__punct") / F.col("n_chars")).alias("punct_ratio"),
        (F.col("__stop") / F.col("n_tokens")).alias("stopword_ratio"),
        ((F.col("n_chars") - (F.col("n_tokens") - 1)) / F.col("n_tokens")).alias(
            "mean_token_len"
        ),
    )


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles (lowercased, space-joined) — the unit of
    benchmark-contamination checks and word-level near-dup. Map-only
    (tokenize once, slide a window via sequence+element_at); fewer than k
    tokens -> empty array. DuckDB twin (kept diffable, used by the x28
    oracle): ``list_distinct(list_transform(range(1, len(t) - k + 2),
    i -> concat_ws(' ', t[i], .., t[i+k-1])))`` over
    ``t = regexp_split_to_array(trim(lower(text)), '\\s+')``.

    Convenience form over an inline tokenize; hot paths must project
    ``tokens()`` first and call ngrams_from_tokens(distinct=True) — the
    inline split re-runs O(k*n) per row (see ngrams_from_tokens).
    """
    c = F.col(col) if isinstance(col, str) else col
    return ngrams_from_tokens(tokens(F.lower(c)), k, distinct=True)


# PII patterns restricted to syntax Java regex and RE2 (DuckDB) interpret
# identically: character classes, bounded repetition, ASCII \b word
# boundaries — no lookarounds, no backreferences.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}-\d{4}\b", "<PHONE>"),
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of matches of one PII pattern (0 when none)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind][0])).cast("long")


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its typed placeholder. Order matters:
    emails first (their domain part would otherwise be half-eaten by the
    IP pattern on numeric domains), then IPs, then phones. Pure map
    operator — at 100 TB this runs inside whole-stage codegen at scan
    speed, no shuffle, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in ("email", "ip", "phone"):
        pat, repl = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pat, repl)
    return c


def ngrams_from_tokens(toks: Column, k: int, distinct: bool = False) -> Column:
    """Adjacent k-word n-grams (space-joined) built from an ALREADY-SPLIT
    token-array column. ``toks`` must be a plain column reference to a
    projected array, NOT an inline ``tokens(...)`` expression: the lambda
    body references ``toks`` k+1 times, and Catalyst inlines (rather than
    CSEs) subexpressions into higher-order-function lambdas, so an inline
    regex split would re-run O(k*n) times per row — measured 8.4s vs 0.6s
    on 5,000 docs at sf0.1 for the bigram explode. Projecting the split
    once keeps it once-per-row (CollapseProject refuses to collapse a
    non-cheap alias referenced more than once).

    ``distinct=False`` keeps the multiset (repetition metrics);
    ``distinct=True`` gives the shingle set (containment checks)."""
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(grams)


def word_ngrams(col: Column | str, k: int = 2) -> Column:
    """ALL adjacent k-word n-grams (lowercased, space-joined), duplicates
    kept — the multiset that repetition metrics count over (contrast
    word_shingles, which is the distinct set for containment checks).
    Map-only; fewer than k tokens -> empty array.

    Convenience form over an inline tokenize — fine for tests and small
    frames, but hot paths must project ``tokens()`` first and call
    ngrams_from_tokens (see its docstring for the O(k*n) re-split trap)."""
    c = F.col(col) if isinstance(col, str) else col
    return ngrams_from_tokens(tokens(F.lower(c)), k)


def repetition_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals: distinct-token
    fraction, most-frequent-token fraction, most-frequent-bigram fraction
    (Rae et al. 2021, "Scaling Language Models", App. A quality filters —
    public paper). Highly repetitive machine-generated text scores low on
    distinct_token_frac and high on the top-*-frac columns.

    Scale shape: tokens and bigrams are exploded then counted with two
    hash aggregations keyed (id, gram) -> id; both benefit from map-side
    partial aggregation, and the per-doc reduction after the first groupBy
    is tiny (one row per distinct gram). No joins against the corpus, so
    the op is embarrassingly parallel across documents — the alternative
    per-row O(n^2) array-mode computation would avoid the shuffle but
    breaks whole-stage codegen on long docs; exploding wins at 100 TB
    because the shuffle rows are (id, gram-hash, count) partials, not text.
    Single-token docs have no bigrams: top_bigram_frac is 0.0 by
    convention (left join + coalesce). Empty/whitespace-only docs are kept
    with n_tokens=0 and all fractions 0.0 — the doc-id spine is the input
    frame, not the exploded tokens (which would silently drop them)."""
    base = df.select(F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__toks"))
    unig = (
        exploded_nonnull(base, "__toks", "w", F.col(id_col))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.max("c").cast("long").alias("top_c"),
        )
    )
    bigr = (
        exploded_nonnull(base, ngrams_from_tokens(F.col("__toks"), 2), "b", F.col(id_col))
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").cast("long").alias("n_bigrams"), F.max("c").cast("long").alias("top_bc"))
    )
    return (
        base.select(F.col(id_col))
        .join(unig, id_col, "left")
        .join(bigr, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_distinct") / F.col("n_tokens"), F.lit(0.0)).alias(
                "distinct_token_frac"
            ),
            F.coalesce(F.col("top_c") / F.col("n_tokens"), F.lit(0.0)).alias("top_token_frac"),
            F.coalesce(F.col("top_bc") / F.col("n_bigrams"), F.lit(0.0)).alias(
                "top_bigram_frac"
            ),
        )
    )


def ngram_lang_profiles(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 40,
) -> DataFrame:
    """Per-language character-n-gram rank profiles (Cavnar & Trenkle 1994,
    "N-Gram-Based Text Categorization" — public paper): for each language
    label, the ``top_k`` most frequent character ``n``-grams with their
    rank. The training half of the n-gram language-ID pair; the profile
    table is (languages x top_k) rows — kilobytes regardless of corpus
    size, so it broadcasts.

    Deterministic: rank ties break on the n-gram string ascending. Counts
    are document frequencies over DISTINCT per-doc n-grams (robust to one
    doc repeating an n-gram thousands of times)."""
    from ..localframe import fan_out
    from ..operators.dedup import char_shingles_lc

    base = fan_out(
        df.select(F.col(lang_col).alias("lang"), F.lower(F.col(text_col)).alias("__lc"))
    )
    grams = exploded_nonnull(base, char_shingles_lc("__lc", n), "g", "lang")
    counts = grams.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), "g")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("lang", F.col("g").alias("gram"), F.col("rank").cast("long").alias("rank"))
    )


def lang_id_ngram(
    df: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 40,
) -> DataFrame:
    """Classify each document against n-gram rank profiles: score(doc,
    lang) = sum over the doc's distinct n-grams found in the language's
    profile of ``top_k + 1 - rank`` (a monotone simplification of Cavnar-
    Trenkle's out-of-place distance), predicted language = argmax with
    ties broken by language ascending; documents matching NO profile
    n-gram get 'und'.

    Scale shape: explode distinct doc n-grams (map-only), equi-join the
    BROADCAST profile table, one (doc, lang) hash agg, one per-doc top-1
    window. No Python anywhere."""
    from ..localframe import fan_out
    from ..operators.dedup import char_shingles_lc

    base = fan_out(
        df.select(F.col(id_col), F.lower(F.col(text_col)).alias("__lc"))
    )
    grams = exploded_nonnull(base, char_shingles_lc("__lc", n), "gram", F.col(id_col))
    scored = (
        grams.join(F.broadcast(profiles), "gram")
        .groupBy(id_col, "lang")
        .agg(F.sum(F.lit(top_k + 1) - F.col("rank")).alias("score"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "lang")
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("lang").alias("pred_lang"))
    )
    return df.select(F.col(id_col)).join(best, id_col, "left").select(
        F.col(id_col), F.coalesce(F.col("pred_lang"), F.lit("und")).alias("pred_lang")
    )


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: CJK codepoint presence, else argmax of marker-
    stopword hits with a fixed priority order on ties (en > fr > de > es),
    'und' (undetermined) when nothing matches."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.lower(c))
    def marker_hits(markers: tuple[str, ...]):
        return F.size(F.filter(toks, lambda w: w.isin(*markers)))

    hits = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    expr = F.when(c.rlike(r"[一-鿿]"), "zh")
    for lang in ("en", "fr", "de", "es"):  # priority order on ties
        expr = expr.when((best > 0) & (hits[lang] == best), lang)
    return expr.otherwise("und")


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Split documents into overlapping token-window chunks (size
    ``chunk_size``, step ``stride``) — the RAG/pretraining chunking op.
    Pure built-ins: tokenize once, generate window starts with sequence(),
    slice + rejoin per window; explode. Map-only (no shuffle), so it
    streams at scan speed at any scale. The split is projected ONCE before
    the window lambda references it (see ngrams_from_tokens: an inline
    split would re-run per window).
    """
    base = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.ceil((n - chunk_size) / stride), F.lit(0)),
    )
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.array_join(F.slice(toks, i * stride + 1, chunk_size), " ").alias("chunk_text"),
        ),
    )
    return exploded_nonnull(
        base, chunks, "c", F.col(id_col), n.cast("long").alias("n_tokens")
    ).select(
        id_col,
        "n_tokens",
        F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
        "c.chunk_text",
    )


def pack_sequence_spans(
    df: DataFrame,
    text_col: str = "text",
    order_col: str = "doc_id",
    seq_len: int = 2048,
    shards: int = 8,
) -> DataFrame:
    """GPT-style CONCAT-AND-CHUNK sequence packing (the standard
    pretraining batcher: all documents of a shard are concatenated in a
    deterministic order and split into fixed ``seq_len``-token training
    blocks; documents span block boundaries). Returns ONE ROW PER
    DOCUMENT with its packed span: shard, token offsets
    [tok_start, tok_end), and the block range [first_block, last_block]
    it lands in — everything a loader needs to materialize any block's
    token stream, and everything an auditor needs to answer "which docs
    are in sequence i".

    Zero-token documents are dropped (they occupy no span; callers
    count them separately if needed).

    Scale shape: packing is PER SHARD (``order_col % shards``), so the
    only shuffle is one hash partition + per-shard sort for the
    running-sum window — never a global total order. At 100 TB raise
    ``shards`` so each shard's token stream fits a task comfortably;
    blocks never cross shards, matching how real pipelines shard
    training data. The whole plan is JVM-side (token counts are one
    regex split in codegen; the cumulative sum is one window over the
    shard partition)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be >= 1")
    if shards <= 0:
        raise ValueError("shards must be >= 1")
    w = (
        Window.partitionBy("shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = token_count(text_col)
    return (
        df.select(
            F.col(order_col),
            (F.col(order_col) % F.lit(shards)).cast("int").alias("shard"),
            n.alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn("tok_end", F.sum("n_tokens").over(w))
        .withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))
        .withColumn(
            "first_block", F.floor(F.col("tok_start") / F.lit(seq_len))
        )
        .withColumn(
            "last_block",
            F.floor((F.col("tok_end") - F.lit(1)) / F.lit(seq_len)),
        )
    )
