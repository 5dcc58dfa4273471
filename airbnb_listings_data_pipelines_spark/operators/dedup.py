"""Deduplication operators for training-data pipelines.

Scale design notes (the point of each algorithm at 100 TB):

- exact_dedup: one hash-shuffle on the dedup key. Dedup on xxhash64(text)
  instead of the full text so the shuffle carries 8 bytes/row, not documents.
- Exact n-gram Jaccard is quadratic per shared-shingle bucket — usable for
  verification of candidate pairs, never as the primary all-pairs pass.
- MinHash+LSH is the scale path: signature size k, b bands x r rows; only
  pairs sharing a band bucket are compared, turning O(n²) into
  O(n · bucket_width). All hashing is xxhash64 (JVM, codegen) — no Python.
- SimHash gives 64-bit fingerprints whose Hamming distance tracks cosine
  similarity of the bag-of-words — near-dup detection via band-rotation
  joins on fingerprint chunks.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_hash32(col: Column | str) -> Column:
    """32-bit hash: first 8 hex chars of md5, parsed as an integer.

    Slower than xxhash64 (the default at scale) but *cross-engine exact*:
    DuckDB computes the identical value as
    ``list_sum(list_transform(range(1, 9), i ->
    (strpos('0123456789abcdef', substring(md5(x), i, 1)) - 1)
    * CAST(pow(16, 8 - i) AS BIGINT)))`` — which is how the shared-hash
    oracles for SimHash and stratified sampling stay bit-identical.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


# DuckDB SQL fragment computing md5_hash32 of expression {x} (kept next to
# the Spark twin above so the two definitions can be diffed side by side).
MD5_HASH32_DUCKDB = (
    "list_sum(list_transform(range(1, 9), i -> "
    "(strpos('0123456789abcdef', substring(md5({x}), i, 1)) - 1) "
    "* CAST(pow(16, 8 - i) AS BIGINT)))"
)


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per key (lowest ``order_col``) — the reference's
    QUALIFY-row_number dedup (workfile_design_data_warehouse.sql:265-266)
    applied to content keys."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def corpus_line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_len: int = 3,
    max_occurrences: int = 2,
) -> DataFrame:
    """C4-style corpus-level line deduplication (Raffel et al. 2020 §2.2 —
    public paper — removes boilerplate lines repeated across the corpus):
    drop every line occurring more than ``max_occurrences`` times ANYWHERE
    in the corpus (all copies, not all-but-one), then reassemble each
    document from its surviving lines in original order.

    Real corpora split on newlines; the driver's synthetic docs are
    single-line, so a "line" here is a non-overlapping ``line_len``-token
    window — the corpus-level count/filter/reassemble shape is identical.

    Scale shape: (1) map-only line explode carrying (id, line_idx);
    (2) global count keyed by the line — at 100 TB key by xxhash64(line)
    (8 B) instead of the raw text, exactly as exact_dedup's doc notes, and
    let AQE handle the boilerplate skew (the most-repeated lines ARE the
    hot keys); (3) count joined back on the same key (shuffle reuse);
    (4) per-doc reassembly via sort_array(collect_list(struct(idx, line)))
    — bounded by document size, not corpus size. Docs whose every line was
    boilerplate survive with n_kept=0 and empty new_text (left join).
    Empty/whitespace-only docs have zero lines (n_lines=0, new_text='') —
    the explicit zero-guard matters because ``F.sequence(0, -1)`` would
    otherwise default to step -1 and fabricate two phantom empty lines."""
    from .text import tokens  # local import: text.py does not import dedup

    base = df.select(F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__toks"))
    toks = F.col("__toks")  # projected once; inline split would re-run per line
    n_lines_arr = F.ceil(F.size(toks) / F.lit(float(line_len)))
    from .text import exploded_nonnull

    lines = exploded_nonnull(
        base,
        F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_lines_arr - 1),
                lambda i: F.array_join(F.slice(toks, i * line_len + 1, line_len), " "),
            )
        ),
        "line",
        F.col(id_col),
        pos="line_idx",
    )
    cnt = lines.groupBy("line").agg(F.count(F.lit(1)).alias("__c"))
    # n_lines is arithmetic on the token count — map-only off the scan (one
    # fewer shuffle than counting exploded rows) and it keeps zero-line docs,
    # which the explode would drop.
    tot = base.select(F.col(id_col), n_lines_arr.cast("long").alias("n_lines"))
    kept = (
        lines.join(cnt, "line")
        .filter(F.col("__c") <= max_occurrences)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                    lambda s: s["line"],
                ),
                " ",
            ).alias("new_text"),
        )
    )
    return tot.join(kept, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("new_text"), F.lit("")).alias("new_text"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    hash_fn: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """MOSS-style winnowing document fingerprints (Schleimer, Wilkerson,
    Aiken 2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
    public paper): hash every adjacent ``k``-token gram, slide a window of
    ``window`` consecutive gram hashes, and in each window select the
    minimum hash (rightmost occurrence on ties — the paper's rule, which
    makes selections stable across overlapping windows). The distinct
    selected positions form the document's fingerprint set; any shared
    substring of length >= window + k - 1 tokens is GUARANTEED to
    contribute at least one shared fingerprint, so fingerprint overlap is
    a sound containment/near-dup signal at a fraction of the shingle count
    (expected density 2/(window+1)).

    Scale shape: entirely map-only — tokenize, gram, hash, and select are
    all per-document array expressions; no shuffle, no window-function
    partitioning, nothing driver-side. The polynomial/rolling-hash update
    the paper uses is an O(1)-per-step micro-optimization of the same
    selection; here each gram is hashed directly (xxhash64 by default —
    JVM codegen — or ``md5_hash32`` for the cross-engine-exact oracle
    variant), which keeps the map O(n·k) and the winnow O(n·window) per
    doc — still linear in corpus size at 100 TB.

    Every intermediate array (tokens, grams, hashes) is projected ONCE
    before the lambda that consumes it — see ngrams_from_tokens' docstring
    for the Catalyst lambda-inlining trap this avoids.

    Returns one row per selected fingerprint: (id_col, pos, fp) where
    ``pos`` is the 1-based gram index selected and ``fp`` its hash. Docs
    with fewer than ``k`` tokens produce no rows.
    """
    from .text import ngrams_from_tokens, tokens  # local import: text.py does not import dedup

    base = df.select(F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__toks"))
    grams = base.select(
        F.col(id_col), ngrams_from_tokens(F.col("__toks"), k).alias("__grams")
    )
    hashed = grams.select(
        F.col(id_col), F.transform(F.col("__grams"), lambda g: hash_fn(g)).alias("__hs")
    )
    hs = F.col("__hs")
    n = F.size(hs)
    w = window
    # Rightmost-min selection per window start j (0-based): fold left-to-right
    # over the window's 1-based gram indices, keeping (index, value) of the
    # current minimum; `<=` makes later equal values win (paper's tie rule).
    init = F.struct(
        F.lit(-1).cast("int").alias("i"), F.lit((1 << 63) - 1).cast("long").alias("v")
    )
    sel = F.transform(
        F.sequence(F.lit(0), F.greatest(n - w, F.lit(0))),
        lambda j: F.aggregate(
            F.sequence(j + 1, F.least(j + w, n)),
            init,
            lambda acc, i: F.when(
                F.element_at(hs, i) <= acc["v"],
                F.struct(i.cast("int").alias("i"), F.element_at(hs, i).alias("v")),
            ).otherwise(acc),
            lambda acc: acc["i"],
        ),
    )
    from .text import exploded_nonnull

    picked = exploded_nonnull(
        hashed,
        F.when(n == 0, F.array().cast("array<int>")).otherwise(F.array_distinct(sel)),
        "pos",
        F.col(id_col),
        hs.alias("__hs2"),
    )
    return picked.select(
        F.col(id_col),
        F.col("pos").cast("long").alias("pos"),
        F.element_at(F.col("__hs2"), F.col("pos").cast("int")).alias("fp"),
    )


def winnowing_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    hash_fn: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints (the MOSS
    match step): docs sharing >= ``min_shared`` distinct fingerprint hashes.
    Inverted-index equi-join on fp — only docs sharing a fingerprint are
    ever paired, same candidate-generation discipline as MinHash-LSH."""
    fps = (
        winnowing_fingerprints(df, id_col, text_col, k, window, hash_fn)
        .select(F.col(id_col).alias("id"), "fp")
        .distinct()
    )
    a, b = fps.alias("a"), fps.alias("b")
    return (
        # merge-join hint: same ReusedExchange rationale as
        # simhash_neardup_pairs — a broadcast self-join would run the
        # winnowing pipeline twice; under SMJ both sides share one
        # hash-distribution on fp and the fingerprints compute once
        a.hint("merge").join(
            b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id"))
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def char_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-gram shingles of lower(text) (array<string>).

    Convenience form (lowercases inline). HOT PATHS must project
    ``F.lower(text)`` first and call ``char_shingles_lc`` on the bare
    column: the transform lambda references its input per ELEMENT, and
    Catalyst inlines (not CSEs) non-attribute inputs, so an inline
    lower() re-runs O(len) work per shingle — measured 9.4s vs 2.2s for
    the sf0.1 profile build (same trap as ngrams_from_tokens).
    """
    return char_shingles_lc(F.lower(F.col(col) if isinstance(col, str) else col), n)


def char_shingles_lc(col: Column | str, n: int = 3) -> Column:
    """char_shingles over an ALREADY-LOWERCASED projected column (see
    char_shingles docstring for why hot paths must use this form)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(n)) - n + 1),
            lambda i: c.substr(i, F.lit(n)),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard similarity >= threshold.

    Inverted-index join: explode distinct shingles, self-join on shingle,
    count shared shingles per pair, Jaccard = inter / (|A| + |B| - inter).
    Only pairs sharing >= 1 shingle are ever materialized.
    """
    from .text import exploded_nonnull

    base = df.select(F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("__lc"))
    sh = exploded_nonnull(base, char_shingles_lc("__lc", n), "sh", "id")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per document: for permutation i,
    sig_i = min over shingles of xxhash64(shingle, i).

    Computed as one explode + one groupBy with ``num_hashes`` min() aggregates
    (partial aggregation makes the shuffle carry signatures, not shingles).
    """
    from .text import exploded_nonnull

    base = df.select(F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("__lc"))
    sh = exploded_nonnull(base, char_shingles_lc("__lc", n), "sh", "id")
    aggs = [F.min(F.xxhash64("sh", F.lit(i))).alias(f"mh_{i}") for i in range(num_hashes)]
    return sh.groupBy("id").agg(*aggs)


def lsh_band_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """The LSH BAND INDEX for a document set: one ``(id, band, bucket)``
    row per (document, band). A document's rows depend on its text
    alone — never on the rest of the corpus — which is what makes the
    index INCREMENTALLY maintainable: band a new batch, probe the
    stored index for candidates, then append the batch's rows
    (:func:`lsh_probe_pairs`). Persist it as a txlog/parquet table
    keyed (bucketed) on ``bucket`` and continuous ingestion never
    re-scans the corpus — at 100 TB the index is the only thing a
    daily batch touches, O(batch x bands) new rows."""
    r = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * r + j}") for j in range(r)], F.lit(b)).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", *band_cols)
    return banded.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def lsh_probe_pairs(
    batch_df: DataFrame,
    index: DataFrame,
    all_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """Incremental near-dup detection: verified pairs TOUCHING a new
    batch, from the stored band index alone — no corpus re-banding.

    Candidates are (batch x index) bucket collisions plus
    (batch x batch) self-collisions; both verify against exact shingle
    Jaccard >= ``verify_threshold`` computed from ``all_docs``' text
    (the join prunes to candidate ids, so only candidate documents are
    ever shingled). Because a document's bands depend on its text
    alone, the result EQUALS ``minhash_lsh_pairs`` over the full
    corpus restricted to batch-touching pairs — pinned by test and by
    the x115 in-query gate. ``index`` must hold the (id, band, bucket)
    rows of the corpus WITHOUT the batch; pairs are (id_a < id_b)."""
    batch_bands = lsh_band_index(
        batch_df, id_col, text_col, n, num_hashes, bands
    )
    a, b = batch_bands.alias("a"), index.alias("b")
    cand_no = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.least("a.id", "b.id").alias("id_a"),
            F.greatest("a.id", "b.id").alias("id_b"),
        )
    )
    a2, b2 = batch_bands.alias("a"), batch_bands.alias("b")
    cand_nn = a2.join(
        b2,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    candidates = cand_no.unionByName(cand_nn).distinct()
    # restrict the verification side to CANDIDATE documents before the
    # shingle compute (broadcast semi-join): at 100 TB the corpus TEXT
    # dwarfs the index, so shingling only candidates — not every doc —
    # is what keeps the probe's cost off the corpus text volume. The
    # candidate set is re-derived here (one more map-side index pass),
    # deliberately cheaper than materializing it or shingling the world.
    cand_ids = F.broadcast(
        candidates.select(F.col("id_a").alias("id"))
        .unionByName(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    docs_needed = all_docs.join(
        cand_ids, all_docs[id_col] == cand_ids["id"], "left_semi"
    )
    sh_arr = docs_needed.select(
        F.col(id_col).alias("id"), char_shingles(text_col, n).alias("sh")
    )
    va = sh_arr.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    vb = sh_arr.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("jaccard_exact", inter / union)
        .filter(F.col("jaccard_exact") >= verify_threshold)
        .select("id_a", "id_b", "jaccard_exact")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-dup candidate pairs, verified with exact Jaccard.

    Band a signature of ``num_hashes`` into ``bands`` buckets of r rows; docs
    colliding in any band become candidates; candidates are then verified
    against exact shingle Jaccard >= verify_threshold.
    """
    stacked = lsh_band_index(df, id_col, text_col, n, num_hashes, bands)
    a, b = stacked.alias("a"), stacked.alias("b")
    candidates = (
        # merge-join hint: same ReusedExchange rationale as
        # simhash_neardup_pairs — broadcast self-join = the minhash
        # band index computed twice; SMJ on (band, bucket) = once
        a.hint("merge").join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # exact verification ONLY on the candidate pairs (the whole point of
    # LSH): join each side's distinct-shingle array and compute Jaccard
    # via array_intersect — O(|A|+|B|) per candidate, no all-pairs pass
    sh_arr = df.select(F.col(id_col).alias("id"), char_shingles(text_col, n).alias("sh"))
    va = sh_arr.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    vb = sh_arr.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("jaccard_exact", inter / union)
        .filter(F.col("jaccard_exact") >= verify_threshold)
        .select("id_a", "id_b", "jaccard_exact")
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    chunks: int = 4,
    hash_fn: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance <= ``max_hamming``.

    Pigeonhole banding: split the fingerprint into ``chunks`` bit-chunks;
    any pair within distance d < chunks must agree on >= 1 whole chunk, so
    candidates come from equi-joins on (chunk_index, chunk_value) and only
    candidates pay the bit_count(xor) verification — never all pairs.
    The banding is complete for d < chunks, so the output equals the exact
    all-pairs Hamming filter — which is what the DuckDB oracle computes
    when ``hash_fn=md5_hash32``.
    """
    assert max_hamming < chunks, "pigeonhole guarantee needs d < chunks"
    fp = simhash(df, id_col, text_col, bits, hash_fn)
    width = bits // chunks
    mask = (1 << width) - 1
    chunked = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("ci"),
                        F.shiftright("simhash", c * width).bitwiseAND(F.lit(mask)).alias("cv"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ch"),
    ).select("id", "simhash", "ch.ci", "ch.cv")
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        # merge-join hint (round 14, guide §2.4): the planner would
        # broadcast one side of this self-join, wrapping it in a
        # BroadcastExchange that cannot be reused against the other
        # side's shuffle — so the whole simhash pipeline (explode +
        # per-word hash + 32 conditional sums) executed TWICE. Under a
        # sort-merge join both sides require the SAME hash distribution
        # on (ci, cv) and Spark plans one Exchange + a ReusedExchange:
        # the fingerprints are computed once, and only the 4-chunk
        # (id, simhash, ci, cv) rows shuffle — cheaper than a second
        # fingerprint pass at any scale. AQE skew-join still splits hot
        # chunk-value buckets.
        a.hint("merge").join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        # verify BEFORE dedup: the Hamming filter is deterministic per row,
        # so filter-then-distinct equals distinct-then-filter while the
        # distinct's shuffle carries only the (rare) passing candidates
        # instead of every banding candidate (guide §2.3: shuffle fewer
        # bytes).
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    hash_fn: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """Per-document SimHash fingerprint over word unigrams.

    bit_j(doc) = 1 iff sum over words of (+1 if bit_j(hash(word)) else -1) > 0.
    One explode + one groupBy with ``bits`` conditional-sum aggregates.
    ``hash_fn`` defaults to xxhash64 (fastest, JVM); pass ``md5_hash32``
    (with bits<=32) for the cross-engine-exact variant the DuckDB oracle
    can recompute.
    """
    from ..localframe import fan_out
    from .text import exploded_nonnull

    base = fan_out(
        df.select(F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("__lc"))
    )
    words = exploded_nonnull(
        base, F.split(F.trim(F.col("__lc")), r"\s+"), "w", "id"
    ).withColumn("h", hash_fn(F.col("w")))
    bit_sums = [
        F.sum(F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(
            f"s_{j}"
        )
        for j in range(bits)
    ]
    agg = words.groupBy("id").agg(*bit_sums)
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(F.col(f"s_{j}") > 0, F.lit(1 << j).cast("long")).otherwise(0)
    return agg.select("id", fp.alias("simhash"))


def duplicate_span_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
    hash_fn: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """Duplicated-span detection at token-n-gram granularity (the tractable
    distributed form of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better" — their ExactSubstr pass marks any substring
    occurring more than once in the corpus; here the unit is an ``n``-token
    span, so a duplicated run of m >= n tokens is detected as m - n + 1
    duplicated spans covering exactly those m tokens).

    Per document, reports how much of it is corpus-duplicated text:

    - ``n_tokens``   — document length in whitespace tokens
    - ``n_spans``    — number of n-token spans (max(n_tokens - n + 1, 0))
    - ``dup_spans``  — spans whose n-gram occurs >= ``min_count`` times
                       corpus-wide (total occurrences, so a span repeated
                       within one document also counts)
    - ``dup_tokens`` — distinct token positions covered by >= 1 dup span
    - ``dup_fraction`` — dup_tokens / n_tokens (0.0 for empty docs)

    A curation pipeline drops or trims documents above a dup_fraction
    threshold (Lee et al. cut ~3% of C4 this way).

    Scale shape: tokenize + gram + posexplode are map-only; the only
    wide stages are (1) the gram-hash occurrence count — an 8-byte-key
    hash aggregate with map-side partial combine, (2) the equi-join of
    occurrences to the duplicated-gram set on that same 8-byte key (AQE
    reuses the aggregate's partitioning), and (3) the per-document
    position/count aggregates. The n x position blowup of the coverage
    explode is bounded (n rows per dup span) and collapses immediately in
    the per-doc countDistinct. Shuffle payloads never carry text — only
    (hash, doc_id, pos) triples.

    ``hash_fn`` defaults to xxhash64; the oracle variant passes full
    ``F.md5`` (collision-free in practice and recomputable by DuckDB).
    Docs with no spans (fewer than n tokens, including empty docs) are
    KEPT with zero counts — the empty-text guard the round-3 advisor
    flagged on corpus_line_dedup applies here by construction.
    """
    from ..localframe import fan_out
    from .text import ngrams_from_tokens, tokens

    base = fan_out(
        df.select(
            F.col(id_col).alias("doc_id"), tokens(F.lower(F.col(text_col))).alias("toks")
        )
    )
    toked = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        ngrams_from_tokens(F.col("toks"), n).alias("grams"),
    )
    # posexplode_OUTER, not posexplode: for inner generates Catalyst's
    # InferFiltersFromGenerate injects Filter(size(gen)>0 AND
    # isnotnull(gen)) below the Generate, and filter pushdown re-inlines
    # the WHOLE gram-construction expression (with the tokens() split
    # re-substituted at every element_at reference) into that filter at
    # the scan — measured 113 s for 236k spans at sf0.1 (~16 regex
    # splits of the full text per gram row); outer generates get no
    # inferred filter, and the cheap pos-null post-filter restores inner
    # semantics. Measured 113 s -> ~3 s.
    occ = (
        toked.select("doc_id", F.posexplode_outer("grams").alias("pos", "gram"))
        .filter(F.col("pos").isNotNull())
        .select("doc_id", "pos", hash_fn(F.col("gram")).alias("gh"))
    )
    dup_grams = occ.groupBy("gh").agg(F.count(F.lit(1)).alias("occ_cnt")).filter(
        F.col("occ_cnt") >= min_count
    )
    dup_occ = occ.join(dup_grams.select("gh"), "gh").select("doc_id", "pos")
    cov = (
        dup_occ.select(
            "doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("p")
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("p").alias("dup_tokens"))
    )
    spans = dup_occ.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dup_spans"))
    stats = toked.select("doc_id", "n_tokens")
    return (
        stats.join(cov, "doc_id", "left")
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.greatest(F.col("n_tokens") - (n - 1), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("dup_tokens", F.lit(0)).cast("double") / F.col("n_tokens")
            )
            .alias("dup_fraction"),
        )
    )


def semdedup_prune(
    emb: DataFrame,
    n_clusters: int | None = None,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    two_level: bool = False,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    space, then prune semantic duplicates WITHIN each cluster — the
    quadratic cosine work is confined to cluster-sized candidate sets
    instead of the full corpus (the same discipline as the LSH/IVF band
    joins in this module and operators/similarity.py).

    Clustering here is deterministic hash-spread MEDOID seeding, in one
    of two modes, both reproducible in the DuckDB oracle bit-for-bit:

    - SQRT-RATE mode (default, ``n_clusters=None``): every vector whose
      md5_hash32(id) < floor(2^32 / sqrt(N)) is a seed — expected
      cluster count sqrt(N), which BALANCES the two cost terms that a
      clustered dedup cannot both make linear with single-level
      assignment: assignment costs N*k cosines and within-cluster
      pairing costs ~N^2/k, so k ~ sqrt(N) puts BOTH at N^1.5 (fixed
      k=8 measured 18.5 at the 10x probe — quadratic pairing; k ~ N/64
      measured 7.3 — quadratic assignment; sqrt-rate is the balanced
      point, and N comes from one 1-row count collect whose value
      becomes a plan literal — the sanctioned bounded-scalar form, which
      also keeps the zero-seed guard probe scan-bounded). True
      linearity needs TWO-LEVEL
      assignment (coarse-quantize the seeds themselves, probe one
      coarse cell then its ~bounded seed subset — exactly the IVF
      fit/serve split shipped in operators/similarity.py), which trades
      oracle size for N*(2*sqrt(k)) assignment; at 100 TB that is the
      production path, composed from the existing IVF pieces.
    - FIXED-K mode (``n_clusters=k``): the k smallest-hash vectors seed
      — deterministic for tiny inputs where a hash-rate threshold could
      select zero seeds (unit tests, bounded side inputs).

    Production swaps the seed step for
    ``similarity.train_centroids_distributed`` (the k-means|| fit
    shipped for IVF, x14) at the cost of oracle-exactness; the prune
    stage is unchanged.

    Pruning rule (one-shot, order-free): a vector is DROPPED iff some
    SMALLER-id vector in the same cluster has cosine >= tau with it —
    every drop is witnessed by a kept-or-dropped earlier representative,
    so the kept set is the min-id representative cover of the
    tau-neighborhood graph restricted to clusters. One-shot (rather
    than sequentially re-checking against survivors only) keeps the
    operator a single self-join instead of an iterative loop; it prunes
    a superset of the sequential variant's drops on chains, which is the
    conservative direction for dedup.

    Scale shape: seeds are a k-row broadcast; assignment is a map-only
    broadcast join + per-row argmax (no shuffle); the prune self-join
    shuffles once on cluster id and its quadratic term is bounded by the
    largest cluster (k scales with corpus size, N/k held ~constant).

    Returns ``vec_id, cluster, kept`` (all BIGINT).
    """
    from pyspark.sql import Window as W

    from . import similarity

    h = md5_hash32(F.col(id_col).cast("string"))

    def _fixed_k_seeds(k: int) -> DataFrame:
        return (
            emb.select(
                F.col(id_col).alias("__seed_id"), F.col(vec_col).alias("__svec"), h.alias("__h")
            )
            .orderBy("__h", "__seed_id")
            .limit(k)
            .drop("__h")
        )

    if n_clusters is None:
        # one 1-row scalar collect (the sanctioned bounded form): the
        # threshold becomes a PLAN LITERAL, so the zero-seed probe below
        # is a genuine scan-until-first-match — with the previous
        # crossJoin-scalar form, seeds.limit(1) could not emit a row
        # until the full count aggregate finished, costing an extra
        # corpus pass per call. floor(2^32/sqrt(N)) in Python IEEE-754
        # doubles is bit-identical to the Spark/DuckDB expression the
        # oracle mirrors.
        n_total = emb.agg(F.count(F.lit(1))).collect()[0][0]
        threshold = (
            math.floor(4294967296.0 / math.sqrt(float(n_total))) if n_total else 0
        )
        seeds = emb.select(
            F.col(id_col).alias("__seed_id"), F.col(vec_col).alias("__svec")
        ).filter(
            md5_hash32(F.col("__seed_id").cast("string")) < F.lit(threshold).cast("long")
        )
        # zero-seed guard: P(no hash under the sqrt-rate threshold) is
        # ~e^(-sqrt(N)) — negligible at corpus scale but real for tiny N,
        # and an empty seed set would silently prune the WHOLE corpus.
        # Bounded probe (LocalLimit stops at the first seed found); on an
        # unlucky tiny input fall back to fixed-k min-hash seeding.
        if n_total > 0 and seeds.limit(1).count() == 0:
            seeds = _fixed_k_seeds(1)
    else:
        seeds = _fixed_k_seeds(n_clusters)
    wa = W.partitionBy(id_col).orderBy(F.desc("__cs"), F.asc("__seed_id"))
    if two_level:
        # TWO-LEVEL assignment (the true-linear scale path, IVF fit/serve
        # split applied to the medoid table itself): coarse-quantize the
        # seeds by a nested hash threshold (coarse set is a deterministic
        # SUBSET of the seeds — expected sqrt(k) of them), route every
        # seed and every vector to its argmax coarse cell, then argmax
        # only over the seeds in that cell. Assignment drops from N*k to
        # ~N*2*sqrt(k) cosines at the cost of an approximate (cell-
        # restricted) nearest seed — SemDeDup's own approximation regime.
        # Every coarse seed is a seed and routes to itself (cos=1), so no
        # cell is seedless and every vector finds >= 1 candidate.
        # same literal-threshold discipline as the sqrt-rate seeding: one
        # 1-row scalar collect of the seed count + max hash keeps the
        # coarse filter a plan literal (the in-plan crossJoin scalar would
        # re-run the seed aggregate in every downstream branch).
        #
        # The nested cut is a fraction of the SEEDS' OWN hash range
        # (max+1, so the max-hash seed itself stays eligible at k=1),
        # NOT of 2^32: seed hashes are uniform on [0, seed-threshold),
        # so floor((max+1)/sqrt(k)) selects an expected k/sqrt(k) =
        # sqrt(k) of them. Cutting at 2^32/k^(1/4) — the round-5 form —
        # always exceeds the seed threshold, making coarse == seeds and
        # silently degenerating two-level into single-level with MORE
        # cosines (caught when this path was promoted to an oracled
        # registry query, x68; its bit-exact twin would have been
        # vacuously identical to x52's).
        k_total, max_h = seeds.agg(
            F.count(F.lit(1)),
            F.max(md5_hash32(F.col("__seed_id").cast("string"))),
        ).collect()[0]
        c_threshold = (
            math.floor((float(max_h) + 1.0) / math.sqrt(float(k_total)))
            if k_total
            else 0
        )
        coarse = seeds.filter(
            md5_hash32(F.col("__seed_id").cast("string"))
            < F.lit(c_threshold).cast("long")
        ).select(F.col("__seed_id").alias("__cell"), F.col("__svec").alias("__cvec"))
        # same zero-subset exposure as the sqrt-rate seeds above: an empty
        # coarse set would leave every vector cell-less. Fall back to the
        # min-hash seed as the single coarse cell.
        if coarse.limit(1).count() == 0:
            coarse = (
                seeds.orderBy(md5_hash32(F.col("__seed_id").cast("string")), "__seed_id")
                .limit(1)
                .select(F.col("__seed_id").alias("__cell"), F.col("__svec").alias("__cvec"))
            )
        wc = W.partitionBy("__seed_id").orderBy(F.desc("__cc"), F.asc("__cell"))
        seed_cells = (
            seeds.crossJoin(F.broadcast(coarse))
            .withColumn("__cc", similarity.cosine(F.col("__svec"), F.col("__cvec")))
            .withColumn("__rn", F.row_number().over(wc))
            .filter(F.col("__rn") == 1)
            .select("__seed_id", "__svec", "__cell")
        )
        wv = W.partitionBy(id_col).orderBy(F.desc("__cc"), F.asc("__cell"))
        vec_cells = (
            emb.select(id_col, vec_col)
            .crossJoin(F.broadcast(coarse))
            .withColumn("__cc", similarity.cosine(F.col(vec_col), F.col("__cvec")))
            .withColumn("__rn", F.row_number().over(wv))
            .filter(F.col("__rn") == 1)
            .select(id_col, vec_col, "__cell")
        )
        assign = (
            vec_cells.join(F.broadcast(seed_cells), "__cell")
            .withColumn("__cs", similarity.cosine(F.col(vec_col), F.col("__svec")))
            .withColumn("__rn", F.row_number().over(wa))
            .filter(F.col("__rn") == 1)
            .select(F.col(id_col), F.col(vec_col), F.col("__seed_id").alias("cluster"))
        )
    else:
        assign = (
            emb.select(id_col, vec_col)
            .crossJoin(F.broadcast(seeds))
            .withColumn("__cs", similarity.cosine(F.col(vec_col), F.col("__svec")))
            .withColumn("__rn", F.row_number().over(wa))
            .filter(F.col("__rn") == 1)
            .select(F.col(id_col), F.col(vec_col), F.col("__seed_id").alias("cluster"))
        )
    a = assign.select(F.col(id_col).alias("__ida"), F.col(vec_col).alias("__va"), "cluster")
    b = assign.select(F.col(id_col).alias("__idb"), F.col(vec_col).alias("__vb"), "cluster")
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(similarity.cosine(F.col("__va"), F.col("__vb")) >= tau)
        .select(F.col("__idb").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )
    return (
        assign.join(dropped, id_col, "left")
        .select(
            F.col(id_col).cast("long").alias(id_col),
            F.col("cluster").cast("long").alias("cluster"),
            F.when(F.col("__dropped").isNull(), 1).otherwise(0).cast("long").alias("kept"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_count: int = 2,
    hash_fn: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """Span-level decontamination: CUT corpus-duplicated text out of each
    document (the removal counterpart of ``duplicate_span_coverage``'s
    measurement — Lee et al. 2022 ExactSubstr *removes* the duplicated
    substring rather than dropping the document; C4-style pipelines do
    the same at line level via corpus_line_dedup).

    A token position is removed iff it is covered by at least one
    ``n``-token span whose gram occurs >= ``min_count`` times
    corpus-wide; surviving tokens are reassembled in original order.

    Returns ``doc_id, n_tokens, n_removed, new_text`` (empty new_text
    when the whole doc was duplicated text or the doc was empty).

    Scale shape: shares duplicate_span_coverage's discipline — the gram
    count and occurrence join shuffle 8-byte hash keys; the extra work
    here is one token-level posexplode (outer-generate, see
    exploded_nonnull), a LEFT ANTI join of token positions against
    covered positions on (doc_id, pos), and a per-document
    sort_array(collect_list) reassembly bounded by document size. Text
    crosses a shuffle exactly once (the reassembly), as tokens.
    """
    from .text import exploded_nonnull, ngrams_from_tokens, tokens

    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.lower(F.col(text_col))).alias("toks")
    )
    toked = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        ngrams_from_tokens(F.col("toks"), n).alias("grams"),
    )
    occ = (
        exploded_nonnull(toked, "grams", "gram", "doc_id", pos="pos")
        .select("doc_id", "pos", hash_fn(F.col("gram")).alias("gh"))
    )
    dup_grams = (
        occ.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("occ_cnt"))
        .filter(F.col("occ_cnt") >= min_count)
    )
    covered = (
        occ.join(dup_grams.select("gh"), "gh")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("p"),
        )
        .distinct()
    )
    toks_pos = exploded_nonnull(base, "toks", "token", "doc_id", pos="p")
    kept = (
        toks_pos.join(covered, ["doc_id", "p"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("new_text"),
        )
    )
    stats = base.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    return stats.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("new_text"), F.lit("")).alias("new_text"),
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    min_containment_ppm: int = 0,
    hash_fn: Callable[[Column], Column] = F.xxhash64,
) -> DataFrame:
    """Asymmetric CONTAINMENT for near-dup candidates (Broder 1997, "On
    the resemblance and containment of documents" — public paper):
    containment(A in B) = |S(A) ∩ S(B)| / |S(A)| over distinct n-gram
    shingle sets, on the ppm integer grid. Asymmetry is the point —
    a quote or a subset document scores high containment in its superset
    while Jaccard (x05) stays low, so this is the quote/subset-detection
    twin of the symmetric near-dup belt.

    Candidate-bounded, never all-pairs: pairs come from the winnowing
    fingerprint index (winnowing_neardup_pairs — docs sharing >=
    ``min_shared`` fingerprints), and the exact shingle intersection is
    computed by routing A's shingles THROUGH the candidate pair list and
    probing B's shingle set on the (id_b, shingle) equi-key — work is
    sum over candidates of |S(A)|, linear in the candidate list times
    document size. At 100 TB key the probe by xxhash64(shingle) (8-byte
    keys) exactly as exact_dedup's doc notes; the raw-shingle join here
    keeps the DuckDB oracle a plain string join.

    Returns ``id_a, id_b, shared_shingles, cont_a_ppm, cont_b_ppm``
    (id_a < id_b; cont_a_ppm = containment of A in B) for candidates
    whose LARGER direction clears ``min_containment_ppm``.
    """
    from .text import exploded_nonnull

    cands = winnowing_neardup_pairs(
        df, id_col, text_col, k, window, min_shared, hash_fn
    ).select("id_a", "id_b")
    base = df.select(F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("__lc"))
    sh = exploded_nonnull(base, char_shingles_lc("__lc", n), "sh", "id")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a_side = cands.join(
        sh.select(F.col("id").alias("id_a"), "sh"), "id_a"
    )  # (id_a, id_b, sh) — A's shingles routed through the pair list
    inter = (
        a_side.join(sh.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("__na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("__nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("shared_shingles").cast("long").alias("shared_shingles"),
            F.expr("shared_shingles * 1000000L div __na").cast("long").alias("cont_a_ppm"),
            F.expr("shared_shingles * 1000000L div __nb").cast("long").alias("cont_b_ppm"),
        )
        .filter(
            F.greatest(F.col("cont_a_ppm"), F.col("cont_b_ppm"))
            >= F.lit(min_containment_ppm)
        )
    )
