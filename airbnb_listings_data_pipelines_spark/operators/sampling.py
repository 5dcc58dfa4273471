"""Deterministic sampling operators for training-data pipelines.

Hash-based sampling beats RNG-based ``sample()``/``sampleBy()`` at scale:
membership is a pure function of the row key, so the sample is reproducible
across runs, engines, executors-counts, and retries (no seed/partition
coupling), and incremental reruns keep prior decisions stable. The hash is
``md5_hash32`` so a SQL oracle (DuckDB) derives the identical sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash32


def hash_sample_bucket(key: Column | str, buckets: int = 1000) -> Column:
    """Stable per-row bucket in [0, buckets): md5_hash32(key) % buckets."""
    c = F.col(key) if isinstance(key, str) else key
    return md5_hash32(c.cast("string")) % buckets


def hash_spread_sample(df: DataFrame, key_col: str, n: int) -> DataFrame:
    """Deterministic n-row sample spread uniformly across the keyspace:
    order by (md5_hash32(key), key) and take the first n.

    Plans as TakeOrderedAndProject (per-partition top-N heap, driver merge
    of n rows per partition) — one bounded job regardless of table size.
    Unlike ``orderBy(key).limit(n)``, selection is independent of key
    order, so key-correlated sources (typical in concatenated corpora,
    where low ids all come from the first source) cannot bias the sample.
    """
    c = F.col(key_col)
    return df.orderBy(md5_hash32(c.cast("string")), c).limit(n)


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 1.0,
    buckets: int = 1000,
) -> DataFrame:
    """Keep each row iff hash_bucket(key) < fraction[stratum] * buckets.

    Per-stratum downsampling (e.g. rebalance over-represented languages)
    with exact cross-engine reproducibility — the scale-safe replacement
    for ``sampleBy`` (whose output depends on the RNG stream, hence on
    partitioning). Map-only: no shuffle, no state.
    """
    frac = F.lit(default_fraction)
    for value, p in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(frac)
    # round, don't truncate: 0.8*1000 may be 799.999... in binary floats
    thresh = F.round(frac * buckets).cast("long")
    return df.filter(hash_sample_bucket(F.col(key_col), buckets) < thresh)


def weighted_bernoulli_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    weight_cap: Column,
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling in EXACT integer
    arithmetic: keep a row iff

        md5_hash32(key) * cap  <  weight * 2^32

    i.e. with probability weight/cap, using the key hash as the uniform
    draw. Both sides are BIGINT products (no float rounding, no RNG
    state), so the sample is reproducible across runs, engines, and
    partitionings, and stable under incremental corpus growth — the same
    guarantees as hash_stratified_sample, extended to PER-ROW
    probabilities (quality-weighted corpus downsampling). ``weight_cap``
    arrives as a 1-row broadcast column (J9 idiom), typically
    max(weight) over the corpus.

    Overflow envelope (same discipline as q66's BIGINT moments): h is in
    [0, 2^32), so ``h * cap`` stays inside int64 only while cap < 2^31,
    and the exact-integer guarantee requires integer-valued, non-negative
    weights (a fractional weight would be silently truncated by the long
    cast — 0.9 would become 0 and drop every such row). Fractional-weight
    corpora must rescale to an integer grid first (e.g. round(w * 1000)).
    Violations raise per-row instead of corrupting the sample.

    Map-only after the 1-row broadcast: runs at scan speed at 100 TB.
    """
    h = md5_hash32(F.col(key_col).cast("string"))
    w = F.col(weight_col)
    valid = (
        (w >= 0)
        & (w == F.floor(w))
        & (weight_cap.cast("long") < F.lit(1 << 31).cast("long"))
    )
    keep = h * weight_cap < w.cast("long") * F.lit(1 << 32).cast("long")
    return df.filter(
        F.when(valid, keep).otherwise(
            F.raise_error(
                F.lit(
                    "weighted_bernoulli_sample requires non-negative integer-valued "
                    "weights and weight_cap < 2^31 (rescale fractional weights to an "
                    "integer grid first)"
                )
            ).cast("boolean")
        )
    )


def temperature_mixture_sample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    frac: float = 0.2,
) -> DataFrame:
    """Temperature-based source mixing (the multinomial alpha-sampling of
    multilingual/multi-source LLM corpora — Raffel et al. 2020 (T5) §3.4.3
    / Conneau et al. 2020 (XLM-R) eq. 1, both public): source ``s`` with
    ``n_s`` rows receives sampling weight w_s = n_s^alpha / sum_j n_j^alpha,
    so alpha < 1 up-samples small sources relative to their share and
    alpha = 1 is proportional mixing. With a total budget of
    ``frac * N`` rows, each row of source s keeps with probability
    min(1, budget * w_s / n_s).

    Selection is the engine-reproducible exact-integer hash Bernoulli of
    weighted_bernoulli_sample: md5_hash32(id) < floor(p_s * 2^32) — no RNG
    state, stable under retries and engine swaps, and a DuckDB oracle
    derives the identical sample.

    Cross-engine exactness of the RATES: alpha defaults to 0.5 because
    n^0.5 is IEEE-754 sqrt (correctly rounded, bit-identical everywhere),
    and the per-source sqrt is quantized to an exact 1e-9 integer grid
    BEFORE the cross-source sum, so the denominator is an associative
    integer sum rather than an order-dependent double reduction (registry
    hash-stability rule 1). The remaining double products stay exact
    below 2^53 — safe to ~10^15 budget x grid units; past that, switch
    the comparison to integer rationals (h * denom * n_s < budget * squ *
    2^32 in 128-bit), same discipline as weighted_bernoulli_sample's
    overflow envelope.

    Shuffle shape: one count-by-source aggregate (tiny), rates broadcast
    back onto the corpus, then a map-only filter — the corpus is read
    once and never shuffled.
    """
    src = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    units = src.withColumn(
        "__squ",
        F.round(F.pow(F.col("__n").cast("double"), F.lit(alpha)) * 1e9, 0).cast("long"),
    )
    denom = units.agg(F.sum("__squ").alias("__d")).withColumn("__k", F.lit(1))
    total = df.agg(
        F.round(F.count(F.lit(1)) * F.lit(frac), 0).cast("long").alias("__t")
    ).withColumn("__k", F.lit(1))
    rates = (
        units.withColumn("__k", F.lit(1))
        .join(F.broadcast(denom), "__k")
        .join(F.broadcast(total), "__k")
        .select(
            source_col,
            F.least(
                F.lit(1.0),
                (F.col("__t").cast("double") * F.col("__squ") / F.col("__d"))
                / F.col("__n"),
            ).alias("__p"),
        )
    )
    h = md5_hash32(F.col(id_col).cast("string"))
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(h < F.floor(F.col("__p") * F.lit(4294967296.0)).cast("long"))
        .drop("__p")
    )


def dsir_importance_scores(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling") on an exact integer
    grid.

    DSIR fits unigram bag-of-words models over a small TARGET corpus
    (the domain you want more of) and the RAW corpus, then scores each
    raw document by its likelihood ratio under the two models and
    resamples proportionally. The shipped form replaces the log-ratio
    sum (float, reduction-order-dependent across engines) with exact
    integer rationals:

    - per-token frequencies are normalized to parts-per-million:
      ``p_ppm = p_c*1e6 div P``, ``q_ppm = q_c*1e6 div Q`` (P/Q = total
      target/raw token counts) — add-one smoothed on the ppm grid;
    - per-token importance ratio ``r = (p_ppm+1)*1000 div (q_ppm+1)``
      (1e-3 grid, ratio form; the log-space variant is a one-line swap
      but floats would break cross-engine hash equality);
    - per-doc score = SUM(tf * r) over the doc's tokens, then
      length-normalized: ``lr_per_token = score div dl`` (the per-token
      average importance — DSIR's average log-likelihood-ratio analog);
    - ``selected = lr_per_token > floor-mean(lr_per_token)`` over the
      raw set: the global mean arrives as a 1-row broadcast scalar
      (integer floor-division mean — no sort, no percentile pass).

    Overflow envelope: ``p_ppm ≤ 1e6`` so ``r ≤ ~1e9``; per-doc score ≤
    dl_max * 1e9 (int64-safe for dl ≤ 1e9); ``lr_per_token ≤ 1e9`` so
    the global SUM fits int64 through ~9e9 raw docs. ``p_c*1e6`` needs
    P ≤ 9e12 tokens per stats universe — shard beyond that.

    Scale shape: one explode + conditional-sum agg fits BOTH unigram
    models in a single vocabulary pass (map-side combine); the
    vocabulary table joins back to raw tokens on term (broadcastable
    when the vocab is bounded, AQE skew-join otherwise); everything
    else is map-only or a 1-row broadcast. The corpus never collects.

    Returns ``doc_id, score, dl, lr_per_token, selected`` for RAW docs.
    """
    from . import text

    toks = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("doc_id"),
        is_target.cast("boolean").alias("__tgt"),
        F.explode(text.tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    vocab = toks.groupBy("term").agg(
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("p_c"),
        F.sum(F.when(F.col("__tgt"), 0).otherwise(1)).alias("q_c"),
    )
    totals = vocab.agg(
        F.sum("p_c").alias("__p_tot"), F.sum("q_c").alias("__q_tot")
    )  # 1 row -> broadcast scalar (J9 idiom)
    # Empty-corpus guard (the x32/x31 empty-input divergence class): a
    # zero token total would make Spark emit NULL ppm (x div 0 = NULL)
    # while DuckDB's // raises — fail loudly and identically instead.
    ratios = (
        vocab.crossJoin(F.broadcast(totals))
        .select(
            "term",
            F.when(
                (F.col("__p_tot") > 0) & (F.col("__q_tot") > 0),
                F.expr(
                    "(((p_c * 1000000L) div __p_tot) + 1L) * 1000L"
                    " div (((q_c * 1000000L) div __q_tot) + 1L)"
                ),
            )
            .otherwise(
                F.raise_error(
                    F.lit(
                        "dsir_importance_scores: target and raw corpora must both "
                        "contain at least one token"
                    )
                )
            )
            .alias("r"),
        )
    )
    raw_tf = (
        toks.filter(~F.col("__tgt"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        raw_tf.join(ratios, "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("r")).alias("score"),
            F.sum("tf").alias("dl"),
        )
        .withColumn("lr_per_token", F.expr("score div dl"))
    )
    mean = scored.agg(
        F.expr("sum(lr_per_token) div count(*)").alias("__mean")
    )  # floor-mean as a 1-row broadcast scalar
    return (
        scored.crossJoin(F.broadcast(mean))
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("score").cast("long").alias("score"),
            F.col("dl").cast("long").alias("dl"),
            F.col("lr_per_token").cast("long").alias("lr_per_token"),
            (F.col("lr_per_token") > F.col("__mean")).cast("long").alias("selected"),
        )
    )
