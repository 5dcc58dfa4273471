"""Similarity search over embedding columns (array<float>).

Two paths:

- ``brute_force_topk``: exact cosine top-k via a broadcast cross join — the
  correctness baseline. All arithmetic is a deterministic left-to-right fold
  in doubles (JVM higher-order functions, no Python), so results are
  bit-stable across engines. Cost O(|queries| x |corpus|): fine when the
  query set is small/broadcastable; never for all-pairs at scale.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH buckets
  (sign-bit sketch from deterministic per-plane hash weights), candidates
  only within matching buckets (plus multi-probe via extra tables), exact
  re-rank inside the bucket. Turns the cross join into a bucket-equi-join:
  shuffle on bucket id, quadratic only within buckets.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Deterministic dot product of two array<float/double> columns
    (element-wise multiply in double, sequential fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: (query_id, neighbor_id, cos_sim, rnk), self-matches excluded,
    ties broken by neighbor id for determinism.
    """
    from ..localframe import fan_out

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    # the corpus side carries the O(corpus x queries) dot-product work;
    # fan a single-row-group scan out so it parallelizes (no-op at scale)
    c = fan_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def cosine_arrow_udf():
    """Vectorized (Arrow-batched) pandas_udf cosine — the fallback path for
    similarity math the built-in higher-order functions can't express (e.g.
    calling into numpy/faiss-style kernels). ~10-100x faster than
    row-at-a-time Python UDFs; still slower than the JVM fold in
    ``cosine``, which is why the JVM path is the default.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype("float64")
        mb = np.stack(b.to_numpy()).astype("float64")
        num = (ma * mb).sum(axis=1)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(num / den)

    return cos


def normalize_per_group(
    df: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding standardization (subtract the group centroid)
    via ``groupBy().applyInPandas`` — the grouped-map Arrow path for logic
    that needs a whole group in memory at once (fit-per-group transforms,
    whitening, per-cluster PCA seeds).

    Each group must fit in one executor's memory — that is the operator's
    contract at any scale; groups here are label partitions (~corpus/10).
    """
    import numpy as np

    schema = f"{id_col} long, {group_col} int, centered array<double>"

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        centered = mat - mat.mean(axis=0)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                group_col: pdf[group_col].to_numpy(),
                "centered": list(centered),
            }
        )

    return df.select(id_col, group_col, vec_col).groupBy(group_col).applyInPandas(
        center, schema=schema
    )


def quantization_scale(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Corpus-wide symmetric int8 quantization scale: 127 / max(|v_ij|),
    as a 1-row DataFrame (column ``__qscale``) to be crossJoin-broadcast
    into the quantize step (the J9 scalar-subquery idiom — no driver
    collect). One map-reduce over per-row array maxima: the shuffle
    payload is one double per partition."""
    per_row_max = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    return df.select(per_row_max.alias("__m")).agg(
        (F.lit(127.0) / F.max("__m")).alias("__qscale")
    )


def quantize_int8(vec_col: Column | str, scale: Column) -> Column:
    """Symmetric scalar quantization to int8 range: round-half-up via
    floor(v*scale + 0.5) — spelled out instead of round() because
    HALF_UP/HALF_EVEN conventions differ across engines while floor is
    universal — then clamped to [-127, 127]. Returns array<long> (the
    arithmetic stays integral; storage would narrow to byte)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x.cast("double") * scale + F.lit(0.5))),
        ).cast("long"),
    )


def int_dot(a: Column, b: Column) -> Column:
    """Integer dot product — exact and order-independent (integer addition
    is associative), so cross-engine bit-identical unlike float folds."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k under int8 scalar quantization (the memory/bandwidth
    scale path: 4x smaller vectors than float32, integer SIMD kernels on
    real hardware). Quantize corpus and queries with ONE corpus-fit scale,
    rank by integer dot product (ties by neighbor id).

    Unlike float ANN, every step here is integral after the single
    quantization map, so the whole result is bit-exact across engines —
    this is the rare similarity operator with a full-value oracle rather
    than an invariant one. Recall vs the float baseline is asserted in
    tests (x09 is the exact-float twin). Scale shape: scale fit is one
    map-reduce; scoring reuses the broadcast cross-join + per-query top-k
    of brute_force_topk (swap in lsh/ivf bucketing for huge query sets)."""
    scale = quantization_scale(corpus, vec_col)
    qz = lambda df, out: (  # noqa: E731
        df.crossJoin(F.broadcast(scale)).select(
            F.col(id_col), quantize_int8(vec_col, F.col("__qscale")).alias(out)
        )
    )
    q = qz(queries, "q_vec").withColumnRenamed(id_col, "query_id")
    c = qz(corpus, "c_vec").withColumnRenamed(id_col, "neighbor_id")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", int_dot(F.col("q_vec"), F.col("c_vec")).alias("qdot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "qdot", F.col("rnk").cast("long").alias("rnk"))
    )


def _broadcast_queries_or_not(
    queries: DataFrame, broadcast_queries: bool | None, threshold_rows: int
) -> bool:
    """Guard for the ANN operators' query-side broadcast.

    ``F.broadcast(queries)`` is right for the common serve shape (a small
    query batch against a huge corpus) but OOMs an executor when callers
    feed corpus-vs-corpus (all-pairs ANN). Resolution order: an explicit
    ``broadcast_queries`` wins; ``None`` probes with a bounded
    ``limit(threshold+1).count()`` job (LocalLimit stops the scan at
    threshold+1 rows — it never counts the full table) and falls back to a
    shuffle join on the bucket/cell key when the query side exceeds
    ``threshold_rows``. The shuffle path is the same logical plan minus the
    hint; Spark plans a sort-merge/shuffled-hash join keyed on the bucket.
    """
    if broadcast_queries is not None:
        return broadcast_queries
    return queries.limit(threshold_rows + 1).count() <= threshold_rows


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 4,
    num_tables: int = 12,
    dim: int | None = None,
    sketch: str = "arrow",
    broadcast_queries: bool | None = True,
    broadcast_threshold_rows: int = 100_000,
) -> DataFrame:
    """Approximate cosine top-k: multi-table random-hyperplane LSH.

    Each of ``num_tables`` hash tables buckets vectors by the sign pattern of
    ``num_planes`` projections; candidates are the union over tables of
    same-bucket pairs, then exact re-rank. A single sign-table has poor
    recall in high dimensions (a true neighbor flips one plane and is gone)
    — the union over L independent tables gives recall ~ 1-(1-p^b)^L where
    p = 1 - theta/pi. Defaults (b=4, L=12) target ~0.8 recall even on
    near-random corpora (neighbor cos ~0.3); with real near-dup structure
    (cos > 0.9, p > 0.9) far fewer tables suffice — tune b up / L down as
    similarity concentrates.

    At 100 TB: the cross join becomes a shuffle on (table, bucket); tune
    planes up for bucket size, tables up for recall.

    ``dim`` must be known before planning: pass it explicitly, or attach
    ``{"dim": N}`` to the vector column's metadata
    (``F.col(v).alias(v, metadata={"dim": N})``). There is deliberately NO
    runtime ``.first()`` probe — that would launch an extra Spark job (a
    full scan stage at 100 TB) before the main plan, just to read a length
    the caller already knows (tests/test_similarity.py asserts zero
    pre-plan jobs).

    ``sketch`` picks how the sign sketch is computed:

    - ``'arrow'`` (default): one vectorized pandas_udf — the whole batch of
      vectors times the (dim x tables*planes) plane matrix as a single
      numpy matmul, then sign-packing. This is the Pandas-UDF-done-right
      shape: per-row work is a dense matvec, which an Arrow batch turns
      into one BLAS call (~10x the expression-tree path at 48 projections).
    - ``'jvm'``: pure Catalyst higher-order-function folds (no Python
      worker at all). Right when planes*tables is small or Python workers
      are undesirable; the expression tree grows with tables*planes*dim
      and falls out of whole-stage codegen when large.

    Both produce valid (slightly different, float-rounding) bucketings;
    each is deterministic for a fixed corpus and config.

    ``broadcast_queries``: True (default — the small-query serve shape),
    False (corpus-vs-corpus: shuffle join on (table, bucket)), or None
    (auto: bounded row probe vs ``broadcast_threshold_rows``, see
    ``_broadcast_queries_or_not``).
    """
    if dim is None:
        meta = corpus.schema[vec_col].metadata or {}
        dim = meta.get("dim")
    if dim is None:
        raise ValueError(
            f"lsh_bucketed_topk: vector dimension unknown — pass dim= or attach "
            f"{{'dim': N}} metadata to column {vec_col!r} (no runtime probe: it "
            "would cost an extra full-scan job before the main plan)"
        )
    planes = _deterministic_planes(num_planes * num_tables, int(dim))
    do_bcast = _broadcast_queries_or_not(queries, broadcast_queries, broadcast_threshold_rows)

    if sketch == "arrow":
        import numpy as np
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, LongType

        w = np.asarray(planes, dtype="float64").T  # (dim, tables*planes)
        n_t, n_p = num_tables, num_planes

        @pandas_udf(ArrayType(LongType()))
        def bucket_ids(vecs: pd.Series) -> pd.Series:
            mat = np.stack(vecs.to_numpy()).astype("float64")  # (batch, dim)
            signs = (mat @ w) >= 0  # (batch, tables*planes)
            packed = np.zeros((len(mat), n_t), dtype="int64")
            for p in range(n_p):
                packed |= signs[:, p::n_p].astype("int64") << p
            return pd.Series(list(packed))

        def with_buckets(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
            return df.select(
                F.col(id_col).alias(id_alias),
                F.col(vec_col).alias(vec_alias),
                F.posexplode(bucket_ids(F.col(vec_col))).alias("table", "bucket"),
            )

        q = with_buckets(queries, "query_id", "q_vec")
        c = with_buckets(corpus, "neighbor_id", "c_vec")
        candidates = (
            c.join(F.broadcast(q) if do_bcast else q, ["table", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "q_vec", "neighbor_id", "c_vec")
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        scored = candidates.select(
            "query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim")
        )
        w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
        return scored.withColumn("rnk", F.row_number().over(w_rank)).filter(F.col("rnk") <= k)

    def bucket_entries(vec: Column) -> Column:
        """array<struct<table:int, bucket:bigint>> — one entry per table."""
        entries = []
        for t in range(num_tables):
            s = F.lit(0).cast("long")
            for p in range(num_planes):
                w = planes[t * num_planes + p]
                arr = F.array(*[F.lit(wi) for wi in w])
                proj = F.aggregate(
                    F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                s = s + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(0)
            entries.append(F.struct(F.lit(t).alias("table"), s.alias("bucket")))
        return F.array(*entries)

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(bucket_entries(F.col(vec_col))).alias("tb"),
    ).select("query_id", "q_vec", "tb.table", "tb.bucket")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.explode(bucket_entries(F.col(vec_col))).alias("tb"),
    ).select("neighbor_id", "c_vec", "tb.table", "tb.bucket")
    candidates = (
        c.join(F.broadcast(q) if do_bcast else q, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def train_centroids(
    corpus: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 1024,
    iters: int = 4,
) -> list[list[float]]:
    """Fit IVF centroids: ONE bounded Spark job (deterministic hash-spread
    top-N sample) + driver-side spherical k-means in numpy. This is the
    FAISS-style train/serve split — the fit runs once at index-build time
    and its centroids are then passed to ``ivf_topk`` (which is single-job
    given ``centroids``), amortized over every subsequent query.

    The sample is selected by ``hash_spread_sample`` (order by md5 of the
    id, not by the id): ids typically correlate with source in concatenated
    corpora, so the previous ``orderBy(id).limit(n)`` would fit all
    centroids to whichever source sorted first. Hash order keeps the same
    determinism with source-independent coverage. For a fit that sees the
    WHOLE corpus rather than a sample, use ``train_centroids_distributed``.
    """
    import numpy as np

    from .sampling import hash_spread_sample

    rows = hash_spread_sample(corpus, id_col, sample_size).select(vec_col).collect()
    x = np.stack([np.asarray(r[0], dtype="float64") for r in rows])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = x[:num_centroids].copy()
    for _ in range(iters):
        assign = (x @ cents.T).argmax(axis=1)
        for j in range(num_centroids):
            members = x[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cents[j] = c / n
    return cents.tolist()


def train_centroids_distributed(
    corpus: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 4,
    dim: int | None = None,
) -> list[list[float]]:
    """Spherical k-means fit over the WHOLE corpus, k-means||-style: one
    Spark job per iteration, only ``num_centroids`` vectors ever reach the
    driver.

    Each iteration: (1) map stage assigns every vector to its nearest
    current centroid — centroids ship to executors inside the Arrow UDF
    closure, a (batch x dim) @ (dim x k) matmul per batch; (2) the new
    centroid is the per-cell elementwise mean, computed as
    posexplode(vector) -> groupBy(cell, pos).avg — a single shuffle of
    (cell, pos, partial-sum) pairs with map-side combine, k*dim rows out.
    Initial centroids are the deterministic hash-spread sample so iteration
    0 starts source-unbiased (cf. ``train_centroids``).

    At 100 TB this is the standard public recipe (Bahmani et al.,
    "Scalable k-means++", VLDB 2012): no driver-side data pass, shuffle
    volume k*dim per map task, convergence in a handful of passes.
    """
    import numpy as np

    from .sampling import hash_spread_sample

    seed_rows = hash_spread_sample(corpus, id_col, num_centroids).select(vec_col).collect()
    cents = np.stack([np.asarray(r[0], dtype="float64") for r in seed_rows])
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    for _ in range(iters):
        cmat = cents  # rebind for closure capture of this iteration's value

        @pandas_udf(LongType())
        def nearest(vecs: pd.Series) -> pd.Series:
            import numpy as _np

            mat = _np.stack(vecs.to_numpy()).astype("float64")
            mat = mat / _np.linalg.norm(mat, axis=1, keepdims=True)
            return pd.Series((mat @ cmat.T).argmax(axis=1).astype("int64"))

        means = (
            corpus.select(nearest(F.col(vec_col)).alias("cell"), F.col(vec_col).alias("v"))
            .select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = cents.copy()
        by_cell: dict[int, list[tuple[int, float]]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], []).append((r["pos"], r["m"]))
        for cell, pts in by_cell.items():
            vec = np.asarray([m for _, m in sorted(pts)])
            n = np.linalg.norm(vec)
            if n > 0:
                new[cell] = vec / n
        cents = new
    return cents.tolist()


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    dim: int | None = None,
    centroids: list[list[float]] | None = None,
    assign: str = "arrow",
    broadcast_queries: bool | None = True,
    broadcast_threshold_rows: int = 100_000,
) -> DataFrame:
    """IVF-style approximate NN: partition the corpus into ``num_centroids``
    Voronoi cells, probe the ``nprobe`` nearest cells per query, exact
    re-rank inside.

    Centroid source, in priority order: ``centroids`` (e.g. from an offline
    k-means fit), else deterministic pseudo-random directions when ``dim``
    is given (single-job: no data access before the main plan — cosine
    assignment only needs directions, so unit-scale pseudo-random centroids
    partition the sphere), else a collected corpus sample (legacy; costs an
    extra Spark job).

    At 100 TB the assignment is a map stage (centroids broadcast as
    literals), the probe is an equi-join on cell id, and quadratic work is
    confined to |query| x |cells probed| x |cell|. Higher num_centroids ->
    smaller cells; higher nprobe -> better recall.

    ``broadcast_queries``: True (default serve shape) / False
    (corpus-vs-corpus: shuffle join on cell) / None (auto row probe) —
    see ``_broadcast_queries_or_not``.
    """
    import math

    do_bcast = _broadcast_queries_or_not(queries, broadcast_queries, broadcast_threshold_rows)

    if centroids is not None:
        cents = [list(c) for c in centroids]
    elif dim is not None:
        cents = _deterministic_planes(num_centroids, dim)
    else:
        from .sampling import hash_spread_sample

        cent_rows = hash_spread_sample(corpus, id_col, num_centroids).select(vec_col).collect()
        cents = [list(r[0]) for r in cent_rows]
    norms = [math.sqrt(sum(x * x for x in c)) for c in cents]

    if assign == "arrow":
        # cell assignment / probing as ONE numpy matmul per Arrow batch —
        # same rationale as lsh_bucketed_topk's sketch='arrow': dense
        # per-row linear algebra belongs in a vectorized pandas_udf, not a
        # num_centroids-wide Catalyst expression tree
        import numpy as np
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, LongType

        cmat = np.asarray(cents, dtype="float64")
        cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
        n_probe = nprobe

        def _cell_sims(vecs: pd.Series):
            import numpy as _np

            mat = _np.stack(vecs.to_numpy()).astype("float64")
            mat = mat / _np.linalg.norm(mat, axis=1, keepdims=True)
            return mat @ cmat.T  # (batch, num_centroids)

        @pandas_udf(LongType())
        def best_cell(vecs: pd.Series) -> pd.Series:
            return pd.Series(_cell_sims(vecs).argmax(axis=1).astype("int64"))

        @pandas_udf(ArrayType(LongType()))
        def probe_cells(vecs: pd.Series) -> pd.Series:
            sims = _cell_sims(vecs)
            order = (-sims).argsort(axis=1, kind="stable")[:, :n_probe]
            return pd.Series(list(order.astype("int64")))

        assigned = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            best_cell(F.col(vec_col)).alias("cell"),
        )
        probed = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(probe_cells(F.col(vec_col))).alias("cell"),
        )
        scored = (
            assigned.join(F.broadcast(probed) if do_bcast else probed, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim")
            )
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
        return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)

    def cell_scores(vec: Column) -> Column:
        """array<struct<c: double, i: int>> of cosine-to-centroid, probe-sortable."""
        entries = []
        vnorm = l2_norm(vec)
        for i, (c, n) in enumerate(zip(cents, norms)):
            arr = F.array(*[F.lit(x) for x in c])
            cos = dot(vec, arr) / (vnorm * F.lit(n))
            entries.append(F.struct(cos.alias("c"), F.lit(i).alias("i")))
        return F.array(*entries)

    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.array_max(cell_scores(F.col(vec_col)))["i"].alias("cell"),
    )
    probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            F.transform(
                F.slice(
                    F.sort_array(cell_scores(F.col(vec_col)), asc=False), 1, nprobe
                ),
                lambda s: s["i"],
            )
        ).alias("cell"),
    )
    scored = (
        assigned.join(F.broadcast(probed) if do_bcast else probed, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 1024,
    iters: int = 6,
) -> list[list[list[float]]]:
    """Fit product-quantization codebooks (Jégou, Douze, Schmid 2011,
    "Product Quantization for Nearest Neighbor Search", TPAMI — public
    paper): split the L2-NORMALIZED vector into ``m`` contiguous subspaces
    and fit an independent ``ksub``-word k-means codebook per subspace.
    A vector is then stored as ``m`` code bytes instead of ``dim`` floats
    (64-dim float32 -> 8 bytes: 32x), and inner products against a query
    become ``m`` table lookups (ADC).

    Fit protocol mirrors ``train_centroids``: ONE bounded Spark job (the
    deterministic hash-spread sample — source-unbiased, see that
    docstring) + driver-side numpy Lloyd iterations per subspace.
    Normalizing before fitting makes ADC inner products approximate
    COSINE, so PQ ranking is comparable to the exact baseline.
    Returns ``m x ksub x (dim//m)`` nested lists (JSON-serializable —
    the index artifact a real pipeline persists next to the codes)."""
    import numpy as np

    from .sampling import hash_spread_sample

    rows = hash_spread_sample(corpus, id_col, sample_size).select(vec_col).collect()
    x = np.stack([np.asarray(r[0], dtype="float64") for r in rows])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    dim = x.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    dsub = dim // m
    books = []
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cents = sub[:ksub].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents.tolist())
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m`` codebook indices (array<long>).
    Index-build-time op: one Arrow-batched pass; per batch, each subspace
    assignment is a (batch x ksub) distance matmul in numpy. Codes travel
    as m small ints — the 100 TB point of PQ is that the SCAN side of ANN
    reads codes, not vectors."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cb = np.asarray(codebooks, dtype="float64")  # m x ksub x dsub
    m, _ksub, dsub = cb.shape

    @pandas_udf("array<long>")
    def encode(vecs: pd.Series) -> pd.Series:
        import numpy as _np

        x = _np.stack(vecs.to_numpy()).astype("float64")
        x = x / _np.linalg.norm(x, axis=1, keepdims=True)
        codes = _np.empty((x.shape[0], m), dtype="int64")
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            # argmin ||s - c||^2 == argmax (2 s.c - ||c||^2)
            scores = 2.0 * sub @ cb[j].T - (cb[j] ** 2).sum(axis=1)[None, :]
            codes[:, j] = scores.argmax(axis=1)
        return pd.Series(list(codes))

    return df.select(F.col(id_col), encode(F.col(vec_col)).alias("pq_codes"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 50,
    broadcast_queries: bool | None = None,
    broadcast_threshold_rows: int = 100_000,
) -> DataFrame:
    """PQ ANN with ADC scoring + exact refine (the FAISS ``IndexPQ`` +
    refine recipe):

    1. **Encode** the corpus once (``pq_encode``) — at scale this is the
       persisted index; here it is built inline.
    2. **ADC scan**: per query, an m x ksub lookup table of partial inner
       products (query subvector x codeword) is computed ONCE (JVM literal
       fold over the codebook constants); the corpus scan then scores each
       row as ``sum_j lut[j][code_j]`` — an O(m) array fold over 8-byte
       codes, never touching the float vectors. Queries broadcast under the
       same guard as the LSH/IVF paths (shuffle fallback for corpus-sized
       query sets).
    3. **Refine**: the top-``shortlist`` ADC candidates per query hydrate
       their full vectors back by id equi-join (shortlist*queries rows —
       tiny, broadcastable) and are re-ranked by EXACT cosine. Recall is
       then a function of shortlist depth, not raw 8-byte code fidelity.

    Output: (query_id, neighbor_id, cos_sim, rnk) — same contract as
    brute_force_topk; self-matches excluded, ties by neighbor id."""
    codes = pq_encode(corpus, codebooks, id_col, vec_col)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cb_lit = F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(v)) for v in word])
                    for word in codebooks[j]
                ]
            )
            for j in range(m)
        ]
    )
    qn = F.col("q_raw")
    inv_norm = F.lit(1.0) / l2_norm(qn)
    # lut[j][c] = dot(normalized-query subvector j, codeword c) — built once
    # per query row from the codebook literal, all JVM.
    lut = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            cb_lit[j],
            lambda word: F.aggregate(
                F.zip_with(
                    F.slice(qn, j * dsub + 1, dsub),
                    word,
                    lambda x, c: x.cast("double") * inv_norm * c,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        ),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_raw")
    ).select("query_id", F.col("q_raw").alias("q_vec"), lut.alias("__lut"))
    if _broadcast_queries_or_not(queries, broadcast_queries, broadcast_threshold_rows):
        q = F.broadcast(q)
    adc = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .join(q, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(
                    F.element_at("__lut", j + 1),
                    F.element_at("pq_codes", j + 1).cast("int") + 1,
                ),
            ).alias("adc_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_score"), "neighbor_id")
    cand = (
        adc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    # exact refine: hydrate candidate vectors (shortlist*queries rows ->
    # broadcast THEM, stream the corpus once) and re-rank by true cosine
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    refined = (
        F.broadcast(cand)
        .join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return refined.withColumn("rnk", F.row_number().over(w2)).filter(F.col("rnk") <= k)


def _deterministic_planes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (splitmix64 in plain Python —
    driver-side constants, broadcast as literals)."""
    planes: list[list[float]] = []
    state = 0x9E3779B97F4A7C15
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            z = state
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z = z ^ (z >> 31)
            row.append(z / 2**64 * 2 - 1)
        planes.append(row)
    return planes
