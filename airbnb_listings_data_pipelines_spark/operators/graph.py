"""Connected components over candidate-pair edges — the dedup-cluster
collapse step of a near-duplicate pipeline (pairs from MinHash/SimHash ->
components -> keep one canonical doc per component).

Algorithm: min-label propagation with POINTER DOUBLING. Each round does
(a) hash-to-min — every node adopts the min label among itself and its
neighbors (one edges->labels join + one min-agg), then (b) a pointer jump
— every node re-labels to its label's label (one labels->labels self-join).
The jump makes label chains collapse geometrically, so convergence takes
O(log diameter) rounds instead of O(diameter): a 40-node path converges in
~6 rounds, not 40. Every step is a hash shuffle on node id; the driver
loop only orchestrates (a 1-row convergence probe per round) and each
round's result is localCheckpoint'ed so lineage stays flat across
iterations. This is the standard MapReduce/Spark CC recipe (hash-to-min,
Rastogi et al.) — all data stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    ``edges`` is undirected input (each pair once); isolated nodes absent
    from ``edges`` are absent from the output (join the node table back
    with a coalesce-to-self for full coverage).

    ``max_iterations`` is a runaway backstop, not a tuning knob: the loop
    exits on the convergence probe, and pointer doubling needs only
    O(log diameter) rounds (~17 for a 100k-node path — measured in
    tools/probe_cc_convergence.py; near-dup clique graphs converge in 2-3).
    50 covers any graph with diameter < 2^49.

    Pass ``stats={}`` to receive {'rounds': n, 'converged': bool} back —
    used by the convergence probe and available to production callers for
    monitoring.
    """
    # materialize the (possibly expensive) edge lineage ONCE — every round
    # joins against sym, and an unmaterialized candidate-pair plan (e.g.
    # SimHash banding) would otherwise re-execute per iteration. The
    # symmetric closure is built with ONE explode over the pair rows, not
    # a self-union: a union evaluates the (expensive) pair lineage twice
    # inside the checkpoint job unless exchange reuse happens to fire.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .localCheckpoint(eager=True)
    )
    rounds, converged = 0, False
    # round 1's hash-to-min against identity labels is just min(u, min v)
    # per node — one aggregate, no labels join. ``__old`` carries the
    # pre-round label so the convergence probe below needs no join.
    stepped = (
        sym.groupBy("u")
        .agg(F.min("v").alias("__mv"))
        .select(
            "u",
            F.least(F.col("u"), F.col("__mv")).alias("label"),
            F.col("u").alias("__old"),
        )
    )
    labels = stepped
    from pyspark.sql import Observation

    for _ in range(max_iterations):
        # pointer jump: label <- label(label); the label is itself a
        # node id, so chains of stale labels collapse geometrically.
        # The convergence probe rides INSIDE the checkpoint job as an
        # observed metric (round-14, guide §1.4): the eager
        # localCheckpoint is already an action, so summing ``__chg``
        # there makes each round exactly ONE job — the former
        # filter().limit(1).count() probe per round is gone.
        obs = Observation()
        jumped = (
            stepped.alias("a")
            .join(stepped.alias("b"), F.col("a.label") == F.col("b.u"), "left")
            .select(
                F.col("a.u").alias("u"),
                F.coalesce(F.col("b.label"), F.col("a.label")).alias("label"),
                (
                    F.coalesce(F.col("b.label"), F.col("a.label"))
                    != F.col("a.__old")
                ).alias("__chg"),
            )
            .observe(obs, F.sum(F.col("__chg").cast("long")).alias("n"))
            .localCheckpoint(eager=True)  # flat lineage; reused below/next round
        )
        n_changed = int(obs.get["n"] or 0)  # None on an empty edge set
        labels = jumped
        rounds += 1
        if n_changed == 0:
            converged = True
            break
        # hash-to-min for the next round: adopt the min label among self
        # and neighbors
        neighbor_min = (
            sym.alias("e")
            .join(labels.alias("lb"), F.col("e.v") == F.col("lb.u"), "inner")
            .select(F.col("e.u").alias("n"), F.col("lb.label").alias("label"))
            .groupBy("n")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = (
            labels.alias("lb")
            .join(neighbor_min.alias("nm"), F.col("lb.u") == F.col("nm.n"), "left")
            .select(
                F.col("lb.u").alias("u"),
                F.least(
                    F.col("lb.label"), F.coalesce(F.col("nm.nbr_label"), F.col("lb.label"))
                ).alias("label"),
                F.col("lb.label").alias("__old"),
            )
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def pagerank_integer(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000,
    damping_pct: int = 85,
    broadcast_ranks: bool | None = None,
    broadcast_threshold_rows: int = 1_000_000,
) -> DataFrame:
    """Weighted PageRank on an exact integer grid (Brin & Page 1998),
    fixed-iteration form.

    ``edges``: (src, dst, w) with positive integer weights; ``nodes``:
    (node). Ranks live on a ``scale`` integer grid (init = scale per
    node); each iteration computes

        r'(v) = ((100 - d)*scale) div 100
              + (d * SUM over u->v of (r(u) * w) div W(u)) div 100

    with d = ``damping_pct`` and W(u) the total out-weight of u — every
    reduction is a BIGINT sum and every division an integer floor, so
    the trajectory is bit-reproducible in any engine (the oracle unrolls
    the same ``iters`` iterations as chained CTEs). Dangling nodes keep
    the teleport term only — the classic simplified treatment.

    Overflow envelope: r(u) <= n_nodes * scale after any iteration (the
    damped sum is mass-bounded), so the widest product r(u)*w needs
    n_nodes * scale * max_edge_weight < 2^63 — with the default 1e6
    grid, a 25-node graph tolerates per-edge weights to ~3.7e11.

    Scale shape: the rank table is one row per NODE; each iteration is
    an (edges JOIN ranks-on-src) shuffle-on-src + a dst-keyed sum — the
    standard distributed PageRank step (edges shuffle once per
    iteration; pre-partitioning edges and ranks on the same key makes
    the join co-located so only the rank table moves). Fixed ``iters``
    keeps the plan finite; power-iteration-to-convergence composes the
    same step with the connected_components loop discipline above
    (checkpoint every round).

    Broadcast guard (same contract as similarity._broadcast_queries_or_not):
    the rank table is one row per node, so the map-only broadcast join is
    right for small node sets (the 25-nation trade graph) but would OOM the
    driver on a billion-node graph if forced. An explicit
    ``broadcast_ranks`` wins; ``None`` probes the node count with a bounded
    ``limit(threshold+1).count()`` (LocalLimit — never scans the full
    table) and above ``broadcast_threshold_rows`` drops the hint, instead
    hash-co-partitioning the iteration-invariant edge table on ``src`` once
    so each iteration's join shuffles only the rank table.
    """
    out_w = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = edges.join(out_w, "src").select("src", "dst", "w", "ow")
    if broadcast_ranks is None:
        broadcast_ranks = (
            nodes.limit(broadcast_threshold_rows + 1).count() <= broadcast_threshold_rows
        )
    if not broadcast_ranks:
        # shuffle path: materialize + co-partition edges on the join key
        # ONCE (HashPartitioning(src) satisfies the join's required
        # distribution, so per-iteration shuffles move only the ranks);
        # the checkpoint also stops the out-weight agg re-running per round
        ew = ew.repartition("src").localCheckpoint(eager=True)
    teleport = (100 - damping_pct) * scale // 100
    ranks = nodes.select(F.col("node"), F.lit(scale).cast("long").alias("r"))
    for _ in range(iters):
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            ew.join(rank_side, ew["src"] == rank_side["node"])
            .select("dst", F.expr("(r * w) div ow").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(f"({damping_pct}L * coalesce(s, 0L)) div 100L")
                ).cast("long").alias("r"),
            )
        )
    return ranks
