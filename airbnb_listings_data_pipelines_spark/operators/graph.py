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
    # SimHash banding) would otherwise re-execute per iteration
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .localCheckpoint(eager=True)
    )
    nodes = sym.select("u").distinct()
    labels = nodes.select("u", F.col("u").alias("label"))
    rounds, converged = 0, False
    for _ in range(max_iterations):
        # (a) hash-to-min: adopt the min label among self and neighbors
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
            )
        )
        # (b) pointer jump: label <- label(label); the label is itself a
        # node id, so chains of stale labels collapse geometrically
        jumped = (
            stepped.alias("a")
            .join(stepped.alias("b"), F.col("a.label") == F.col("b.u"), "left")
            .select(
                F.col("a.u").alias("u"),
                F.coalesce(F.col("b.label"), F.col("a.label")).alias("label"),
            )
            .localCheckpoint(eager=True)  # flat lineage; reused 3x below/next round
        )
        changed = (
            jumped.alias("nl")
            .join(labels.alias("ol"), F.col("nl.u") == F.col("ol.u"))
            .filter(F.col("nl.label") != F.col("ol.label"))
        )
        # one tiny action per round: the convergence probe (standard
        # iterate-until-fixpoint orchestration, data never leaves executors)
        n_changed = changed.limit(1).count()
        labels = jumped
        rounds += 1
        if n_changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))
