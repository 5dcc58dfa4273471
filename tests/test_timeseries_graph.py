from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.graph import connected_components
from airbnb_listings_data_pipelines_spark.operators.timeseries import (
    as_of_join,
    range_join_binned,
)


def test_as_of_join_semantics(spark):
    # user 1: clicks at 10, 20 (two at 20: seq 5 and 6); purchases at 5, 20, 30
    clicks = spark.createDataFrame(
        [(1, 10, 3), (1, 20, 5), (1, 20, 6), (2, 100, 7)],
        ["user_id", "csec", "event_id"],
    ).select("*", F.col("event_id").alias("cid"), F.col("csec").alias("click_sec"))
    purch = spark.createDataFrame(
        [(1, 5, 100), (1, 20, 101), (1, 30, 102), (3, 50, 103)],
        ["user_id", "psec", "event_id"],
    ).select(F.col("event_id").alias("pid"), "user_id", "psec", "event_id")
    out = {
        r.pid: (r.asof_cid, r.asof_click_sec)
        for r in as_of_join(
            purch, clicks, "user_id", "psec", "csec", ["cid", "click_sec"], "event_id"
        ).collect()
    }
    assert out[100] == (None, None)        # no click at-or-before 5
    assert out[101] == (6, 20)             # same-second click visible, max seq wins
    assert out[102] == (6, 20)             # carried forward
    assert out[103] == (None, None)        # user with no clicks at all


def test_range_join_binned_equals_theta_join(spark):
    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(rng.randrange(5), rng.randrange(1000), i) for i in range(200)],
        ["k", "lts", "lid"],
    )
    right = spark.createDataFrame(
        [(rng.randrange(5), rng.randrange(1000), 1000 + i) for i in range(200)],
        ["k", "rts", "rid"],
    )
    binned = {
        (r.lid, r.rid)
        for r in range_join_binned(left, right, "k", "lts", "rts", -50, 25).collect()
    }
    theta = {
        (r.lid, r.rid)
        for r in left.join(
            right,
            (left.k == right.k) & (right.rts >= left.lts - 50) & (right.rts <= left.lts + 25),
        ).collect()
    }
    assert binned == theta and len(theta) > 0


def test_asof_and_range_join_plans_stay_shuffle_joins(spark):
    """The whole point of the two physical designs: neither plan may fall
    back to a nested-loop/cartesian join (what a naive inequality join
    compiles to)."""
    from airbnb_listings_data_pipelines_spark.queries.registry import load_all

    from .conftest import SF_SMALL

    reg = load_all()
    for name in ("q48_asof_join_last_click", "q49_range_join_click_counts"):
        plan = reg[name].fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4-5 (diameter 4), pair 10-11, triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain_converges(spark):
    # a 40-node path needs ~39 propagation rounds worst case for the naive
    # schedule; min-label propagation from the head needs eccentricity(min)
    n = 40
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], ["id_a", "id_b"])
    got = {r.node: r.component for r in connected_components(edges, max_iterations=n + 1).collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_connected_components_pointer_doubling_round_count(spark):
    """The O(log diameter) guarantee, asserted: a 512-node path (diameter
    511) must converge WELL under 511 rounds — pointer doubling lands
    around log2(511) ~ 9 — and under the default backstop of 50. Full-size
    numbers (10k -> 14 rounds, 100k -> 17) in SCALING.md /
    tools/probe_cc_convergence.py."""
    n = 512
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"])
    stats: dict = {}
    got = {r.node: r.component for r in connected_components(edges, stats=stats).collect()}
    assert set(got.values()) == {0} and len(got) == n
    assert stats["converged"]
    assert stats["rounds"] <= 14, stats  # log-ish, nowhere near diameter/round


def test_pagerank_mass_and_sink_behavior(spark):
    """Integer PageRank invariants on a hand-built graph: a sink node fed
    by everyone outranks the feeders; an isolated node keeps only the
    teleport mass; total mass stays bounded by n*scale."""
    from airbnb_listings_data_pipelines_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 0, 10), (2, 0, 10), (3, 0, 10)], ["src", "dst", "w"]
    )  # 1,2,3 all point at 0; node 4 isolated
    nodes = spark.createDataFrame([(i,) for i in range(5)], ["node"])
    r = {row.node: row.r for row in graph.pagerank_integer(edges, nodes, iters=3).collect()}
    assert r[0] > r[1] == r[2] == r[3]
    assert r[4] == 150000 + 0  # teleport only (isolated)
    assert sum(r.values()) <= 5 * 1_000_000


def test_pagerank_broadcast_guard_shuffle_fallback(spark):
    """Above the node-count threshold the per-iteration rank join must NOT
    carry the forced broadcast hint: with size-based auto-broadcast pinned
    off, the physical plan contains no BroadcastHashJoin and the ranks are
    bit-identical to the broadcast path (hint changes strategy, never
    values)."""
    from airbnb_listings_data_pipelines_spark.operators import graph

    edges = spark.createDataFrame(
        [(i, (i * 7 + 1) % 50, 1 + i % 3) for i in range(200)], ["src", "dst", "w"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(50)], ["node"])
    bcast = graph.pagerank_integer(edges, nodes, iters=2, broadcast_ranks=True)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # threshold 0 forces the auto-probe over the fallback path
        shuf = graph.pagerank_integer(
            edges, nodes, iters=2, broadcast_threshold_rows=0
        )
        plan = shuf._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        assert {(r.node, r.r) for r in shuf.collect()} == {
            (r.node, r.r) for r in bcast.collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
