"""Adversarial convergence probe for operators/graph.connected_components.

SCALING.md's x22 ratios are measured on near-dup clique graphs — diameter
2-3, which any label-propagation scheme handles in a couple of rounds. The
pointer-doubling claim (O(log diameter) rounds) only bites on HIGH-diameter
graphs, so this probe runs the worst case: a single path graph
0-1-2-...-(n-1), whose diameter is n-1. Plain hash-to-min would need ~n
rounds; hash-to-min + pointer jump must converge in ~log2(n).

Also runs a 10x-size path to show the ROUND COUNT grows logarithmically
(not linearly) with diameter — the property that makes the operator safe
at 100 TB, where a pathological near-dup chain (e.g. versioned documents
each similar to the next) is exactly this shape.

Usage: python tools/probe_cc_convergence.py [n]   (default n=10_000)
Prints one JSON line with rounds/correctness per size.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.graph import connected_components
from airbnb_listings_data_pipelines_spark.session import get_spark


def probe(spark, n: int) -> dict:
    # path graph: edges (i, i+1) for i in [0, n-1); diameter n-1
    edges = (
        spark.range(n - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .repartition(32)
    )
    stats: dict = {}
    t0 = time.perf_counter()
    out = connected_components(edges, stats=stats)
    # correctness: every node must land in component 0
    bad = out.filter(F.col("component") != 0).count()
    n_nodes = out.count()
    return {
        "n": n,
        "diameter": n - 1,
        "rounds": stats["rounds"],
        "converged": stats["converged"],
        "log2_diameter": round(math.log2(n - 1), 2),
        "wrong_labels": bad,
        "nodes": n_nodes,
        "sec": round(time.perf_counter() - t0, 2),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark("cc-probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    results = [probe(spark, n), probe(spark, n * 10)]
    print(json.dumps({"probe": "cc_path_graph", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
