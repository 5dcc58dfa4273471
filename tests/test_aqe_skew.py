"""AQE skew-join evidence: with a pathological hot key on the probe side,
adaptive execution must split the skewed partition at runtime (the plan's
sort-merge join reports ``skew=true``) — the join-side complement to the
salted-aggregation operators in operators/skew.py.

Thresholds are tuned down so the ~MB-scale local fixture trips the same
code path a multi-GB hot partition trips on a cluster; session.py enables
``spark.sql.adaptive.skewJoin.enabled`` by default, so production plans get
this behavior with no operator-level changes.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 95% of fact rows share one key; dim side is uniform
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 97).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(97).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        # a global (grouping-free) aggregate leaves the join output's
        # partitioning unconstrained, so AQE is free to split the skewed
        # partition; a groupBy on the join key would pin the distribution
        # and legitimately suppress the optimization
        # aggregate over the payload so column pruning can't drop it: the
        # hot shuffle partition must actually carry bytes (64-char hashes
        # don't run-length-compress away like 190k identical keys would)
        joined = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.length("payload")).alias("sp")
        )
        row = joined.collect()[0]
        # correctness first: every fact row matched exactly one dim row
        assert row.n == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
