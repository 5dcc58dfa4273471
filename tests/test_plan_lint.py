"""Plan lint: every registry query's PHYSICAL plan is swept for the two
antipatterns that silently destroy 100 TB scalability, so a regression in
any registry query (the lint sweeps load_all(), every registered one)
fails CI, not a code review:

- ``BatchEvalPython`` — a row-at-a-time (pickled) Python UDF in the plan.
  The engine's contract is JVM built-ins on hot paths and Arrow-vectorized
  pandas UDFs (``ArrowEvalPython`` / ``MapInPandas`` /
  ``FlatMapGroupsInPandas``) where Python is unavoidable; those stay legal.
- ``CartesianProduct`` — a non-broadcast physical cross join. The J9
  scalar-subquery idiom (1-row aggregate crossJoin) must plan as
  ``BroadcastNestedLoopJoin`` — if a code change drops the broadcast (e.g.
  the 1-row side stops being statistically tiny), the plan degrades to
  CartesianProduct and this test catches it.
"""

from __future__ import annotations

from airbnb_listings_data_pipelines_spark.queries.registry import load_all

from .conftest import SF_SMALL

BANNED = ("CartesianProduct", "BatchEvalPython")


def test_no_plan_antipatterns_across_registry(spark):
    reg = load_all()
    violations: dict[str, list[str]] = {}
    for name, spec in sorted(reg.items()):
        plan = spec.fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
        hits = [b for b in BANNED if b in plan]
        if hits:
            violations[name] = hits
    assert violations == {}
