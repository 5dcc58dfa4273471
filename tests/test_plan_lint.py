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
    """Sweeps every registry query. The ~40 lakehouse/streaming queries
    EXECUTE their DML chains when ``fn`` runs (the returned frame is the
    tail aggregate), so the sweep is wall-clock heavy; queries are
    independent (per-query scratch dirs), so run them OVERLAPPED from a
    small driver thread pool (guide §2.6) — each worker on its own
    ``spark.newSession()`` so temp-view names (TxSqlSession's table
    aliases, the q58/q60 view registrations) and session confs cannot
    collide across threads. One shared SparkContext, same plans."""
    from concurrent.futures import ThreadPoolExecutor

    reg = load_all()

    def lint(item):
        name, spec = item
        s = spark.newSession()
        plan = (
            spec.fn(s, SF_SMALL)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        return name, [b for b in BANNED if b in plan]

    # x96 monkeypatches TxLogTable.commit process-wide to stage its
    # write-serializable race — another thread's commit would trip the
    # injected hook and corrupt BOTH queries. It runs alone, outside
    # the pool; everything else is isolated by scratch dir + session.
    serial_only = {"x96_write_serializable_rebase"}
    assert serial_only <= set(reg), "serial-only list names a dead query"
    items = sorted(reg.items())
    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(
            pool.map(lint, [i for i in items if i[0] not in serial_only])
        )
    results += [lint(i) for i in items if i[0] in serial_only]
    violations = {name: hits for name, hits in results if hits}
    assert violations == {}
