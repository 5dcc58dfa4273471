"""Registration gate: no query enters the registry without executing.

The round-6 failure mode was a query (x70) committed in the end-of-round
snapshot without ever being run — it referenced columns absent from the
driver's testdata and its oracle was invalid SQL, which crashed the driver
bench and four guard tests. This gate makes that impossible: every registry
query that has NO driver correctness evidence yet (it was added after the
last CORRECTNESS_r*.json run) is executed end-to-end — Spark plan + DuckDB
oracle + exact canonical-value compare — at sf0.001 in the DEFAULT test run.
A new query that cannot run, or whose oracle cannot bind, fails the suite
before it can reach a commit.

The negative test proves the gate catches the round-6 defect class: a spec
shaped exactly like x70's original form (assigning a column the testdata
lacks, with an alias-shadowing oracle) demonstrably fails both halves.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from airbnb_listings_data_pipelines_spark.queries.registry import load_all

from .conftest import SF_SMALL
from .test_repo_consistency import _latest_green_rounds


def _never_driver_checked() -> list[str]:
    latest = _latest_green_rounds()
    if not latest:  # fresh clone without driver artifacts: nothing to gate
        return []
    return [q for q in load_all() if q not in latest]


def _gate_one(spark, duck, name, spec) -> list[str]:
    """Run one query through the full check_oracle compare at sf0.001.
    Returns a list of problems (empty = gate passed)."""
    import check_oracle

    problems = []
    try:
        sdf = spec.fn(spark, SF_SMALL).toPandas()
    except Exception as e:  # noqa: BLE001
        return [f"spark error: {e}"]
    if spec.oracle is None:
        # rows-only queries still must EXECUTE; that is the gate for them
        return problems
    try:
        odf = duck.sql(
            spec.oracle.replace("/root/testdata/sf0.01", SF_SMALL)
        ).df()
    except Exception as e:  # noqa: BLE001
        return [f"duckdb error: {e}"]
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(
            f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        )
    elif check_oracle.canon(sdf) != check_oracle.canon(odf):
        problems.append("canonical values differ")
    return problems


def test_new_queries_execute_and_match_oracle_before_commit(spark, duck):
    """Every registry query lacking driver evidence runs NOW, at sf0.001,
    against its oracle. Empty set = pass (all queries have evidence)."""
    reg = load_all()
    failures = {}
    for name in _never_driver_checked():
        problems = _gate_one(spark, duck, name, reg[name])
        if problems:
            failures[name] = problems
    assert not failures, (
        "queries registered without passing the sf0.001 gate "
        f"(run tools/check_oracle.py on them BEFORE committing): {failures}"
    )


def test_gate_catches_the_round6_defect_class(spark, duck):
    """A spec shaped like x70's original broken form — Spark side selects a
    column absent from the driver's orders table; oracle side an output
    alias shadows a nonexistent base column — must fail BOTH halves."""

    class BrokenSpec:
        oracle = """
        SELECT o_orderstatus,
               CASE WHEN o_orderstatus = 'P' THEN 7 ELSE o_shippriority END
                 AS o_shippriority
        FROM orders
        """

        @staticmethod
        def fn(spark, sf_dir):
            from airbnb_listings_data_pipelines_spark.queries.extensions import (
                load_table,
            )

            return load_table(spark, sf_dir, "orders").select(
                "o_orderstatus", "o_shippriority"
            )

    problems = _gate_one(spark, duck, "broken", BrokenSpec)
    assert problems and "spark error" in problems[0], problems
    # and the oracle alone is invalid too
    with pytest.raises(Exception, match="o_shippriority"):
        duck.sql(BrokenSpec.oracle).df()
