"""WriteSerializable retry-rebase (delta.isolationLevel — the Delta
paper's §3.3 logical conflict check): a DML/MERGE loser whose
interleaved commits are ALL blind appends re-commits its already-written
result at the new head without recomputation. The observable semantic:
a concurrently-appended row matching the DML predicate SURVIVES under
WriteSerializable (the append orders after the DML) and DIES under the
default Serializable (the loser recomputes against the fresh snapshot).
Delta defaults to WriteSerializable; this engine keeps Serializable and
makes the relaxation an explicit TBLPROPERTIES opt-in."""

from __future__ import annotations

import json
import os
import unittest.mock as mock

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.txlog import (
    TxLogTable,
    merge_into_txlog,
)


def _mk(spark, path, iso=None, n=20):
    t = TxLogTable.create(
        spark,
        str(path),
        spark.createDataFrame(
            [(k, f"v{k}", float(k)) for k in range(n)],
            "k int, v string, amt double",
        ).repartition(2),
    )
    if iso:
        t.set_properties({"delta.isolationLevel": iso})
    return t


def _race_append_once(spark, rows_schema, rows, on_op):
    """A commit() wrapper that injects ONE concurrent append right
    before the first commit of the given op lands."""
    orig = TxLogTable.commit
    fired = {"done": False}

    def racing(self, *a, **kw):
        if not fired["done"] and kw.get("op") == on_op:
            fired["done"] = True
            TxLogTable(spark, self.path).append(
                spark.createDataFrame(rows, rows_schema)
            )
        return orig(self, *a, **kw)

    return mock.patch.object(TxLogTable, "commit", racing)


@pytest.mark.parametrize("mode", ["cow", "dv"])
def test_append_race_semantics_by_isolation_level(spark, tmp_path, mode):
    """The defining observable, both DML modes: an appended row MATCHING
    the delete predicate survives under WriteSerializable (rebase — the
    DML never saw it) and dies under Serializable (recompute)."""
    for iso, survives in (("WriteSerializable", True), (None, False)):
        t = _mk(spark, tmp_path / f"{mode}-{iso}", iso=iso)
        with _race_append_once(
            spark,
            "k int, v string, amt double",
            [(500, "late", 1.0)],
            on_op="delete",
        ):
            t.delete_where("k >= 10", mode=mode, max_retries=5)
        ks = sorted(r.k for r in t.read().collect())
        if survives:
            assert ks == list(range(10)) + [500], (
                "WriteSerializable: the blind append orders AFTER the "
                "delete — no recompute"
            )
        else:
            assert ks == list(range(10)), (
                "Serializable default: the loser recomputes and the "
                "appended row matches the predicate"
            )
        # either way the log is consistent: delete landed after append
        ops = [h["op"] for h in t.history()]
        assert ops[-2:] == ["append", "delete"]


def test_rebase_skips_recompute_and_reuses_files(spark, tmp_path):
    """Physical proof of no-recompute: under WriteSerializable the
    loser's ALREADY-WRITTEN files commit verbatim (no second
    _write_data), while Serializable rewrites."""
    calls = {"n": 0}
    orig_write = TxLogTable._write_data

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig_write(self, *a, **kw)

    t = _mk(spark, tmp_path / "t", iso="WriteSerializable")
    with mock.patch.object(TxLogTable, "_write_data", counting):
        with _race_append_once(
            spark,
            "k int, v string, amt double",
            [(600, "x", 0.0)],
            on_op="update",
        ):
            calls["n"] = 0
            t.update_where("k < 5", {"amt": F.col("amt") + 1.0})
    # one rewrite for the update itself + one for the injected append —
    # NO third write from a recompute
    assert calls["n"] == 2, f"recompute happened: {calls['n']} writes"


def test_interleaved_dml_still_recomputes(spark, tmp_path):
    """WriteSerializable only commutes with blind appends: a racing DML
    commit forces the full recompute path (correct final state, no
    lost update)."""
    t = _mk(spark, tmp_path / "t", iso="WriteSerializable")
    orig = TxLogTable.commit
    fired = {"done": False}

    def racing(self, *a, **kw):
        if not fired["done"] and kw.get("op") == "update":
            fired["done"] = True
            TxLogTable(spark, self.path).delete_where("k % 2 = 1")
        return orig(self, *a, **kw)

    with mock.patch.object(TxLogTable, "commit", racing):
        t.update_where("k % 2 = 0", {"amt": F.lit(0.0)}, max_retries=5)
    got = {(r.k, r.amt) for r in t.read().collect()}
    assert got == {(k, 0.0) for k in range(0, 20, 2)}, (
        "recompute path: delete applied first, update exact on survivors"
    )


def test_merge_rebase_and_txn_exclusion(spark, tmp_path):
    """A dv-mode MERGE rebases over a blind append; the SAME merge with
    a txn marker refuses rebase (idempotency must re-check) and
    recomputes — both end states correct."""
    src_schema = "k int, v string, amt double"
    for txn, appended_survives in ((None, True), (("app", 1), True)):
        t = _mk(spark, tmp_path / f"m{txn is None}", iso="WriteSerializable")
        with _race_append_once(
            spark, src_schema, [(700, "late", 7.0)], on_op="merge"
        ):
            merge_into_txlog(
                spark, t,
                spark.createDataFrame([(1, "M", 1.5)], src_schema),
                ["k"], mode="dv", txn=txn, max_retries=5,
            )
        got = {(r.k, r.v) for r in t.read().collect()}
        assert (1, "M") in got and (700, "late") in got
        # the merge landed exactly once either way
        assert [h["op"] for h in t.history()].count("merge") == 1


def test_rebase_sql_property_surface(spark, tmp_path):
    """The knob is a plain TBLPROPERTIES key — settable through SQL."""
    from airbnb_listings_data_pipelines_spark.functions.tx_sql import (
        TxSqlSession,
    )

    t = _mk(spark, tmp_path / "t")
    sess = TxSqlSession(spark, {"t": t})
    sess.execute(
        "ALTER TABLE t SET TBLPROPERTIES "
        "('delta.isolationLevel' = 'WriteSerializable')"
    )
    with _race_append_once(
        spark,
        "k int, v string, amt double",
        [(800, "late", 8.0)],
        on_op="delete",
    ):
        sess.execute("DELETE FROM t WHERE k >= 0")
    assert [r.k for r in t.read().collect()] == [800]


def test_optimize_rebases_over_appends_any_isolation(spark, tmp_path):
    """OPTIMIZE is row-preserving, so its append-rebase needs NO
    isolation opt-in (Delta's rule: compaction conflicts only on
    overlapping file removal) — a busy ingest stream no longer forces
    the whole rewrite to rerun."""
    t = _mk(spark, tmp_path / "t")  # default Serializable
    with _race_append_once(
        spark,
        "k int, v string, amt double",
        [(900, "late", 9.0)],
        on_op="optimize",
    ):
        t.optimize(target_files=1)  # would raise CommitConflict pre-rebase
    ks = sorted(r.k for r in t.read().collect())
    assert ks == list(range(20)) + [900]
    ops = [h["op"] for h in t.history()]
    assert ops[-2:] == ["append", "optimize"]
    # compacted files + the appended file
    assert len(t.files()) == 2
