"""Identity columns (Delta's ``GENERATED ALWAYS AS IDENTITY``, the
``delta.identity.{start,step,highWaterMark,allowExplicitInsert}`` field
metadata / writer v6): the engine assigns ``base + step * mid`` with
``mid = monotonically_increasing_id()`` — unique, beyond the high
watermark, step-multiples from start, GAPS ALLOWED (which makes
assignment embarrassingly parallel: no global row numbering). The
watermark advances from the new files' parquet FOOTER STATS (no data
scan) and rides the recorded schema like generation expressions do;
racing appends re-base: a loser whose watermark moved reassigns beyond
the winner's before committing.
"""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.txlog import TxLogTable


def _ids(t, col="row_id"):
    return sorted(r[col] for r in t.read().collect())


def _mk(spark, tmp_path, **kw):
    path = str(tmp_path / "t")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    return TxLogTable.create(
        spark, path, df.repartition(3), identity={"row_id": (1, 1)}, **kw
    )


def test_create_and_append_assign_unique_beyond_watermark(spark, tmp_path):
    t = _mk(spark, tmp_path)
    first = _ids(t)
    assert len(set(first)) == 10 and min(first) >= 1
    hw0 = t.identity_meta()["row_id"]["hw"]
    assert hw0 == max(first)
    t.append(spark.range(10, 15).select(F.col("id").alias("k")))
    second = _ids(t)
    assert len(set(second)) == 15  # no duplicates across commits
    assert min(set(second) - set(first)) > hw0  # all new ids beyond hw
    assert t.identity_meta()["row_id"]["hw"] == max(second)


def test_negative_step(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable.create(
        spark,
        path,
        spark.range(5).select(F.col("id").alias("k")).coalesce(1),
        identity={"neg": (0, -2)},
    )
    ids = sorted(r["neg"] for r in t.read().collect())
    assert all(v <= 0 and v % 2 == 0 for v in ids)
    hw = t.identity_meta()["neg"]["hw"]
    assert hw == min(ids)
    t.append(spark.range(5, 8).select(F.col("id").alias("k")))
    ids2 = sorted(r["neg"] for r in t.read().collect())
    assert len(set(ids2)) == 8
    assert min(set(ids2) - set(ids)) < hw or max(set(ids2) - set(ids)) < hw


def test_explicit_writes_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.append(
            spark.range(3).selectExpr("id AS k", "id AS row_id")
        )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.update_where("k = 1", {"row_id": F.lit(999)})
    with pytest.raises(ValueError, match="cannot be supplied at create"):
        TxLogTable.create(
            spark,
            str(tmp_path / "t2"),
            spark.range(3).selectExpr("id AS k", "id AS row_id"),
            identity={"row_id": (1, 1)},
        )
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )

    # MERGE is supported (round 11), but the GENERATED ALWAYS contract
    # still holds: no clause may assign an identity column and the
    # source may not carry one
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        merge_into_txlog(
            spark,
            t,
            spark.range(2).selectExpr("id AS k", "id AS row_id"),
            ["k"],
        )
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        merge_into_txlog(
            spark,
            t,
            spark.range(2).selectExpr("id AS k"),
            ["k"],
            clauses={
                "matched": [
                    {"action": "update", "set": {"row_id": F.lit(1)}}
                ]
            },
        )


def test_racing_appends_rebase_no_duplicates(spark, tmp_path):
    """A loser whose high watermark moved between assignment and commit
    must REASSIGN beyond the winner's — inject the race at the commit
    seam exactly like the isolation tests do."""
    import unittest.mock as mock

    t = _mk(spark, tmp_path)
    late = spark.range(100, 105).select(F.col("id").alias("k"))
    orig = TxLogTable.commit
    fired = {"done": False}

    def racing(self, *a, **kw):
        if not fired["done"] and kw.get("op") == "append":
            fired["done"] = True
            # the interleaving append lands first and advances the hw
            TxLogTable(spark, self.path).append(
                spark.range(200, 203).select(F.col("id").alias("k"))
            )
        return orig(self, *a, **kw)

    with mock.patch.object(TxLogTable, "commit", racing):
        t.append(late)
    ids = _ids(t)
    assert len(ids) == 10 + 3 + 5
    assert len(set(ids)) == len(ids), "duplicate identity values"
    assert t.identity_meta()["row_id"]["hw"] == max(ids)


def test_dml_keeps_values_and_watermark(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = {r["k"]: r["row_id"] for r in t.read().collect()}
    hw = t.identity_meta()["row_id"]["hw"]
    t.update_where("k = 3", {"k": F.lit(300)})
    t.delete_where("k = 5")
    after = {r["k"]: r["row_id"] for r in t.read().collect()}
    assert after[300] == before[3]  # identity sticks to the row
    assert t.identity_meta()["row_id"]["hw"] == hw


def test_export_carries_identity_metadata_writer_v6(spark, tmp_path):
    from airbnb_listings_data_pipelines_spark.operators.deltalog import (
        export_delta_log,
        read_delta_snapshot,
    )

    t = _mk(spark, tmp_path)
    export_delta_log(spark, t)
    dd = os.path.join(t.path, "_delta_log")
    actions = [
        json.loads(s)
        for s in open(os.path.join(dd, f"{0:020d}.json"))
        if s.strip()
    ]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minWriterVersion"] == 6
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    fld = next(
        f
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "row_id"
    )
    md = fld["metadata"]
    assert md["delta.identity.start"] == 1
    assert md["delta.identity.step"] == 1
    assert md["delta.identity.allowExplicitInsert"] is False
    assert "delta.identity.highWaterMark" in md
    snap = read_delta_snapshot(spark, t.path)
    ids = [r["row_id"] for r in snap.collect()]
    assert len(set(ids)) == len(ids) == 10


def test_sql_create_identity_and_insert(spark, tmp_path):
    """SQL surface: GENERATED ALWAYS AS IDENTITY (START WITH .. INCREMENT
    BY ..) in the column-definition CREATE; identity columns cannot be
    supplied, so INSERT uses a column list (full-arity INSERT is
    impossible by design — the engine owns the column)."""
    from airbnb_listings_data_pipelines_spark.functions.tx_sql import (
        TxSqlSession,
    )

    sess = TxSqlSession(spark, {"t": str(tmp_path / "t")})
    sess.execute(
        "CREATE TABLE t (k BIGINT, row_id BIGINT GENERATED ALWAYS AS "
        "IDENTITY (START WITH 100 INCREMENT BY 5), v DOUBLE)"
    )
    sess.execute(
        "INSERT INTO t (k, v) SELECT id, id * 1.0 FROM range(0, 7)"
    )
    rows = sess.execute("SELECT k, row_id FROM t").collect()
    ids = [r["row_id"] for r in rows]
    assert len(set(ids)) == 7
    assert all(i >= 100 and (i - 100) % 5 == 0 for i in ids)
    # the committed schema preserves the DECLARED column position (like
    # Delta): row_id sits between k and v, not appended at the end
    assert sess.execute("SELECT * FROM t").columns == ["k", "row_id", "v"]
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        sess.execute("INSERT INTO t (k, row_id, v) SELECT 1, 2, 3.0")
    with pytest.raises(ValueError, match="must be BIGINT"):
        sess.execute(
            "CREATE TABLE t (a INT GENERATED ALWAYS AS IDENTITY)"
        )


def test_incremental_export_reemits_metadata_on_hw_advance(spark, tmp_path):
    """Review finding (round 10): the export compared only (name, type)
    pairs, so an identity watermark advance never re-emitted metaData —
    an external writer honoring identityColumns would read a stale
    watermark and assign DUPLICATE ids. The refresh comparison now sees
    field metadata."""
    from airbnb_listings_data_pipelines_spark.operators.deltalog import (
        export_delta_log,
    )

    t = _mk(spark, tmp_path)
    export_delta_log(spark, t)
    dd = os.path.join(t.path, "_delta_log")

    def hw_at(v):
        for s in open(os.path.join(dd, f"{v:020d}.json")):
            a = json.loads(s)
            if "metaData" in a:
                fld = next(
                    f
                    for f in json.loads(a["metaData"]["schemaString"])["fields"]
                    if f["name"] == "row_id"
                )
                return fld["metadata"].get("delta.identity.highWaterMark")
        return None

    hw0 = hw_at(0)
    assert hw0 is not None
    t.append(spark.range(20, 30).select(F.col("id").alias("k")))
    export_delta_log(spark, t)  # incremental: must re-emit metaData
    hw1 = hw_at(1)
    assert hw1 is not None and hw1 > hw0
    assert hw1 == t.identity_meta()["row_id"]["hw"]
