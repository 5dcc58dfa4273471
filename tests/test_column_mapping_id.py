"""columnMapping mode=id (Delta PROTOCOL.md "Column Mapping"): data
columns resolve by PARQUET FIELD ID per file, not by name — the stored
column name may differ file to file (e.g. tables converted from Iceberg,
whose identity is the field id). The fixtures here make the two
resolutions DISAGREE: each logical column's physicalName annotation
matches one file's stored names while a second file stores the same ids
under different names, so a name-resolving reader would null-fill or
misread file two — only honest by-id resolution aligns both.

Covers both independent readers (operators/deltalog's Spark scan with
``spark.sql.parquet.fieldId.read.enabled``, and the txlog DataSource's
pyarrow ``_read_slice``), schema-evolution null-fill, and the adoption
refusal (txlog's name-keyed mapping cannot represent per-file id
resolution).
"""
from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.deltalog import (
    read_delta_snapshot,
)
from airbnb_listings_data_pipelines_spark.sources import txlog_source


@pytest.fixture()
def registered(spark):
    txlog_source.register(spark)


def _write_idmode_file(path, name, c1, c2, v1, v2, ids=(1, 2)):
    import pyarrow as pa
    import pyarrow.parquet as pq

    fields = [
        pa.field(
            c1, pa.int64(), metadata={b"PARQUET:field_id": str(ids[0]).encode()}
        ),
        pa.field(
            c2,
            pa.string(),
            metadata={b"PARQUET:field_id": str(ids[1]).encode()},
        ),
    ]
    tbl = pa.table(
        {c1: pa.array(v1, "int64"), c2: pa.array(v2, "string")}
    ).cast(pa.schema(fields))
    pq.write_table(tbl, os.path.join(path, name))


def _idmode_schema_string():
    """Logical (k long, s string); physicalName matches FILE A's stored
    names, so name-resolution reads file B wrong — ids are the truth."""
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "k",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col_a_1",
                    },
                },
                {
                    "name": "s",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col_a_2",
                    },
                },
            ],
        }
    )


def _write_log(path, files, schema_string):
    dl = os.path.join(path, "_delta_log")
    os.makedirs(dl, exist_ok=True)
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "idmode-test",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "id",
                    "delta.columnMapping.maxColumnId": "2",
                },
                "createdTime": int(time.time() * 1000),
            }
        },
    ]
    for f in files:
        actions.append(
            {
                "add": {
                    "path": f,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(path, f)),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        )
    with open(os.path.join(dl, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")


@pytest.fixture()
def idmode_table(tmp_path):
    """Two files, same field ids, DIFFERENT stored column names; the
    physicalName annotations match only file A."""
    path = str(tmp_path / "t")
    os.makedirs(path)
    _write_idmode_file(path, "a.parquet", "col_a_1", "col_a_2", [1, 2], ["x", "y"])
    _write_idmode_file(path, "b.parquet", "c1x", "c2x", [10, 20], ["p", "q"])
    _write_log(path, ["a.parquet", "b.parquet"], _idmode_schema_string())
    return path


EXPECT = [(1, "x"), (2, "y"), (10, "p"), (20, "q")]


def test_spark_reader_resolves_by_field_id(spark, idmode_table):
    snap = read_delta_snapshot(spark, idmode_table)
    assert snap.columns == ["k", "s"]
    assert sorted((r["k"], r["s"]) for r in snap.collect()) == EXPECT


def test_pyarrow_datasource_resolves_by_field_id(registered, spark, idmode_table):
    df = (
        spark.read.format("txlog")
        .option("path", idmode_table)
        .load()
        .select("k", "s")
    )
    assert sorted((r["k"], r["s"]) for r in df.collect()) == EXPECT


def test_missing_id_in_file_null_fills(registered, spark, tmp_path):
    """A file written BEFORE a column existed carries no field for its
    id — both readers must null-fill, never name-match something else."""
    path = str(tmp_path / "t")
    os.makedirs(path)
    _write_idmode_file(path, "a.parquet", "col_a_1", "col_a_2", [1], ["x"])
    # file b predates logical column s: only field id 1 present, and its
    # stored name ("col_a_2") COLLIDES with s's physicalName — a
    # name-resolving reader would surface longs under the string column
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = pa.field(
        "col_a_2", pa.int64(), metadata={b"PARQUET:field_id": b"1"}
    )
    pq.write_table(
        pa.table({"col_a_2": pa.array([99], "int64")}).cast(pa.schema([f])),
        os.path.join(path, "b.parquet"),
    )
    _write_log(path, ["a.parquet", "b.parquet"], _idmode_schema_string())
    want = [(1, "x"), (99, None)]
    snap = read_delta_snapshot(spark, path)
    assert sorted(
        (r["k"], r["s"]) for r in snap.collect()
    ) == want
    df = spark.read.format("txlog").option("path", path).load().select("k", "s")
    assert sorted((r["k"], r["s"]) for r in df.collect()) == want


def test_unannotated_id_mode_is_loud(spark, tmp_path):
    """mode=id without delta.columnMapping.id annotations is an invalid
    table — refuse, never guess by name."""
    path = str(tmp_path / "t")
    os.makedirs(path)
    _write_idmode_file(path, "a.parquet", "k", "s", [1], ["x"])
    bare = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "s", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    _write_log(path, ["a.parquet"], bare)
    with pytest.raises(ValueError, match="delta.columnMapping.id"):
        read_delta_snapshot(spark, path).collect()


def test_adoption_refuses_id_mode(spark, idmode_table):
    from airbnb_listings_data_pipelines_spark.operators.txlog import TxLogTable

    with pytest.raises(NotImplementedError, match="mode=id"):
        TxLogTable.convert_from_delta(spark, idmode_table)


def test_stream_tail_resolves_by_field_id(registered, spark, idmode_table, tmp_path):
    """The txlog DataSource streaming tail over the foreign id-mode log
    binds ids once at query start and resolves per file in tasks."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("txlog")
        .option("path", idmode_table)
        .load()
        .select("k", "s")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["k"], r["s"]) for r in spark.read.parquet(out).collect()
    )
    assert got == EXPECT
