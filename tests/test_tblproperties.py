"""Table properties (Delta's TBLPROPERTIES surface): log-recorded
key/value metadata with latest-wins folding, RESTORE/CLONE carry-over,
checkpoint survival, Delta export/import round-trip, and the two
behavioral properties — delta.enableDeletionVectors (routes SQL DML and
MERGE to merge-on-read) and delta.appendOnly (refuses row-modifying
commits at the protocol chokepoint, Delta's rule)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.functions.tx_sql import TxSqlSession
from airbnb_listings_data_pipelines_spark.operators.txlog import (
    TxLogTable,
    merge_into_txlog,
)


def _mk(spark, path, n=20):
    return TxLogTable.create(
        spark,
        str(path),
        spark.createDataFrame(
            [(k, f"v{k}", float(k)) for k in range(n)],
            "k int, v string, amt double",
        ).repartition(2),
    )


def test_properties_fold_set_unset_restore_clone(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    assert t.properties() == {}
    v1 = t.set_properties({"owner": "data-eng", "delta.appendOnly": "false"})
    t.set_properties({"owner": "ml-platform"})  # latest wins
    t.unset_properties(["delta.appendOnly", "never-existed"])  # IF EXISTS
    assert t.properties() == {"owner": "ml-platform"}
    assert t.properties(as_of=v1) == {
        "owner": "data-eng", "delta.appendOnly": "false"
    }
    # RESTORE reverts properties with the rest of the metadata
    t.restore(v1)
    assert t.properties() == {
        "owner": "data-eng", "delta.appendOnly": "false"
    }
    # CLONE carries the property state
    c = t.clone(str(tmp_path / "c"))
    assert c.properties() == t.properties()
    # refused: shadowing first-class payloads
    with pytest.raises(ValueError, match="first-class"):
        t.set_properties({"delta.constraints.x": "k > 0"})
    with pytest.raises(ValueError, match="first-class"):
        t.set_properties({"delta.columnMapping.mode": "name"})


def test_properties_survive_log_cleanup(spark, tmp_path, monkeypatch):
    import airbnb_listings_data_pipelines_spark.operators.txlog as txmod

    monkeypatch.setattr(txmod, "_CHECKPOINT_EVERY", 5)
    t = _mk(spark, tmp_path / "t", n=5)
    t.set_properties({"team": "core"})
    for i in range(7):  # push a checkpoint + truncate below it
        t.append(
            spark.createDataFrame(
                [(100 + i, "x", 0.0)], "k int, v string, amt double"
            )
        )
    t.cleanup_log(retain_versions=2)
    assert t.properties() == {"team": "core"}, (
        "properties_reset on the checkpoint must survive truncation"
    )


def test_append_only_refuses_row_modifying_commits(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.set_properties({"delta.appendOnly": "true"})
    with pytest.raises(ValueError, match="appendOnly"):
        t.delete_where("k = 1")
    with pytest.raises(ValueError, match="appendOnly"):
        t.delete_where("k = 1", mode="dv")
    with pytest.raises(ValueError, match="appendOnly"):
        t.update_where("k = 1", {"amt": F.lit(0.0)})
    with pytest.raises(ValueError, match="appendOnly"):
        merge_into_txlog(
            spark, t,
            spark.createDataFrame(
                [(1, "m", 9.9)], "k int, v string, amt double"
            ),
            ["k"],
        )
    # Delta's rule: appends, no-op DML and INSERT-ONLY merges stay legal
    t.append(
        spark.createDataFrame([(100, "a", 1.0)], "k int, v string, amt double")
    )
    t.delete_where("k = 99999")  # matches nothing: no remove, legal
    merge_into_txlog(
        spark, t,
        spark.createDataFrame(
            [(200, "i", 2.0)], "k int, v string, amt double"
        ),
        ["k"],
        clauses={"not_matched": [{"values": None}]},
    )
    ks = {r.k for r in t.read().collect()}
    assert 100 in ks and 200 in ks and len(ks) == 22
    # unset re-enables DML
    t.unset_properties(["delta.appendOnly"])
    t.delete_where("k = 1")
    assert 1 not in {r.k for r in t.read().collect()}


def test_sql_tblproperties_and_dv_routing(spark, tmp_path):
    """The SQL surface: SET TBLPROPERTIES enabling deletion vectors
    routes DELETE/UPDATE/MERGE to merge-on-read — commits grow vectors
    and remove nothing; UNSET routes back to copy-on-write."""
    t = _mk(spark, tmp_path / "t", n=30)
    sess = TxSqlSession(spark, {"t": t})
    sess.execute(
        "ALTER TABLE t SET TBLPROPERTIES "
        "('delta.enableDeletionVectors' = 'true', 'owner' = 'sql')"
    )
    assert t.properties()["delta.enableDeletionVectors"] == "true"
    sess.execute("DELETE FROM t WHERE k % 10 = 3")
    sess.execute("UPDATE t SET amt = amt + 100.0 WHERE k % 7 = 1")
    sess.execute(
        "MERGE INTO t USING (SELECT 2 AS k, 'M' AS v, 2.5 AS amt) s "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET amt = s.amt "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    # every DML commit vectored, none rewrote/removed a file
    for name in sorted(os.listdir(t.log_dir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(t.log_dir, name)) as fh:
            c = json.load(fh)
        if c.get("op") in ("delete", "update", "merge"):
            assert not c["removes"], f"{c['op']} rewrote under dv routing"
            assert c.get("dvs"), f"{c['op']} recorded no vector"
    got = {(r.k, r.amt) for r in t.read().collect()}
    assert (2, 2.5) in got and (1, 101.0) in got
    assert not any(k % 10 == 3 for k, _ in got)
    # UNSET: back to copy-on-write
    sess.execute("ALTER TABLE t UNSET TBLPROPERTIES ('delta.enableDeletionVectors')")
    v = sess.execute("DELETE FROM t WHERE k = 2")
    with open(os.path.join(t.log_dir, f"{v:012d}.json")) as fh:
        c = json.load(fh)
    assert c["removes"] and not c.get("dvs")


def test_properties_export_import_roundtrip(spark, tmp_path):
    """Export mirrors properties into metaData.configuration (the DV
    property also latches the table-features protocol, PROTOCOL.md);
    CONVERT FROM DELTA adopts them back — including the behavioral
    routing on the adopted table."""
    import shutil

    from airbnb_listings_data_pipelines_spark.operators.deltalog import (
        read_delta_snapshot,
    )

    t = _mk(spark, tmp_path / "t")
    t.set_properties(
        {"owner": "data-eng", "delta.enableDeletionVectors": "true"}
    )
    t.add_check("amt_ok", "amt >= 0")
    t.to_delta_log()
    dl = os.path.join(t.path, "_delta_log")
    cfgs, protos = [], []
    for f in sorted(os.listdir(dl)):
        if f.endswith(".json"):
            with open(os.path.join(dl, f)) as fh:
                for line in fh:
                    a = json.loads(line)
                    if "metaData" in a:
                        cfgs.append(a["metaData"]["configuration"])
                    if "protocol" in a:
                        protos.append(a["protocol"])
    assert cfgs[-1]["owner"] == "data-eng"
    assert cfgs[-1]["delta.enableDeletionVectors"] == "true"
    assert cfgs[-1]["delta.constraints.amt_ok"] == "amt >= 0"
    assert protos[-1]["minReaderVersion"] == 3, (
        "the DV property latches the table-features protocol"
    )
    assert "deletionVectors" in protos[-1]["readerFeatures"]
    # adopt back: properties carried (constraints stay first-class)
    foreign = str(tmp_path / "foreign")
    shutil.copytree(t.path, foreign)
    shutil.rmtree(os.path.join(foreign, "_txlog"))
    c = TxLogTable.convert_from_delta(spark, foreign)
    assert c.properties() == {
        "owner": "data-eng", "delta.enableDeletionVectors": "true"
    }
    assert c.checks() == {"amt_ok": "amt >= 0"}
    # behavioral routing live on the adopted table
    sess = TxSqlSession(spark, {"c": c})
    v = sess.execute("DELETE FROM c WHERE k = 3")
    with open(os.path.join(c.log_dir, f"{v:012d}.json")) as fh:
        cc = json.load(fh)
    assert not cc["removes"] and cc.get("dvs")
    # and the exported delta snapshot still replays (sanity)
    assert read_delta_snapshot(spark, t.path).count() == 20


def test_show_tblproperties_and_describe_detail(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=5)
    sess = TxSqlSession(spark, {"t": t})
    assert sess.execute("SHOW TBLPROPERTIES t").count() == 0
    sess.execute(
        "ALTER TABLE t SET TBLPROPERTIES ('owner' = 'eng', 'tier' = 'gold')"
    )
    rows = {
        (r.key, r.value)
        for r in sess.execute("SHOW TBLPROPERTIES t").collect()
    }
    assert rows == {("owner", "eng"), ("tier", "gold")}
    one = sess.execute("SHOW TBLPROPERTIES t ('owner')").collect()
    assert [(r.key, r.value) for r in one] == [("owner", "eng")]
    missing = sess.execute("SHOW TBLPROPERTIES t ('nope')").collect()
    assert [(r.key, r.value) for r in missing] == [("nope", None)]
    detail = sess.execute("DESCRIBE DETAIL t").collect()[0]
    assert detail.properties == {"owner": "eng", "tier": "gold"}
