"""In-commit timestamps (PROTOCOL.md "In-Commit Timestamps", writer
feature ``inCommitTimestamp``) plus the export's per-commit timestamp
fidelity: each exported Delta commit is stamped with ITS txlog commit's
time (not the export run's wall clock), and under
``delta.enableInCommitTimestamps`` the commitInfo carries a strictly
monotonic ``inCommitTimestamp`` that TIMESTAMP AS OF prefers over
anything the filesystem can disturb.
"""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.deltalog import (
    _version_at_timestamp,
    export_delta_log,
)
from airbnb_listings_data_pipelines_spark.operators.txlog import TxLogTable


def _mk(spark, tmp_path, ict=False, spaced=True):
    """Three commits whose txlog files get distinct, spaced mtimes."""
    path = str(tmp_path / "t")
    t = TxLogTable.create(
        spark, path, spark.range(5).select(F.col("id").alias("k")).coalesce(1)
    )
    if ict:
        t.set_properties({"delta.enableInCommitTimestamps": "true"})
    t.append(spark.range(5, 8).select(F.col("id").alias("k")))
    t.append(spark.range(8, 12).select(F.col("id").alias("k")))
    if spaced:
        base = 1_700_000_000  # fixed epoch: deterministic spacing
        for f in sorted(os.listdir(t.log_dir)):
            if f.endswith(".json"):
                v = int(f.split(".")[0])
                full = os.path.join(t.log_dir, f)
                os.utime(full, (base + 100 * v, base + 100 * v))
    export_delta_log(spark, t)
    return t, path, os.path.join(path, "_delta_log")


def _commit_infos(dd):
    out = {}
    for f in sorted(os.listdir(dd)):
        if not f.endswith(".json") or "." in f[:-5].replace("0", ""):
            pass
        import re

        if not re.fullmatch(r"\d{20}\.json", f):
            continue
        v = int(f.split(".")[0])
        for line in open(os.path.join(dd, f)):
            if '"commitInfo"' in line:
                out[v] = json.loads(line)["commitInfo"]
    return out


def test_export_stamps_per_commit_times(spark, tmp_path):
    _t, _path, dd = _mk(spark, tmp_path)
    infos = _commit_infos(dd)
    ts = [infos[v]["timestamp"] for v in sorted(infos)]
    # one export run, but each commit carries ITS txlog commit's time
    assert ts == sorted(ts) and len(set(ts)) == len(ts)
    assert ts[1] - ts[0] == 100_000  # the spaced mtimes, not wall clock
    # TIMESTAMP AS OF resolves between commits
    mid = ts[1] + 1
    assert _version_at_timestamp(dd, mid) == 1


def test_ict_commitinfo_and_protocol(spark, tmp_path):
    _t, _path, dd = _mk(spark, tmp_path, ict=True)
    infos = _commit_infos(dd)
    # versions 1.. carry strictly monotonic inCommitTimestamps (the
    # property landed at version 1)
    icts = [
        infos[v]["inCommitTimestamp"]
        for v in sorted(infos)
        if "inCommitTimestamp" in infos[v]
    ]
    assert icts and all(b > a for a, b in zip(icts, icts[1:]))
    assert "inCommitTimestamp" not in infos[0]  # pre-enablement
    actions = [
        json.loads(s) for s in open(os.path.join(dd, f"{1:020d}.json"))
    ]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]
    # writer-only feature: no readerFeatures list, classic readers read
    assert "readerFeatures" not in proto and proto["minReaderVersion"] == 1
    meta = next(
        a["metaData"]
        for a in reversed(actions)
        if "metaData" in a
    )
    cfg = meta["configuration"]
    assert cfg["delta.inCommitTimestampEnablementVersion"] == "1"
    assert "delta.inCommitTimestampEnablementTimestamp" in cfg


def test_ict_commitinfo_is_first_action(spark, tmp_path):
    """PROTOCOL.md: when inCommitTimestamp is enabled the commitInfo
    action MUST be the first action of the commit file — delta-spark
    reads only the first action to resolve the ICT, so an appended
    commitInfo would make external readers fall back to file mtimes."""
    import re

    _t, _path, dd = _mk(spark, tmp_path, ict=True)
    checked = 0
    for f in sorted(os.listdir(dd)):
        if not re.fullmatch(r"\d{20}\.json", f):
            continue
        v = int(f.split(".")[0])
        first = json.loads(open(os.path.join(dd, f)).readline())
        if v >= 1:  # ICT enabled from version 1 onward
            assert list(first) == ["commitInfo"], (v, list(first))
            assert "inCommitTimestamp" in first["commitInfo"]
            checked += 1
    assert checked >= 2


def test_ict_beats_disturbed_file_times(spark, tmp_path):
    """Rewrite commitInfo.timestamp to garbage AND scramble file mtimes:
    resolution still follows the in-commit timestamps."""
    _t, _path, dd = _mk(spark, tmp_path, ict=True)
    infos = _commit_infos(dd)
    icts = {
        v: i["inCommitTimestamp"]
        for v, i in infos.items()
        if "inCommitTimestamp" in i
    }
    import re

    for f in os.listdir(dd):
        if not re.fullmatch(r"\d{20}\.json", f):
            continue
        full = os.path.join(dd, f)
        lines = open(full).read().splitlines()
        out = []
        for s in lines:
            if '"commitInfo"' in s:
                a = json.loads(s)
                if "inCommitTimestamp" in a["commitInfo"]:
                    a["commitInfo"]["timestamp"] = 1  # garbage
                s = json.dumps(a)
            out.append(s)
        with open(full, "w") as fh:
            fh.write("\n".join(out) + "\n")
        os.utime(full, (2, 2))  # scrambled mtimes too
    v1, v2 = sorted(icts)[-2:]
    assert _version_at_timestamp(dd, icts[v2] - 1) == v1


def test_ict_incremental_export_seeds_chain(spark, tmp_path):
    t, path, dd = _mk(spark, tmp_path, ict=True)
    last = max(_commit_infos(dd))
    prev_ict = _commit_infos(dd)[last]["inCommitTimestamp"]
    t.append(spark.range(12, 14).select(F.col("id").alias("k")))
    # make the new txlog commit's mtime OLDER than the chain: the
    # monotonic clamp must still move forward
    newest = sorted(
        f for f in os.listdir(t.log_dir) if f.endswith(".json")
    )[-1]
    os.utime(os.path.join(t.log_dir, newest), (1, 1))
    export_delta_log(spark, t)
    infos = _commit_infos(dd)
    assert infos[last + 1]["inCommitTimestamp"] == prev_ict + 1


def test_ict_composes_with_dv_feature(spark, tmp_path):
    path = str(tmp_path / "t")
    t = TxLogTable.create(
        spark, path, spark.range(20).select(F.col("id").alias("k")).coalesce(1)
    )
    t.set_properties({"delta.enableInCommitTimestamps": "true"})
    t.delete_where("k % 5 = 0", mode="dv")
    export_delta_log(spark, t)
    dd = os.path.join(path, "_delta_log")
    actions = [
        json.loads(s) for s in open(os.path.join(dd, f"{2:020d}.json"))
    ]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    assert {"inCommitTimestamp", "deletionVectors"} <= set(
        proto["writerFeatures"]
    )
