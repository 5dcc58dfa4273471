"""Change-data sidecars (public design: Delta CDF's ``_change_data``
files): a COW DELETE/UPDATE with ``cdc=True`` records its EXACT
row-level changes in one ``_cdc/`` parquet, and every feed consumer —
batch ``read_changes`` and the streaming ``txlog`` DataSource CDF tail —
streams O(changed rows) for that commit instead of re-reading and
netting the touched files' delete+insert rewrite noise. Without cdc the
feeds fall back to the file-delta path unchanged, so the two forms must
be row-identical."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.txlog import (
    TxLogTable,
)


def _mk(spark, path, n=40, parts=4):
    return TxLogTable.create(
        spark,
        str(path),
        spark.createDataFrame(
            [(k, f"v{k}", float(k)) for k in range(n)],
            "k int, v string, amt double",
        ).repartition(parts),
    )


def _feed(t, lo, hi):
    return sorted(
        map(
            tuple,
            t.read_changes(lo, hi)
            .select("k", "v", "amt", "_change_type", "_commit_version")
            .collect(),
        )
    )


def test_cdc_feed_identical_to_netted_file_delta(spark, tmp_path):
    """The cdc sidecar must yield the SAME rows the netted file-delta
    path computes — same DML on a twin table without cdc, one compare."""
    a = _mk(spark, tmp_path / "a")
    b = _mk(spark, tmp_path / "b")
    for t, cdc in ((a, True), (b, False)):
        t.delete_where("k % 10 = 3", cdc=cdc)
        t.update_where("k % 7 = 0", {"amt": F.col("amt") + 100.0}, cdc=cdc)
    assert _feed(a, 1, 2) == _feed(b, 1, 2)
    # and the cdc table really recorded sidecars
    import json

    recs = []
    for f in sorted(os.listdir(a.log_dir)):
        if f.endswith(".json"):
            with open(os.path.join(a.log_dir, f)) as fh:
                recs.append(json.load(fh))
    assert [bool(r.get("cdc")) for r in recs] == [False, True, True]


def test_cdc_sidecar_is_o_changed_rows(spark, tmp_path):
    """The whole point: a 2-row update in a 40-row table writes a cdc
    sidecar with exactly 4 rows (2 pre + 2 post images), while the raw
    file feed would carry every rewritten row."""
    import pyarrow.parquet as pq

    t = _mk(spark, tmp_path / "t", n=40, parts=1)  # one file: max noise
    t.update_where("k IN (5, 9)", {"v": F.lit("UPD")}, cdc=True)
    import json

    with open(os.path.join(t.log_dir, f"{1:012d}.json")) as fh:
        rec = json.load(fh)
    assert rec["cdc"].startswith("_cdc/")
    n = pq.ParquetFile(os.path.join(t.path, rec["cdc"])).metadata.num_rows
    assert n == 4
    got = _feed(t, 1, 1)
    assert len(got) == 4
    assert {r[:3] for r in got if r[3] == "insert"} == {
        (5, "UPD", 5.0),
        (9, "UPD", 9.0),
    }


def test_cdc_with_schema_evolution_and_mapping(spark, tmp_path):
    """cdc sidecars write PHYSICAL column names on mapped tables and the
    feed reads every commit under to_version's schema: a rename after
    the cdc commit must not break the feed, and a column added later
    null-fills."""
    t = _mk(spark, tmp_path / "t")
    t.rename_column("v", "label")  # activates column mapping
    t.delete_where("k < 3", cdc=True)
    t.rename_column("label", "tag")  # rename AFTER the cdc commit
    t.add_column("extra", "int")
    # the feed reads every commit under TO_VERSION's schema — range up
    # to the latest so the cdc commit surfaces under the final names
    ch = t.read_changes(2, t.version())
    assert set(ch.columns) == {
        "k", "tag", "amt", "extra", "_change_type", "_commit_version"
    }
    rows = {(r.k, r.tag, r.extra) for r in ch.collect()}
    assert rows == {(0, "v0", None), (1, "v1", None), (2, "v2", None)}


def test_cdc_vacuum_and_retention(spark, tmp_path):
    """Referenced cdc sidecars survive vacuum; once cleanup_log truncates
    their commit below the horizon they become orphans and sweep."""
    t = _mk(spark, tmp_path / "t")
    t.delete_where("k = 1", cdc=True)
    import json

    with open(os.path.join(t.log_dir, f"{1:012d}.json")) as fh:
        cdc_rel = json.load(fh)["cdc"]
    assert os.path.exists(os.path.join(t.path, cdc_rel))
    t.vacuum(retain_versions=5)
    assert os.path.exists(os.path.join(t.path, cdc_rel)), "referenced: kept"
    # metadata-only fillers push a checkpoint past the cdc commit (the
    # suite-wide cheap-filler pattern — no Spark write job per version)
    while t.version() < 21:
        t.set_properties({"test.filler": str(t.version())})
    t.cleanup_log(retain_versions=2)
    t.vacuum(retain_versions=1)
    assert not os.path.exists(os.path.join(t.path, cdc_rel)), "truncated: swept"


def test_cdc_dv_mode_refused(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="redundant with mode='dv'"):
        t.delete_where("k = 1", mode="dv", cdc=True)
    with pytest.raises(ValueError, match="redundant with mode='dv'"):
        t.update_where("k = 1", {"amt": F.lit(0.0)}, mode="dv", cdc=True)


def test_cdc_streaming_feed_row_exact(spark, tmp_path):
    """The streaming CDF tail plans ONE O(changed rows) slice for a cdc
    commit — the feed carries the exact changes, no rewrite noise, and
    the medallion apply converges identically."""
    from airbnb_listings_data_pipelines_spark.sources import txlog_source
    from airbnb_listings_data_pipelines_spark.streaming.upsert import (
        cdf_apply_stream_txlog,
    )

    txlog_source.register(spark)
    a_path, b_path, ckpt = (
        str(tmp_path / "a"),
        str(tmp_path / "b"),
        str(tmp_path / "ck"),
    )
    a = TxLogTable.create(
        spark,
        a_path,
        spark.createDataFrame(
            [(k, float(k)) for k in range(20)], "k int, v double"
        ).coalesce(1),  # ONE file: the raw feed would carry max noise
    )
    a.delete_where("k % 5 = 1", cdc=True)
    a.update_where("k % 4 = 2", {"v": F.col("v") + 100.0}, cdc=True)
    q = cdf_apply_stream_txlog(
        spark.readStream.format("txlog")
        .option("readChangeFeed", "true")
        .load(a_path),
        b_path,
        ["k"],
        ckpt,
        app_id="cdc",
    )
    q.awaitTermination(180)
    b = TxLogTable(spark, b_path)
    assert sorted(map(tuple, b.read().collect())) == sorted(
        map(tuple, a.read().collect())
    )
    # the raw streamed feed for the cdc commits is row-exact: count the
    # change rows of commits 1-2 via the batch DataSource CDF
    cdf = (
        spark.read.format("txlog")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load(a_path)
    )
    n = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in cdf.groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # commit 1 deletes k%5=1 -> {1,6,11,16}; commit 2's k%4=2 matches
    # {2,10,14,18} (6 already gone): 4 pre-image deletes + 4 inserts
    assert n == {(1, "delete"): 4, (2, "delete"): 4, (2, "insert"): 4}


def test_cdc_losing_writer_cleans_sidecar(spark, tmp_path):
    """A cdc DML that loses its commit race removes the staged sidecar
    and retries — the final log references exactly ONE cdc file and no
    orphans remain beyond it."""
    import unittest.mock as mock

    t = _mk(spark, tmp_path / "t", n=20, parts=2)
    orig_commit = TxLogTable.commit
    raced = {"done": False}

    def racing_commit(self, *a, **kw):
        if not raced["done"] and kw.get("op") == "delete":
            raced["done"] = True
            t2 = TxLogTable(spark, self.path)
            t2.append(
                spark.createDataFrame(
                    [(500, "r", 0.0)], "k int, v string, amt double"
                )
            )
        return orig_commit(self, *a, **kw)

    with mock.patch.object(TxLogTable, "commit", racing_commit):
        t.delete_where("k < 5", cdc=True)
    assert sorted(r.k for r in t.read().collect()) == list(range(5, 20)) + [500]
    cdc_files = set(os.listdir(os.path.join(t.path, "_cdc")))
    import json

    referenced = set()
    for f in sorted(os.listdir(t.log_dir)):
        if f.endswith(".json"):
            with open(os.path.join(t.log_dir, f)) as fh:
                c = json.load(fh).get("cdc")
            if c:
                referenced.add(c.split("/", 1)[1])
    assert referenced and cdc_files == referenced
    dels = {r.k for r in t.read_changes(1, t.version())
            .filter("_change_type = 'delete'").collect()}
    assert dels == set(range(5))


def test_cdc_merge_matches_netted_twin(spark, tmp_path):
    """merge_into_txlog(cdc=True): the sidecar's change set must equal
    the netted file-delta feed of an identical merge without cdc —
    conditional update/delete clauses, a no-op update clause (SET
    amt = amt, omitted from the sidecar), inserts, and NOT MATCHED BY
    SOURCE all in one statement."""
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )

    clauses = {
        "matched": [
            {"cond": "s.bump < 0", "action": "delete"},
            {"cond": "s.bump > 50", "action": "update",
             "set": {"amt": "t.amt + s.bump"}},
            {"cond": None, "action": "update", "set": {"amt": "t.amt"}},
        ],
        "not_matched": [
            {"cond": None, "values": {"k": "s.k", "amt": "s.bump"}},
        ],
        "not_matched_by_source": [
            {"cond": "t.k >= 38", "action": "delete"},
        ],
    }
    src = spark.createDataFrame(
        [(1, 100.0), (2, 5.0), (3, -1.0), (99, 9.0)], "k int, bump double"
    )
    feeds = {}
    for name, cdc in (("a", True), ("b", False)):
        t = _mk(spark, tmp_path / name)
        merge_into_txlog(spark, t, src, ["k"], clauses=clauses, cdc=cdc)
        feeds[name] = _feed(t, 1, 1)
    assert feeds["a"] == feeds["b"]
    # the no-op clause (k=2: SET amt = t.amt) must appear in NEITHER
    ks = {r[0] for r in feeds["a"]}
    assert 2 not in ks
    assert {r[0] for r in feeds["a"] if r[3] == "insert"} >= {1, 99}
    assert {r[0] for r in feeds["a"] if r[3] == "delete"} >= {3, 38, 39}


def test_cdc_insert_only_merge_sidecar(spark, tmp_path):
    """Insert-only merge with cdc: the sidecar is exactly the inserted
    rows (matched keys contribute nothing)."""
    import json

    import pyarrow.parquet as pq

    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )

    t = _mk(spark, tmp_path / "t", n=10)
    src = spark.createDataFrame(
        [(3, "x", 0.0), (50, "new", 50.0), (51, "new", 51.0)],
        "k int, v string, amt double",
    )
    merge_into_txlog(
        spark, t, src, ["k"],
        clauses={"not_matched": [{"values": None}]},
        cdc=True,
    )
    with open(os.path.join(t.log_dir, f"{1:012d}.json")) as fh:
        rec = json.load(fh)
    n = pq.ParquetFile(os.path.join(t.path, rec["cdc"])).metadata.num_rows
    assert n == 2
    got = _feed(t, 1, 1)
    assert got == [
        (50, "new", 50.0, "insert", 1),
        (51, "new", 51.0, "insert", 1),
    ]


def test_cdc_delta_export_mirrors_change_data(spark, tmp_path):
    """Export composition (the DV-export lesson applied to cdc): a
    txlog table with change-data sidecars exports them as Delta
    AddCDCFile actions under _change_data/, flips
    delta.enableChangeDataFeed + the CDF writer requirement, snapshot
    replay ignores the cdc actions, and the mirrored parquets hold the
    exact change rows. Partitioned tables export WITHOUT cdc actions
    (Delta needs per-partition cdc files) — documented limitation."""
    import json

    import pyarrow.parquet as pq

    from airbnb_listings_data_pipelines_spark.operators.deltalog import (
        read_delta_snapshot,
    )
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )

    t = _mk(spark, tmp_path / "t", n=30)
    t.delete_where("k % 10 = 3", cdc=True)  # v1: 3 deletes
    t.update_where("k = 4", {"amt": F.lit(400.0)}, cdc=True)  # v2: 1 pair
    merge_into_txlog(
        spark,
        t,
        spark.createDataFrame(
            [(5, "M", 5.5), (77, "new", 77.0)], "k int, v string, amt double"
        ),
        ["k"],
        cdc=True,
    )  # v3: 1 update pair + 1 insert
    t.to_delta_log()

    got = read_delta_snapshot(spark, t.path)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, t.read().collect())
    )
    dl = os.path.join(t.path, "_delta_log")
    cdc_actions = {}
    protos, cfgs = [], []
    for f in sorted(os.listdir(dl)):
        if not f.endswith(".json"):
            continue
        v = int(f.split(".")[0])
        with open(os.path.join(dl, f)) as fh:
            for line in fh:
                a = json.loads(line)
                if "cdc" in a:
                    cdc_actions[v] = a["cdc"]
                if "protocol" in a:
                    protos.append(a["protocol"])
                if "metaData" in a:
                    cfgs.append(a["metaData"]["configuration"])
    assert set(cdc_actions) == {1, 2, 3}
    assert protos[-1]["minWriterVersion"] >= 4
    assert cfgs[-1].get("delta.enableChangeDataFeed") == "true"
    rows = {
        v: pq.ParquetFile(
            os.path.join(t.path, a["path"])
        ).metadata.num_rows
        for v, a in cdc_actions.items()
    }
    assert rows == {1: 3, 2: 2, 3: 3}
    for a in cdc_actions.values():
        assert a["path"].startswith("_change_data/")
        assert a["partitionValues"] == {} and a["dataChange"] is False
        assert a["size"] == os.path.getsize(os.path.join(t.path, a["path"]))
    # re-export is a no-op on immutable commits
    before = sorted(os.listdir(dl))
    t.to_delta_log()
    assert sorted(os.listdir(dl)) == before
    # the mirrored file survives txlog retention (hardlink)
    for i in range(25):
        t.append(
            spark.createDataFrame(
                [(2000 + i, "x", 0.0)], "k int, v string, amt double"
            )
        )
    t.cleanup_log(retain_versions=2)
    t.vacuum(retain_versions=1)
    p1 = os.path.join(t.path, cdc_actions[1]["path"])
    assert os.path.exists(p1), "exported _change_data survives vacuum"

    # partitioned (round-10: the former no-cdc-export limitation is
    # closed): the sidecar splits into PER-PARTITION _change_data files
    # with partitionValues in the actions, and the foreign CDF readers
    # reproduce the exact change set with typed partition columns
    from airbnb_listings_data_pipelines_spark.operators.deltalog import (
        read_delta_changes,
    )

    tp = TxLogTable.create(
        spark,
        str(tmp_path / "p"),
        spark.createDataFrame(
            [(k, k % 2, float(k)) for k in range(10)],
            "k int, g int, amt double",
        ),
        partition_by=["g"],
    )
    tp.delete_where("k IN (1, 2)", cdc=True)  # one delete per partition
    tp.to_delta_log()
    dlp = os.path.join(tp.path, "_delta_log")
    cdc_p = []
    for f in sorted(os.listdir(dlp)):
        if f.endswith(".json"):
            with open(os.path.join(dlp, f)) as fh:
                for line in fh:
                    a = json.loads(line)
                    if "cdc" in a:
                        cdc_p.append(a["cdc"])
    assert len(cdc_p) == 2, "one _change_data file per touched partition"
    assert {a["partitionValues"]["g"] for a in cdc_p} == {"0", "1"}
    for a in cdc_p:
        pf = pq.ParquetFile(os.path.join(tp.path, a["path"]))
        assert pf.metadata.num_rows == 1
        assert "g" not in pf.schema_arrow.names, (
            "partition column must NOT be in the cdc file"
        )
    ch = read_delta_changes(spark, tp.path, 1, 1)
    assert sorted((r.k, r.g, r._change_type) for r in ch.collect()) == [
        (1, 1, "delete"), (2, 0, "delete")
    ]
    got_p = read_delta_snapshot(spark, tp.path)
    assert got_p.count() == 8


def test_sidecar_raw_tags_are_delta_four_type(spark, tmp_path):
    """The sidecar PARQUET carries Delta CDF's native four change types
    (update_preimage/update_postimage for updates) so the verbatim
    _change_data export has native update semantics — while the INTERNAL
    feed (batch read_changes AND the streaming DataSource) maps them
    back to the delete/insert contract."""
    import json

    import pyarrow.parquet as pq

    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )
    from airbnb_listings_data_pipelines_spark.sources import txlog_source

    t = _mk(spark, tmp_path / "t", n=10, parts=1)
    t.update_where("k = 4", {"amt": F.lit(400.0)}, cdc=True)  # v1
    merge_into_txlog(
        spark,
        t,
        spark.createDataFrame(
            [(5, "M", 5.5), (77, "new", 77.0)], "k int, v string, amt double"
        ),
        ["k"],
        cdc=True,
    )  # v2: one update pair + one insert
    raw = {}
    for v in (1, 2):
        with open(os.path.join(t.log_dir, f"{v:012d}.json")) as fh:
            rel = json.load(fh)["cdc"]
        tb = pq.read_table(os.path.join(t.path, rel))
        raw[v] = sorted(
            zip(tb.column("k").to_pylist(), tb.column("_change_type").to_pylist())
        )
    assert raw[1] == [(4, "update_postimage"), (4, "update_preimage")]
    assert raw[2] == [
        (5, "update_postimage"),
        (5, "update_preimage"),
        (77, "insert"),
    ]
    # internal batch feed: mapped back to the delete/insert contract
    got = _feed(t, 1, 2)
    assert {r[3] for r in got} == {"insert", "delete"}
    assert (4, "v4", 4.0, "delete", 1) in got
    assert (4, "v4", 400.0, "insert", 1) in got
    # streaming/batch DataSource CDF: same mapping in the Arrow reader
    txlog_source.register(spark)
    cdf = (
        spark.read.format("txlog")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load(t.path)
    )
    assert {r._change_type for r in cdf.collect()} == {"insert", "delete"}


def test_merge_full_rewrite_with_insert_only_clauses(spark, tmp_path):
    """Regression (round-9 ADVICE): rewrite='full' + insert-only clauses
    crashed with UnboundLocalError because the insert-only source
    pruning never ran on the full-rewrite path."""
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )

    t = _mk(spark, tmp_path / "t", n=10)
    src = spark.createDataFrame(
        [(3, "dup", 0.0), (50, "new", 50.0)], "k int, v string, amt double"
    )
    out = merge_into_txlog(
        spark, t, src, ["k"],
        clauses={"not_matched": [{"values": None}]},
        rewrite="full",
    )
    rows = sorted((r.k, r.v) for r in out.collect())
    # matched key 3 keeps target values; only k=50 inserts
    assert (3, "v3") in rows and (50, "new") in rows and len(rows) == 11
    # cdc composes with it too
    t2 = _mk(spark, tmp_path / "t2", n=10)
    merge_into_txlog(
        spark, t2, src, ["k"],
        clauses={"not_matched": [{"values": None}]},
        rewrite="full", cdc=True,
    )
    assert _feed(t2, 1, 1) == [(50, "new", 50.0, "insert", 1)]


def test_feed_one_contract_across_dml_modes(spark, tmp_path):
    """Round-10 verdict item 5 (CDC-DV feed unification), pinned: the
    SAME logical DML sequence — DELETE, UPDATE, multi-clause MERGE —
    lands as (a) copy-on-write with cdc sidecars, (b) merge-on-read
    deletion vectors, (c) plain copy-on-write (netted file-delta), and
    read_changes emits the IDENTICAL row-level feed for all three: one
    contract, O(changed rows), regardless of the physical DML mode. Row
    counts are also checked against the exact predicate-derived change
    counts, so no mode can leak rewrite noise or drop a change."""
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )

    n = 60
    clauses = {
        "matched": [
            {"cond": "s.bump < 0", "action": "delete"},
            {"cond": None, "action": "update",
             "set": {"amt": "t.amt + s.bump"}},
        ],
        "not_matched": [{"cond": None, "values": None}],
    }

    def src(spark):
        return spark.createDataFrame(
            [(8, "m", -1.0), (16, "m", 50.0), (999, "new", 9.0)],
            "k int, v string, bump double",
        ).selectExpr("k", "v", "bump")

    feeds = {}
    for name in ("cow_cdc", "dv", "cow_plain"):
        t = _mk(spark, tmp_path / name, n=n, parts=3)
        if name == "dv":
            t.delete_where("k % 10 = 3", mode="dv")
            t.update_where(
                "k % 12 = 2", {"amt": F.col("amt") + 100.0}, mode="dv"
            )
            merge_into_txlog(
                spark, t,
                src(spark).withColumnRenamed("bump", "amt"),
                ["k"],
                clauses={
                    "matched": [
                        {"cond": "s.amt < 0", "action": "delete"},
                        {"cond": None, "action": "update",
                         "set": {"amt": "t.amt + s.amt"}},
                    ],
                    "not_matched": [{"cond": None, "values": None}],
                },
                mode="dv",
            )
        else:
            cdc = name == "cow_cdc"
            t.delete_where("k % 10 = 3", cdc=cdc)
            t.update_where(
                "k % 12 = 2", {"amt": F.col("amt") + 100.0}, cdc=cdc
            )
            merge_into_txlog(
                spark, t,
                src(spark).withColumnRenamed("bump", "amt"),
                ["k"],
                clauses={
                    "matched": [
                        {"cond": "s.amt < 0", "action": "delete"},
                        {"cond": None, "action": "update",
                         "set": {"amt": "t.amt + s.amt"}},
                    ],
                    "not_matched": [{"cond": None, "values": None}],
                },
                cdc=cdc,
            )
        feeds[name] = sorted(
            map(
                tuple,
                t.read_changes(1, 3)
                .select("k", "v", "amt", "_change_type", "_commit_version")
                .collect(),
            )
        )
    assert feeds["cow_cdc"] == feeds["dv"] == feeds["cow_plain"]
    # exact counts: v1 deletes k%10=3 (6 rows); v2 updates k%12=2 minus
    # already-deleted (k=2,14,26,38,50 -> 5 pairs); v3 merge: k=8 delete,
    # k=16 update pair, k=999 insert
    by_cv = {}
    for row in feeds["dv"]:
        by_cv.setdefault((row[4], row[3]), 0)
        by_cv[(row[4], row[3])] += 1
    assert by_cv == {
        (1, "delete"): 6,
        (2, "delete"): 5, (2, "insert"): 5,
        (3, "delete"): 2, (3, "insert"): 2,
    }


def test_cdc_single_pass_exact_under_rand_condition(spark, tmp_path):
    """Round-11 single-pass cdc (one persisted clause-plan evaluation
    feeds both the committed rows and the sidecar): a NONDETERMINISTIC
    matched condition (rand()) can no longer desynchronize the feed —
    applying the sidecar's deltas to the pre-state must reproduce the
    post-state EXACTLY. Pre-round-11 the change set came from a second
    pass that re-rolled the dice."""
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        merge_into_txlog,
    )

    t = _mk(spark, tmp_path, n=200, parts=4)
    pre = {tuple(r) for r in t.read().collect()}
    src = spark.createDataFrame(
        [(k, f"u{k}", float(k) + 1000.0) for k in range(200)],
        "k int, v string, amt double",
    )
    merge_into_txlog(
        spark,
        t,
        src,
        ["k"],
        clauses={
            "matched": [
                {"cond": "rand() < 0.5", "action": "update", "set": None}
            ]
        },
        cdc=True,
    )
    post = {tuple(r) for r in t.read().collect()}
    ver = t.version()
    ch = t.read_changes(ver, ver).select(
        "k", "v", "amt", "_change_type"
    ).collect()
    dels = {(r["k"], r["v"], r["amt"]) for r in ch if r["_change_type"] == "delete"}
    inss = {(r["k"], r["v"], r["amt"]) for r in ch if r["_change_type"] == "insert"}
    # the feed's deltas applied to pre-state reproduce post-state exactly
    assert (pre - dels) | inss == post
    assert dels <= pre and inss <= post
    # some rows updated, some kept (sanity of the rand split — 200 coin
    # flips landing all one way has p ~ 2^-199)
    assert 0 < len(dels) < 200


def test_cdc_generated_column_recompute_postimages(spark, tmp_path):
    """Round-11: generated-column recompute now composes with cdc=True
    (the recomputed post-images are materialized ONCE and land in the
    sidecar — pre-round-11 this combination was refused). x91-style
    exactness: sidecar rows == exact changed rows, recomputed values
    included."""
    from airbnb_listings_data_pipelines_spark.operators.txlog import (
        TxLogTable,
        merge_into_txlog,
    )

    t = TxLogTable.create(
        spark,
        str(tmp_path / "g"),
        spark.createDataFrame(
            [(k, float(k)) for k in range(40)], "k int, amt double"
        ).repartition(4),
        generated={"bucket": "CAST(amt / 10 AS INT)"},
    )
    merge_into_txlog(
        spark,
        t,
        spark.createDataFrame(
            [(3, 35.0), (7, 71.0), (100, 5.0)], "k int, amt double"
        ),
        ["k"],
        cdc=True,
    )
    ver = t.version()
    ch = t.read_changes(ver, ver).select(
        "k", "amt", "bucket", "_change_type"
    ).collect()
    inss = {
        (r["k"], r["amt"], r["bucket"])
        for r in ch
        if r["_change_type"] == "insert"
    }
    dels = {
        (r["k"], r["amt"], r["bucket"])
        for r in ch
        if r["_change_type"] == "delete"
    }
    # exact change set, recomputed buckets in the post-images
    assert inss == {(3, 35.0, 3), (7, 71.0, 7), (100, 5.0, 0)}
    assert dels == {(3, 3.0, 0), (7, 7.0, 0)}
    # and the sidecar rows agree with the committed table state
    got = {tuple(r) for r in t.read().filter("k in (3,7,100)").collect()}
    assert got == {(3, 35.0, 3), (7, 71.0, 7), (100, 5.0, 0)}


def test_cdc_update_delete_exact_under_rand(spark, tmp_path):
    """UPDATE and DELETE with nondeterministic conditions + cdc=True:
    the round-11 single-pass persist means the sidecar partitions the
    rows EXACTLY as the rewrite did — feed deltas applied to pre-state
    reproduce post-state."""
    t = _mk(spark, tmp_path, n=200, parts=4)
    pre = {tuple(r) for r in t.read().collect()}
    t.update_where("rand() < 0.5", {"amt": F.col("amt") + 1000.0}, cdc=True)
    mid = {tuple(r) for r in t.read().collect()}
    ch = t.read_changes(1, 1).select("k", "v", "amt", "_change_type").collect()
    dels = {(r["k"], r["v"], r["amt"]) for r in ch if r["_change_type"] == "delete"}
    inss = {(r["k"], r["v"], r["amt"]) for r in ch if r["_change_type"] == "insert"}
    assert (pre - dels) | inss == mid
    assert 0 < len(dels) < 200
    t.delete_where("rand() < 0.5", cdc=True)
    post = {tuple(r) for r in t.read().collect()}
    ch2 = t.read_changes(2, 2).select("k", "v", "amt", "_change_type").collect()
    dels2 = {(r["k"], r["v"], r["amt"]) for r in ch2 if r["_change_type"] == "delete"}
    assert all(r["_change_type"] == "delete" for r in ch2)
    assert mid - dels2 == post and dels2 <= mid
    assert 0 < len(dels2) < len(mid)
