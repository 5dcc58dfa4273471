"""Clustered tables (Delta's CLUSTER BY / liquid-clustering surface —
the ``clustering`` writer feature + the ``delta.clustering`` domain):
``cluster_by(cols)`` records the clustering columns in one metadata
commit; ``optimize()`` then Z-orders along them WITHOUT restating
(Delta's operational shape — this engine's physical realization is the
Morton-curve rewrite; Delta's incremental ZCube maintenance optimizes
WHEN to rewrite, not the layout contract). Recorded clustering survives
checkpoints/cleanup, reverts with RESTORE, and exports as the
``delta.clustering`` domainMetadata action under the clustering writer
feature."""
from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators.txlog import (
    TxLogTable,
    footer_stats_dict,
)


def _mk(spark, tmp_path, n=4000):
    return TxLogTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame(
            [(k, k * 7 % 100, float(k)) for k in range(n)],
            "a bigint, b bigint, amt double",
        ).repartition(8),
    )


def _envelope_width(t, col):
    _v, files, _d = t._replay_full()
    tot = 0
    for f in files:
        st = footer_stats_dict(os.path.join(t.path, f))
        tot += st["maxValues"][col] - st["minValues"][col]
    return tot, len(files)


def test_cluster_by_drives_optimize_and_skipping(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.cluster_by(["a", "b"])
    assert t.clustering_columns() == ["a", "b"]
    t.optimize(target_files=8)  # no zorder_by: clustering columns drive
    # file envelopes are tight on BOTH columns — a single-column sort
    # could only tighten one
    wa, n = _envelope_width(t, "a")
    wb, _ = _envelope_width(t, "b")
    assert wa < n * 4000 * 0.75, (wa, n)
    assert wb < n * 100 * 0.75, (wb, n)
    # and pruning actually skips files on the SECOND clustering column
    _v, files, _d = t._replay_full()
    hit = t._prune_files(files, "b", 10, 20)
    assert len(hit) < len(files)
    got = sorted(
        r["a"] for r in t.read_where("b", 10, 20).collect()
    )
    assert got == sorted(k for k in range(4000) if 10 <= k * 7 % 100 <= 20)


def test_refusals_uncluster_restore(spark, tmp_path):
    t = TxLogTable.create(
        spark,
        str(tmp_path / "p"),
        spark.createDataFrame([(1, 2, 3)], "a int, b int, c int"),
        partition_by=["c"],
    )
    with pytest.raises(ValueError, match="absent"):
        t.cluster_by(["zz"])
    with pytest.raises(ValueError, match="partition"):
        t.cluster_by(["c"])
    t.cluster_by(["a"])
    v_cl = t.version()
    t.cluster_by([])  # un-cluster
    assert t.clustering_columns() == []
    t.restore(v_cl)
    assert t.clustering_columns() == ["a"]


def test_checkpoint_cleanup_no_resurrection(spark, tmp_path):
    """An un-cluster commit truncated by cleanup_log must not let an
    older retained checkpoint's columns resurrect — metadata-complete
    checkpoints snapshot even the EMPTY list."""
    t = _mk(spark, tmp_path, n=10)
    t.cluster_by(["a"])
    for i in range(22):  # cross a checkpoint boundary while clustered
        t.append(
            spark.createDataFrame(
                [(1000 + i, 0, 0.0)], "a bigint, b bigint, amt double"
            )
        )
    t.cluster_by([])  # un-cluster
    for i in range(22):  # cross ANOTHER checkpoint boundary
        t.append(
            spark.createDataFrame(
                [(2000 + i, 0, 0.0)], "a bigint, b bigint, amt double"
            )
        )
    t.cleanup_log(retain_versions=2)
    assert t.clustering_columns() == []


def test_export_domain_and_protocol(spark, tmp_path):
    from airbnb_listings_data_pipelines_spark.operators.deltalog import (
        _replay_delta_log,
        export_delta_log,
        write_delta_checkpoint,
    )

    t = _mk(spark, tmp_path, n=100)
    t.cluster_by(["a", "b"])
    t.optimize(target_files=2)
    export_delta_log(spark, t)
    dd = os.path.join(t.path, "_delta_log")
    st = _replay_delta_log(spark, dd)
    assert json.loads(
        st.domains["delta.clustering"]["configuration"]
    )["clusteringColumns"] == [["a"], ["b"]]
    assert {"clustering", "domainMetadata"} <= set(
        st.protocol.get("writerFeatures") or []
    )
    assert st.protocol["minReaderVersion"] == 1  # writer-only features
    # the domain survives a parquet checkpoint + head cleanup
    import re

    v = write_delta_checkpoint(spark, t.path)
    for f in sorted(os.listdir(dd)):
        if re.fullmatch(r"\d{20}\.json", f) and int(f.split(".")[0]) < v:
            os.remove(os.path.join(dd, f))
    st2 = _replay_delta_log(spark, dd)
    assert "delta.clustering" in st2.domains


def test_sql_surface(spark, tmp_path):
    from airbnb_listings_data_pipelines_spark.functions.tx_sql import (
        TxSqlSession,
    )

    t = _mk(spark, tmp_path, n=10)
    sess = TxSqlSession(spark, {"t": t.path})
    sess.execute("ALTER TABLE t CLUSTER BY (a, b)")
    assert t.clustering_columns() == ["a", "b"]
    sess.execute("ALTER TABLE t CLUSTER BY NONE")
    assert t.clustering_columns() == []


def test_create_table_cluster_by_sql(spark, tmp_path):
    from airbnb_listings_data_pipelines_spark.functions.tx_sql import (
        TxSqlSession,
    )

    sess = TxSqlSession(spark, {"c": str(tmp_path / "c")})
    sess.execute(
        "CREATE TABLE c (a BIGINT, b BIGINT, amt DOUBLE) CLUSTER BY (a, b)"
    )
    t = sess.table("c")
    assert t.clustering_columns() == ["a", "b"]
    sess.execute("INSERT INTO c SELECT id, id * 7 % 100, id * 1.0 FROM range(0, 200)")
    sess.execute("OPTIMIZE c")  # clusters along (a, b) without restating
    assert sess.execute("SELECT COUNT(*) AS n FROM c").collect()[0]["n"] == 200
