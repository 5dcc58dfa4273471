"""Loaders for the driver's deterministic parquet testdata
(``/root/testdata/sf*/{region,nation,customer,supplier,part,orders,lineitem,
events,documents,embeddings}.parquet`` — see TESTDATA.md).

Scale notes: parquet scans here go through the vectorized reader with column
pruning + predicate pushdown; at 100 TB the same code reads a partitioned
table directory instead of one file — nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the package to Python workers once per SparkContext.

    mapInPandas/pandas_udf closures that reference package-module helpers
    (heavyhitters._mg_update, the multimodal codecs) are cloudpickled BY
    REFERENCE, so the executor-side Python must be able to import
    ``airbnb_listings_data_pipelines_spark``. When the driver process runs
    with cwd=/root/repo that works by accident (workers inherit the cwd);
    a driver started anywhere else fails with a worker-side
    ModuleNotFoundError — found by driving the contract from /tmp per the
    verify recipe. ``addPyFile`` of a package zip is the standard,
    cwd-independent fix (same mechanism spark-submit --py-files uses);
    one ~100 KB zip per context, guarded to run once.

    The temp zip is removed at interpreter exit (``addPyFile`` copies it
    into the SparkContext's own staging dir immediately, so the original
    is safe to delete, but not before this process ends — a second
    SparkContext in the same process would re-enter here anyway). If the
    package is not importable as a plain directory of .py files (zip/egg
    install), os.walk finds nothing — raise instead of shipping an empty
    archive that would silently reintroduce the worker-side
    ModuleNotFoundError.
    """
    sc = spark.sparkContext
    if getattr(sc, "_alp_pyfile_added", False):
        return
    import atexit
    import contextlib
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="alp_pkg_")
    os.close(fd)
    n_added = 0
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
                    n_added += 1
    if n_added == 0:
        with contextlib.suppress(OSError):
            os.remove(zpath)
        raise RuntimeError(
            f"cannot ship package to Python workers: no .py files under {pkg_dir!r} "
            "(zip/egg install?) — pass the package via spark-submit --py-files instead"
        )

    def _cleanup(path: str = zpath) -> None:
        with contextlib.suppress(OSError):
            os.remove(path)

    atexit.register(_cleanup)
    sc.addPyFile(zpath)
    sc._alp_pyfile_added = True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing quirks so downstream plans see
    clean types.

    - ``events.ts`` arrives in one of three physical forms depending on the
      driver's generator version, all normalized here to a session-tz
      (UTC) microsecond TIMESTAMP so every consumer — including
      ``unix_micros``, which rejects TIMESTAMP_NTZ — sees one type:
      TIMESTAMP(NANOS) surfaced as a long under
      ``spark.sql.legacy.parquet.nanosAsLong`` (rounds 1-2),
      TIMESTAMP(MICROS, NTZ) read natively (round 3+), or an already-LTZ
      timestamp. With the UTC session timezone the NTZ->LTZ cast is
      wall-clock-identical, and aggregations only ever bucket at >= second
      granularity, so nanosecond truncation is semantics-free.
    """
    if name == "events":
        # runtime-settable; required even when the caller's session builder
        # didn't set it (e.g. the driver's own SparkSession)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _ensure_workers_can_import(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division, not float: epoch-ns (~1.7e18) exceeds double's
            # 53-bit exact range, so `/1000` could be off by 1µs near boundaries
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TPCH_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
