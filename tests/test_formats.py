"""Source/sink format round-trips: the engine reads/writes parquet (native),
CSV (raw layer), JSON-lines, and ORC without semantic drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

from .conftest import SF_SMALL


def _canon(df):
    return sorted(map(tuple, df.select("doc_id", "lang", "n_chars").collect()))


def test_json_orc_csv_roundtrips(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    expected = _canon(docs)

    docs.write.mode("overwrite").json(str(tmp_path / "j"))
    got_json = spark.read.json(str(tmp_path / "j"))
    assert _canon(got_json) == expected

    docs.write.mode("overwrite").orc(str(tmp_path / "o"))
    assert _canon(spark.read.orc(str(tmp_path / "o"))) == expected

    # CSV needs quoting/escape for embedded separators; schema declared on read
    docs.write.mode("overwrite").options(header=True, quote='"', escape='"').csv(
        str(tmp_path / "c")
    )
    got_csv = spark.read.options(header=True, quote='"', escape='"').schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).csv(str(tmp_path / "c"))
    assert _canon(got_csv) == expected
    # text content itself survives CSV quoting
    a = {r.doc_id: r.text for r in docs.collect()}
    b = {r.doc_id: r.text for r in got_csv.collect()}
    assert a == b


def test_partitioned_write_prunes(spark, tmp_path):
    from airbnb_listings_data_pipelines_spark.sources.writers import write_partitioned

    docs = load_table(spark, SF_SMALL, "documents")
    write_partitioned(docs, str(tmp_path / "p"), ["lang"])
    back = spark.read.parquet(str(tmp_path / "p"))
    one = back.filter(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune directories at the scan, not post-filter
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert one.count() == docs.filter(F.col("lang") == "en").count()


def test_csv_corrupt_record_capture(spark, tmp_path):
    """PERMISSIVE mode captures malformed rows in a corrupt-record column
    instead of failing the load — raw-layer robustness for dirty dumps."""
    p = tmp_path / "dirty.csv"
    p.write_text('id,price\n1,10.5\n2,"unclosed\n3,30.0\n')
    df = (
        spark.read.options(header=True, mode="PERMISSIVE", columnNameOfCorruptRecord="_bad")
        .schema("id int, price double, _bad string")
        .csv(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r._bad is None]
    bad = [r for r in rows if r._bad is not None]
    assert {r.id for r in good} >= {1}
    assert len(bad) >= 1  # the unclosed-quote row is captured, not fatal
