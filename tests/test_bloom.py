"""Bloom filter relation (operators/bloom.py): no-false-negative theorem,
merge = aggregate-combine equivalence, and fp-rate sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators import bloom


def test_no_false_negatives_and_fp_rate(spark):
    keys = spark.createDataFrame([(f"key-{i}",) for i in range(500)], ["key"])
    filt = bloom.bloom_build(keys, "key", m_bits=8192, k=3)
    # every inserted key must test positive
    inserted = bloom.bloom_probe(keys, filt, "key", ["key"], m_bits=8192, k=3)
    assert inserted.filter(F.col("maybe_present") == 0).count() == 0
    # fresh keys: fp rate near (1 - e^{-kn/m})^k ~ 2.2% here; allow 3x
    fresh = spark.createDataFrame([(f"other-{i}",) for i in range(1000)], ["key"])
    fp = bloom.bloom_probe(fresh, filt, "key", ["key"], m_bits=8192, k=3)
    n_fp = fp.filter(F.col("maybe_present") == 1).count()
    assert n_fp / 1000 < 0.07


def test_union_of_partial_filters_equals_one_shot(spark):
    """Mergeability: building per-half and OR-merging word rows must equal
    the single-pass build — the property that lets each ingest batch
    persist its own filter relation."""
    a = spark.createDataFrame([(f"k{i}",) for i in range(0, 250)], ["key"])
    b = spark.createDataFrame([(f"k{i}",) for i in range(250, 500)], ["key"])
    both = a.unionByName(b)
    one = bloom.bloom_build(both, "key")
    merged = (
        bloom.bloom_build(a, "key")
        .unionByName(bloom.bloom_build(b, "key"))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    assert one.exceptAll(merged).count() == 0
    assert merged.exceptAll(one).count() == 0
