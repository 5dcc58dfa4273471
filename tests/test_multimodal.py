from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators import multimodal
from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

from .conftest import SF_SMALL


def test_media_plumbing_end_to_end(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    media = multimodal.synthesize_media(docs, modality="image")
    assert media.schema == multimodal.MEDIA_SCHEMA or set(media.columns) == {
        f.name for f in multimodal.MEDIA_SCHEMA.fields
    }
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    by_id = {r.media_id: r for r in rows}
    src = {r.doc_id: r.text for r in docs.collect()}
    for mid, r in by_id.items():
        assert r.n_bytes == len(src[mid].encode())
        assert r.modality == "image"
        assert len(r.features) == 8


def test_feature_extraction_deterministic(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(5)
    media = multimodal.synthesize_media(docs)
    a = sorted((r.media_id, r.content_hash) for r in multimodal.extract_features(media).collect())
    b = sorted((r.media_id, r.content_hash) for r in multimodal.extract_features(media).collect())
    assert a == b


def test_unregistered_real_decoder_raises(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(1)
    media = multimodal.synthesize_media(docs)
    old = multimodal.DECODERS["image"]
    multimodal.DECODERS["image"] = multimodal._unimplemented_decode
    try:
        with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
            multimodal.extract_features(media).collect()
    finally:
        multimodal.DECODERS["image"] = old


def test_frame_sampling_one_to_many(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(10)
    media = multimodal.synthesize_media(docs, modality="video").withColumn(
        "duration_ms", (F.col("width") * 10).cast("long")
    )
    frames = multimodal.sample_frames(media, every_ms=500, max_frames=4)
    rows = frames.collect()
    assert len(rows) > 10  # 1 -> N explosion happened
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, fs in by_media.items():
        idxs = sorted(f.frame_idx for f in fs)
        assert idxs == list(range(len(fs)))          # dense frame indices
        assert all(f.frame_ts_ms == f.frame_idx * 500 for f in fs)
        assert all(f.frame_n_bytes == len(f.frame_bytes) for f in fs)
    # deterministic
    again = frames.collect()
    assert sorted((r.media_id, r.frame_idx, bytes(r.frame_bytes)) for r in again) == sorted(
        (r.media_id, r.frame_idx, bytes(r.frame_bytes)) for r in rows
    )
