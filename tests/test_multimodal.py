from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_listings_data_pipelines_spark.operators import multimodal
from airbnb_listings_data_pipelines_spark.sources.tpch import load_table

from .conftest import SF_SMALL


def test_bmp_roundtrip_no_spark():
    blob = multimodal.make_bmp(5, 3, lambda x, y: (x, y, x + y))
    meta = multimodal.decode_bmp(blob)
    assert meta == {"width": 5, "height": 3, "bpp": 24, "n_pixels": 15}
    # 5*3=15 bytes/row padded to 16; 54 header + 3*16
    assert len(blob) == 54 + 3 * 16
    with pytest.raises(ValueError):
        multimodal.decode_bmp(b"not a bitmap at all........................................")


def test_wav_roundtrip_no_spark():
    blob = multimodal.make_wav([0, 100, -100, 32767, -32768], sample_rate=16000)
    meta = multimodal.decode_wav(blob)
    assert meta["channels"] == 1
    assert meta["sample_rate"] == 16000
    assert meta["bits"] == 16
    assert meta["n_samples"] == 5
    assert meta["duration_ms"] == 5 * 1000 // 16000
    assert len(blob) == 44 + 10
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFFxxxxNOPE" + b"\x00" * 40)


def test_codec_media_decodes_end_to_end(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(30)
    media = multimodal.synthesize_codec_media(docs)
    meta = {r.media_id: r for r in multimodal.decode_media_metadata(media).collect()}
    assert len(meta) == 30
    for d, r in meta.items():
        if d % 2 == 0:
            w, h = 4 + d % 13, 3 + d % 7
            assert (r.modality, r.width, r.height) == ("image", w, h)
            assert r.n_bytes == 54 + h * ((w * 3 + 3) // 4 * 4)
            assert r.sample_rate is None
        else:
            n = 100 + d % 400
            assert (r.modality, r.sample_rate, r.n_samples) == ("audio", 8000, n)
            assert r.n_bytes == 44 + 2 * n
            assert r.duration_ms == n * 1000 // 8000
            assert r.width is None


def test_real_decoders_in_registry_extract_features(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(10)
    media = multimodal.synthesize_codec_media(docs)
    rows = multimodal.extract_features(media).collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r.features) == 8
        if r.modality == "image":  # real decoder leads with width/height/bpp
            assert r.features[2] == 24.0
        else:  # sample_rate/n_samples/bits
            assert r.features[0] == 8000.0 and r.features[2] == 16.0


def test_opaque_bytes_plumbing_end_to_end(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    media = multimodal.synthesize_media(docs, modality="bytes")
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    by_id = {r.media_id: r for r in rows}
    src = {r.doc_id: r.text for r in docs.collect()}
    for mid, r in by_id.items():
        assert r.n_bytes == len(src[mid].encode())
        assert r.modality == "bytes"
        assert len(r.features) == 8


def test_feature_extraction_deterministic(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(5)
    media = multimodal.synthesize_media(docs, modality="bytes")
    a = sorted((r.media_id, r.content_hash) for r in multimodal.extract_features(media).collect())
    b = sorted((r.media_id, r.content_hash) for r in multimodal.extract_features(media).collect())
    assert a == b


def test_unregistered_real_decoder_raises(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(1)
    media = multimodal.synthesize_media(docs, modality="video")
    old = multimodal.DECODERS["video"]
    multimodal.DECODERS["video"] = multimodal._unimplemented_decode
    try:
        with pytest.raises(Exception, match="NotImplementedError|decoding this format"):
            multimodal.extract_features(media).collect()
    finally:
        multimodal.DECODERS["video"] = old


def test_real_codec_rejects_garbage_bytes(spark):
    # text bytes labeled 'image' hit the REAL BMP parser and must error
    docs = load_table(spark, SF_SMALL, "documents").limit(1)
    media = multimodal.synthesize_media(docs, modality="image")
    with pytest.raises(Exception, match="ValueError|not a BMP"):
        multimodal.extract_features(media).collect()


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


def test_resize_bmp_bytes_no_spark():
    # 4x2 gradient: pixel = (x, y, x+y); downsize to 2x1 -> nearest picks (0,0) and (2,0)
    src = multimodal.make_bmp(4, 2, lambda x, y: (x, y, x + y))
    out = multimodal.resize_bmp_bytes(src, 2, 1)
    meta = multimodal.decode_bmp(out)
    assert (meta["width"], meta["height"]) == (2, 1)
    px = multimodal.bmp_pixels(out)
    assert px[0][0] == (0, 0, 0)
    assert px[0][1] == (2, 0, 2)


def test_resize_bmp_distributed_roundtrip(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    media = multimodal.synthesize_codec_media(docs).filter(F.col("modality") == "image")
    out = multimodal.resize_bmp(media, 6, 6).collect()
    assert len(out) > 0
    for r in out:
        assert (r.width, r.height) == (6, 6)
        meta = multimodal.decode_bmp(bytes(r.content))
        assert (meta["width"], meta["height"]) == (6, 6)


def test_resize_bmp_null_on_garbage(spark):
    bad = spark.createDataFrame([(1, bytearray(b"not a bmp"))], "media_id long, content binary")
    r = multimodal.resize_bmp(bad, 4, 4).collect()[0]
    assert r.content is None and r.n_bytes is None


# ---------------------------------------------------------------- PNG/JPEG


def _make_png(width: int, height: int, pixel_fn) -> bytes:
    """Hand-assemble a REAL RGB8 PNG with stdlib only (zlib + struct +
    binascii CRCs): IHDR + one IDAT of filter-0 scanlines + IEND."""
    import binascii
    import struct
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", binascii.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # RGB8
    raw = b""
    for y in range(height):
        raw += b"\x00"  # filter type 0
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            raw += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
    return (
        multimodal.PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_jpeg_header(width: int, height: int, channels: int = 3) -> bytes:
    """Minimal marker stream: SOI + APP0(JFIF) + SOF0 with the given frame
    dims (enough for any header parser; no entropy-coded data)."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof_comps = b"".join(bytes((i + 1, 0x11, 0)) for i in range(channels))
    sof = struct.pack(">BHHB", 8, height, width, channels) + sof_comps
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    )


def test_png_header_decode_no_spark():
    blob = _make_png(7, 4, lambda x, y: (x, y, x + y))
    meta = multimodal.decode_png(blob)
    assert meta["width"] == 7 and meta["height"] == 4
    assert meta["bit_depth"] == 8 and meta["channels"] == 3
    assert multimodal.decode_image(blob)["width"] == 7
    with pytest.raises(ValueError):
        multimodal.decode_png(b"\x89PNGbut-not-really" + b"\x00" * 40)


def test_jpeg_header_decode_no_spark():
    blob = _make_jpeg_header(31, 17)
    meta = multimodal.decode_jpeg(blob)
    assert meta == {"width": 31, "height": 17, "channels": 3}
    assert multimodal.decode_image(blob)["height"] == 17
    with pytest.raises(ValueError):
        multimodal.decode_jpeg(b"\xff\xd8\xff\xe0\x00\x02")  # no SOF


def test_image_features_dispatch_bmp_unchanged():
    blob = multimodal.make_bmp(5, 3, lambda x, y: (x, y, x + y))
    assert multimodal._decode_image_features(blob) == multimodal._decode_bmp_features(blob)


def test_png_features_without_pil_raise_honestly(monkeypatch):
    """No Pillow in this container: pixel features must raise the guard
    (header metadata still works), never fabricate features."""
    blob = _make_png(6, 6, lambda x, y: (x, y, 0))
    if multimodal._pil_image_module() is None:
        with pytest.raises(NotImplementedError, match="Pillow"):
            multimodal._decode_image_features(blob)
    else:  # container with Pillow: the real path runs instead
        feats = multimodal._decode_image_features(blob)
        assert feats[:3] == [6.0, 6.0, 3.0] and len(feats) == 8


def test_png_features_with_pil_installed_or_stub(monkeypatch):
    """Exercise the PIL dispatch path even without Pillow: inject a stub
    exposing the exact PIL surface used (open->convert->resize->tobytes).
    On a machine with real Pillow the test runs against it unmodified."""
    blob = _make_png(6, 5, lambda x, y: (x + y, x, y))
    if multimodal._pil_image_module() is None:
        class _StubImg:
            def convert(self, mode):
                assert mode == "RGB"
                return self

            def resize(self, wh):
                self._wh = wh
                return self

            def tobytes(self):
                w, h = self._wh
                return bytes(range(256)) * (w * h * 3 // 256 + 1)

        class _StubImage:
            @staticmethod
            def open(fh):
                assert fh.read(8) == multimodal.PNG_MAGIC
                return _StubImg()

        monkeypatch.setattr(multimodal, "_pil_image_module", lambda: _StubImage)
    feats = multimodal._decode_image_features(blob)
    assert len(feats) == 8
    assert feats[:3] == [6.0, 5.0, 3.0]  # header metadata is REAL either way
    assert all(isinstance(f, float) for f in feats)


def test_decode_media_metadata_handles_png_rows(spark):
    """The mapInPandas metadata path must decode PNG blobs' dimensions via
    the stdlib header parser (no PIL needed)."""
    import pandas as pd

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "modality": ["image", "image"],
                "content": [
                    _make_png(9, 2, lambda x, y: (x, y, 0)),
                    multimodal.make_bmp(4, 3, lambda x, y: (x, y, 0)),
                ],
                "mime_type": ["image/png", "image/bmp"],
                "width": pd.array([None, None], dtype="Int64"),
                "height": pd.array([None, None], dtype="Int64"),
                "duration_ms": pd.array([None, None], dtype="Int64"),
            }
        ),
        schema=multimodal.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in multimodal.decode_media_metadata(media).collect()}
    assert (out[1].width, out[1].height) == (9, 2)
    assert (out[2].width, out[2].height) == (4, 3)


def test_jpeg_header_decode_skips_fill_bytes():
    """ITU T.81 B.1.1.2 permits 0xFF fill bytes before a marker; several
    encoders emit them. The SOF walk must skip them, not desync."""
    import struct

    blob = _make_jpeg_header(31, 17)
    # inject two fill bytes before the SOF0 marker (after APP0)
    sof_at = blob.index(b"\xff\xc0")
    padded = blob[:sof_at] + b"\xff\xff" + blob[sof_at:]
    assert multimodal.decode_jpeg(padded) == {"width": 31, "height": 17, "channels": 3}


def test_decode_media_metadata_null_blob_yields_null_row(spark):
    """NULL content = absent media: a NULL metadata row, never a task
    crash (bytes(None) raised TypeError pre-fix); undecodable non-NULL
    bytes still error (real-codec contract)."""
    import pandas as pd

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "modality": ["image", "audio"],
                "content": [None, multimodal.make_wav([1, 2, 3])],
                "mime_type": [None, "audio/wav"],
                "width": pd.array([None, None], dtype="Int64"),
                "height": pd.array([None, None], dtype="Int64"),
                "duration_ms": pd.array([None, None], dtype="Int64"),
            }
        ),
        schema=multimodal.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in multimodal.decode_media_metadata(media).collect()}
    assert out[1].n_bytes is None and out[1].width is None
    assert out[2].n_samples == 3


def test_jpeg_truncated_sof_raises_valueerror():
    import pytest as _pytest

    blob = _make_jpeg_header(31, 17)
    sof_at = blob.index(b"\xff\xc0")
    truncated = blob[: sof_at + 5]  # cut mid-SOF
    with _pytest.raises(ValueError, match="truncated|missing SOF"):
        multimodal.decode_jpeg(truncated)


def test_codec_error_contract_fuzz():
    """Every stdlib decoder raises ValueError (the documented contract) on
    arbitrary garbage — never struct.error / IndexError / ZeroDivisionError
    that would bypass dirty-corpus callers catching (ValueError, TypeError).
    Fuzz: random bytes, plus every truncation of a VALID blob (the
    adversarial case: magic passes, structure cut mid-field)."""
    import random

    rng = random.Random(41)
    valid = {
        "bmp": multimodal.make_bmp(6, 4, lambda x, y: (x, y, 1)),
        "wav": multimodal.make_wav([3, -2, 7], sample_rate=8000),
        "png": _make_png(5, 4, lambda x, y: (x, y, 2)),
        "jpeg": _make_jpeg_header(19, 11),
    }
    decoders = {
        "bmp": multimodal.decode_bmp,
        "wav": multimodal.decode_wav,
        "png": multimodal.decode_png,
        "jpeg": multimodal.decode_jpeg,
    }
    for kind, dec in decoders.items():
        # random garbage (some prefixed with the right magic)
        for i in range(200):
            blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))
            if i % 3 == 0:
                blob = valid[kind][: rng.randrange(1, 12)] + blob
            try:
                dec(blob)
            except ValueError:
                pass  # the contract
            # any other exception type propagates and fails the test
        # every truncation of the valid blob either decodes (header was
        # complete) or raises ValueError
        for cut in range(len(valid[kind])):
            try:
                dec(valid[kind][:cut])
            except ValueError:
                pass
        # byte-flip mutations of the valid blob
        for _ in range(120):
            b = bytearray(valid[kind])
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            try:
                dec(bytes(b))
            except ValueError:
                pass
