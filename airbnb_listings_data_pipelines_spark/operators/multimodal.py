"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct. The Spark
side — schema, partition-preserving mapInPandas, Arrow batch shape, output
contracts — is real and tested. Decoding has two tiers:

- REAL stdlib codecs for BMP images and PCM WAV audio (``decode_bmp`` /
  ``decode_wav``: binary header parsing with ``struct``, no PIL/ffmpeg
  needed) — exercised end-to-end by the x11 registry query, whose blobs
  are genuine BMP/WAV files synthesized deterministically from doc_id
  (``synthesize_codec_media``) so a SQL oracle can predict the decoded
  metadata.
- A ``DECODERS`` registry for formats whose libraries are absent in this
  container (JPEG/MP3/video): deterministic fake for tests, clearly-marked
  NotImplementedError guard otherwise. Swap in PIL/torchaudio/ffmpeg
  without touching any Spark plumbing.

Scale notes: mapInPandas streams Arrow batches, so executor memory holds one
batch of blobs, not a partition of decoded frames. Partition by content hash
ahead of the decode stage to even out skew from variable blob sizes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_hash", LongType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def _fake_decode(content: bytes | None, n_features: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: fixed-length features from
    byte statistics. Replace via DECODERS['image'] = real_fn."""
    if not content:
        return [0.0] * n_features
    out = []
    for i in range(n_features):
        chunk = content[i::n_features]
        out.append(float(sum(chunk) % 997) if chunk else 0.0)
    return out


def _unimplemented_decode(content: bytes | None, n_features: int = 8) -> list[float]:
    raise NotImplementedError(
        "decoding this format requires PIL/torchaudio/ffmpeg, not present in "
        "this container — register a decoder in multimodal.DECODERS"
    )


# image/audio are REAL codecs (stdlib BMP/WAV parsers defined below, plus
# stdlib PNG/JPEG header parsers and an OPTIONAL PIL pixel path — see
# _decode_image_features); video has no stdlib codec, so it keeps the
# deterministic byte-stats stand-in; 'bytes' is the explicit opaque-blob
# modality.
DECODERS: dict[str, Callable[[bytes | None], list[float]]] = {}


def _register_default_decoders() -> None:
    DECODERS.update(
        {
            "image": _decode_image_features,
            "audio": _decode_wav_features,
            "video": _fake_decode,
            "bytes": _fake_decode,
        }
    )


# ---------------------------------------------------------------------------
# Real stdlib codecs: BMP (24-bit, BITMAPINFOHEADER) and WAV (PCM16 mono).
# Plain bytes->dict functions so they unit-test without Spark; the Spark
# path wraps them in mapInPandas below.
# ---------------------------------------------------------------------------


def make_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Minimal valid 24-bit bottom-up BMP. ``pixel_fn(x, y) -> (b, g, r)``."""
    import struct

    stride = (width * 3 + 3) // 4 * 4
    size = 54 + stride * height
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height, 2835, 2835, 0, 0)
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            b, g, r = pixel_fn(x, y)
            row += bytes((b & 0xFF, g & 0xFF, r & 0xFF))
        row += b"\x00" * (stride - len(row))
        rows += row
    return header + info + bytes(rows)


def decode_bmp(content: bytes) -> dict:
    """Parse BMP headers: width, height, bpp, n_pixels. Raises ValueError on
    a non-BMP blob (the real-codec contract: garbage in, error out)."""
    import struct

    if content is None or len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP blob")
    width, height = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    return {"width": width, "height": abs(height), "bpp": bpp, "n_pixels": width * abs(height)}


def make_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Minimal valid PCM16 mono WAV."""
    import struct

    data = b"".join(struct.pack("<h", max(-32768, min(32767, s))) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16)
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(content: bytes) -> dict:
    """Parse RIFF/fmt/data chunks: channels, sample_rate, bits, n_samples,
    duration_ms. Walks the chunk list (not fixed offsets) so WAVs with extra
    chunks still decode. Raises ValueError on a non-WAV blob."""
    import struct

    if content is None or len(content) < 44 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV blob")
    pos, channels, sample_rate, bits, data_len = 12, None, None, None, None
    while pos + 8 <= len(content):
        cid, clen = struct.unpack_from("<4sI", content, pos)
        if cid == b"fmt ":
            if pos + 8 + 16 > len(content):
                raise ValueError("WAV truncated inside fmt chunk")
            _, channels, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", content, pos + 8)
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)
    if channels is None or data_len is None:
        raise ValueError("WAV missing fmt/data chunk")
    if channels == 0 or bits == 0 or sample_rate == 0 or bits % 8 != 0:
        # zeroed/invalid fmt fields would ZeroDivisionError below — the
        # contract is ValueError on any undecodable blob
        raise ValueError("WAV fmt chunk has invalid channels/bits/sample_rate")
    n_samples = data_len // (channels * bits // 8)
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "bits": bits,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // sample_rate,
    }


def synthesize_codec_media(docs: DataFrame) -> DataFrame:
    """Build a media table of GENUINE BMP/WAV blobs, deterministically from
    doc_id (even ids -> 24-bit BMP, odd -> PCM16 WAV). The generative
    formulas are simple integer arithmetic, so a SQL oracle can predict
    exactly what the real decoder must recover from the bytes:

        image: width = 4 + doc_id % 13, height = 3 + doc_id % 7
               n_bytes = 54 + height * ((width*3 + 3)//4*4)
        audio: sample_rate = 8000, n_samples = 100 + doc_id % 400
               n_bytes = 44 + n_samples * 2
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {k.name: [] for k in MEDIA_SCHEMA.fields}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 2 == 0:
                    w, h = 4 + d % 13, 3 + d % 7
                    blob = make_bmp(w, h, lambda x, y: (d + x, d + y, d + x + y))
                    out["media_id"].append(d)
                    out["modality"].append("image")
                    out["content"].append(blob)
                    out["mime_type"].append("image/bmp")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["duration_ms"].append(None)
                else:
                    n = 100 + d % 400
                    blob = make_wav([(d * 131 + i * 17) % 65536 - 32768 for i in range(n)])
                    out["media_id"].append(d)
                    out["modality"].append("audio")
                    out["content"].append(blob)
                    out["mime_type"].append("audio/wav")
                    out["width"].append(None)
                    out["height"].append(None)
                    out["duration_ms"].append(n * 1000 // 8000)
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(run, schema=MEDIA_SCHEMA)


METADATA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def decode_media_metadata(media: DataFrame) -> DataFrame:
    """Decode blobs with the REAL stdlib codecs (BMP/WAV header parsing) via
    mapInPandas — the end-to-end proof that the binary-column path carries
    decodable media, not just opaque bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {k.name: [] for k in METADATA_SCHEMA.fields}
            for media_id, modality, content in zip(
                pdf["media_id"], pdf["modality"], pdf["content"]
            ):
                out["media_id"].append(media_id)
                out["modality"].append(modality)
                out["n_bytes"].append(len(content) if content is not None else None)
                if content is None:
                    # NULL blob = absent media, not garbage: NULL metadata
                    # row (bytes(None) would TypeError the whole task).
                    # Undecodable NON-NULL bytes still error out — the
                    # real-codec contract.
                    for k in ("width", "height", "sample_rate", "n_samples", "duration_ms"):
                        out[k].append(None)
                elif modality == "image":
                    meta = decode_image(bytes(content))
                    out["width"].append(meta["width"])
                    out["height"].append(meta["height"])
                    out["sample_rate"].append(None)
                    out["n_samples"].append(None)
                    out["duration_ms"].append(None)
                elif modality == "audio":
                    meta = decode_wav(bytes(content))
                    out["width"].append(None)
                    out["height"].append(None)
                    out["sample_rate"].append(meta["sample_rate"])
                    out["n_samples"].append(meta["n_samples"])
                    out["duration_ms"].append(meta["duration_ms"])
                else:
                    for k in ("width", "height", "sample_rate", "n_samples", "duration_ms"):
                        out[k].append(None)
            yield pd.DataFrame(
                {k: (pd.array(v, dtype="Int64") if k not in ("modality",) else v)
                 for k, v in out.items()}
            )

    return media.mapInPandas(run, schema=METADATA_SCHEMA)


def _decode_bmp_features(content: bytes | None, n_features: int = 8) -> list[float]:
    """REAL image decoder for the DECODERS registry: parses the BMP headers
    and summarizes pixel bytes into a fixed-length feature vector."""
    if not content:
        return [0.0] * n_features
    meta = decode_bmp(content)
    pixels = content[54:]
    byte_feats = []
    for i in range(n_features - 3):
        chunk = pixels[i :: n_features - 3]
        byte_feats.append(float(sum(chunk) % 997) if chunk else 0.0)
    return [float(meta["width"]), float(meta["height"]), float(meta["bpp"])] + byte_feats


def _decode_wav_features(content: bytes | None, n_features: int = 8) -> list[float]:
    """REAL audio decoder for the DECODERS registry: parses RIFF headers and
    summarizes PCM bytes into a fixed-length feature vector."""
    if not content:
        return [0.0] * n_features
    meta = decode_wav(content)
    data = content[44:]
    byte_feats = []
    for i in range(n_features - 3):
        chunk = data[i :: n_features - 3]
        byte_feats.append(float(sum(chunk) % 997) if chunk else 0.0)
    return [float(meta["sample_rate"]), float(meta["n_samples"]), float(meta["bits"])] + byte_feats


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"


def decode_image(content: bytes) -> dict:
    """Format-dispatched image header decode (BMP/PNG/JPEG magic): always
    returns at least {width, height}. Pure stdlib for all three formats —
    dimensions live in headers, no pixel codec involved."""
    content = bytes(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:8] == PNG_MAGIC:
        return decode_png(content)
    if content[:3] == JPEG_MAGIC:
        return decode_jpeg(content)
    raise ValueError("unsupported image format (BMP/PNG/JPEG magic expected)")


def decode_png(content: bytes) -> dict:
    """Parse a PNG's IHDR chunk (the PUBLIC PNG spec, RFC 2083 §4.1.1):
    width, height, bit depth, color type, channels. Pure stdlib — header
    metadata never needs a pixel codec. Raises ValueError on non-PNG."""
    import struct

    if content is None or len(content) < 33 or content[:8] != PNG_MAGIC:
        raise ValueError("not a PNG blob")
    # first chunk must be IHDR: length(4) type(4) data(13) crc(4) at offset 8
    clen, ctype = struct.unpack_from(">I4s", content, 8)
    if ctype != b"IHDR" or clen != 13:
        raise ValueError("PNG missing leading IHDR chunk")
    width, height, bit_depth, color_type = struct.unpack_from(">IIBB", content, 16)
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"PNG invalid color type {color_type}")
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "channels": channels,
    }


def decode_jpeg(content: bytes) -> dict:
    """Parse a JPEG's SOF segment for dimensions (the PUBLIC JFIF/ITU T.81
    marker walk): width, height, channels. Pure stdlib; raises ValueError
    on non-JPEG or a truncated marker stream."""
    import struct

    if content is None or len(content) < 4 or content[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG blob")
    pos = 2
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker stream desynced")
        marker = content[pos + 1]
        if marker == 0xFF:
            pos += 1  # fill byte (ITU T.81 B.1.1.2): markers may be padded
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # parameterless markers
            continue
        seg_len = struct.unpack_from(">H", content, pos + 2)[0]
        # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry the frame header
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 10 > len(content):
                raise ValueError("JPEG truncated inside SOF frame header")
            _precision, height, width, channels = struct.unpack_from(
                ">BHHB", content, pos + 4
            )
            return {"width": width, "height": height, "channels": channels}
        if marker == 0xDA:  # start of scan — SOF must have come first
            break
        pos += 2 + seg_len
    raise ValueError("JPEG missing SOF frame header")


def _pil_image_module():
    """Optional PIL import — None when Pillow is absent (this container)."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _decode_image_features(content: bytes | None, n_features: int = 8) -> list[float]:
    """REAL image decoder for the DECODERS registry, format-dispatched on
    magic bytes:

    - BMP: full stdlib decode (headers + pixel byte stats) — unchanged.
    - PNG/JPEG: header metadata via the stdlib parsers above; pixel-level
      features need a pixel codec, so they go through PIL when it is
      importable (optional dependency — decode, convert to RGB, resize to
      a 16x16 thumbnail, byte-stat the pixels exactly like the BMP path).
      Without PIL this raises the honest NotImplementedError guard rather
      than fabricating pixel features from compressed bytes.
    - anything else: ValueError (garbage-in, error-out contract).

    Feature layout matches _decode_bmp_features: [width, height, depth] +
    byte stats, so downstream schemas are codec-independent.
    """
    if not content:
        return [0.0] * n_features
    content = bytes(content)
    if content[:2] == b"BM":
        return _decode_bmp_features(content, n_features)
    if content[:8] == PNG_MAGIC:
        meta = decode_png(content)
        head = [float(meta["width"]), float(meta["height"]), float(meta["channels"])]
    elif content[:3] == JPEG_MAGIC:
        meta = decode_jpeg(content)
        head = [float(meta["width"]), float(meta["height"]), float(meta["channels"])]
    else:
        raise ValueError("unsupported image format (BMP/PNG/JPEG magic expected)")
    Image = _pil_image_module()
    if Image is None:
        raise NotImplementedError(
            "PNG/JPEG pixel features require Pillow (optional dependency, not "
            "present in this container) — header metadata is available via "
            "multimodal.decode_png/decode_jpeg; install Pillow or register a "
            "decoder in multimodal.DECODERS"
        )
    import io

    img = Image.open(io.BytesIO(content)).convert("RGB").resize((16, 16))
    pixels = img.tobytes()
    byte_feats = []
    for i in range(n_features - 3):
        chunk = pixels[i :: n_features - 3]
        byte_feats.append(float(sum(chunk) % 997) if chunk else 0.0)
    return head + byte_feats


def synthesize_media(docs: DataFrame, modality: str = "bytes") -> DataFrame:
    """Build an OPAQUE-blob media table from the documents table (text bytes
    as the blob) — exercises the binary-column path on driver-provided data.
    For genuine decodable media use ``synthesize_codec_media``."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("width"),
        F.lit(1).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched).

    The per-batch loop calls DECODERS[modality]; everything else (hashing,
    sizes) is vectorized pandas.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            feats: list[list[float] | None] = []
            hashes: list[Any] = []
            nbytes: list[Any] = []
            for content, modality in zip(pdf["content"], pdf["modality"]):
                decoder = DECODERS[modality]
                feats.append(decoder(content))
                hashes.append(zlib.crc32(content) if content is not None else None)
                nbytes.append(len(content) if content is not None else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pd.array(nbytes, dtype="Int64"),
                    "content_hash": pd.array(hashes, dtype="Int64"),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_ts_ms", LongType(), True),
        StructField("frame_bytes", BinaryType(), True),
        StructField("frame_n_bytes", LongType(), True),
    ]
)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Frame sampling: one input blob -> N frame rows (mapInPandas emitting
    multiple output rows per input — the 1:N Arrow path real video decode
    needs). The decode is the deterministic stub (fixed-size byte slices
    standing in for decoded frames); timing metadata, batching, and the
    exploded-row contract are real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {k.name: [] for k in FRAME_SCHEMA.fields}
            for media_id, content, duration in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                if content is None:
                    continue
                total_ms = int(duration) if duration is not None and not pd.isna(duration) else len(content)
                n = max(1, min(max_frames, total_ms // every_ms))
                step = max(1, len(content) // n)
                for i in range(n):
                    chunk = content[i * step: (i + 1) * step][:64]
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
                    out["frame_bytes"].append(bytes(chunk))
                    out["frame_n_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: updates metadata, leaves bytes opaque (decode+resize
    is a DECODERS concern). Kept as a distinct operator so pipelines can
    declare intent that a real decoder later fulfills — for 24-bit BMP
    blobs that decoder exists: resize_bmp below (which nulls out garbage
    rows, whereas decode_media_metadata errors on undecodable non-NULL
    bytes — two contracts, both stated)."""
    return media.withColumn("width", F.lit(width).cast("long")).withColumn(
        "height", F.lit(height).cast("long")
    )


def bmp_pixels(content: bytes) -> list[list[tuple[int, int, int]]]:
    """Decode a 24-bit BMP's pixel grid to rows of (b, g, r), top-down.
    Real parse (data offset from the file header, 4-byte row stride,
    bottom-up row order); raises ValueError on non-BMP input."""
    import struct

    meta = decode_bmp(content)
    if meta["bpp"] != 24:
        raise ValueError("only 24-bit BMP supported")
    offset = struct.unpack_from("<I", content, 10)[0]
    w, h = meta["width"], meta["height"]
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for y in range(h):
        src_y = h - 1 - y  # stored bottom-up
        base = offset + src_y * stride
        rows.append(
            [tuple(content[base + 3 * x: base + 3 * x + 3]) for x in range(w)]
        )
    return rows


def resize_bmp_bytes(content: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize of a 24-bit BMP blob (decode pixels,
    sample, re-encode with the same stdlib codec). Pure bytes->bytes so it
    unit-tests without Spark."""
    src = bmp_pixels(content)
    sh, sw = len(src), len(src[0]) if src else 0

    def pixel(x: int, y: int) -> tuple[int, int, int]:
        return src[min(sh - 1, y * sh // height)][min(sw - 1, x * sw // width)]

    return make_bmp(width, height, pixel)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("n_bytes", LongType(), True),
    ]
)


def resize_bmp(media: DataFrame, width: int, height: int) -> DataFrame:
    """Distributed image resize over binary BMP columns: Arrow-batched
    mapInPandas around resize_bmp_bytes. Non-BMP/NULL blobs yield a NULL
    content row rather than failing the batch (dirty-corpus contract;
    decode_media_metadata, by contrast, nulls only NULL blobs and ERRORS
    on undecodable bytes). Map-only — partitioned by whatever the
    upstream layout is; at 100 TB the batch size lever is
    spark.sql.execution.arrow.maxRecordsPerBatch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {k.name: [] for k in RESIZED_SCHEMA.fields}
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    blob = resize_bmp_bytes(bytes(content), width, height)
                except (ValueError, TypeError):
                    blob = None
                out["media_id"].append(media_id)
                out["content"].append(blob)
                out["width"].append(width)
                out["height"].append(height)
                out["n_bytes"].append(len(blob) if blob is not None else None)
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(run, schema=RESIZED_SCHEMA)


_register_default_decoders()
