"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct. The Spark
side — schema, partition-preserving mapInPandas, Arrow batch shape, output
contracts — is real and tested; the *decode* step is stubbed (image/audio
libraries are not in this container) behind ``DECODERS``: a deterministic
fake decoder by default, a clearly-marked NotImplementedError for real
codecs. Swap in a real decoder (PIL/torchaudio/ffmpeg) without touching any
Spark plumbing.

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
        "real media decoding requires PIL/torchaudio/ffmpeg, not present in "
        "this container — register a decoder in multimodal.DECODERS"
    )


DECODERS: dict[str, Callable[[bytes | None], list[float]]] = {
    "image": _fake_decode,
    "audio": _fake_decode,
    "video": _fake_decode,
}


def synthesize_media(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Build a media table from the documents table (text bytes as the blob)
    — exercises the binary-column path on driver-provided data only."""
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
    declare intent that a real decoder later fulfills."""
    return media.withColumn("width", F.lit(width).cast("long")).withColumn(
        "height", F.lit(height).cast("long")
    )
