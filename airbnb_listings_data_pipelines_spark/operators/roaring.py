"""Roaring bitmaps + Delta Lake's deletion-vector binary format.

Pure-Python implementation of the PUBLIC serialization formats needed to
interoperate with Delta Lake's ``deletionVectors`` table feature
(PROTOCOL.md "Deletion Vectors" — reader version 3 / writer version 7):

- the standard 32-bit RoaringBitmap *portable* serialization
  (github.com/RoaringBitmap/RoaringFormatSpec): array, bitmap and run
  containers, both the 12346 (no-run) and 12347 (with-run) cookies.
  This module WRITES the no-run form (always legal) and READS all three
  container kinds (external writers emit runs).
- the 64-bit "RoaringBitmapArray" layout Delta stores in DV blobs:
  ``<int32 LE magic 1681511377><int64 LE #bitmaps>`` then, per 32-bit
  bitmap in increasing key order, ``<int32 LE key><32-bit bitmap>``.
- the on-disk DV *file* format: a 1-byte format version (1), then each
  vector as ``<int32 BE size><data><int32 BE CRC-32-of-data>`` — a
  descriptor's ``offset`` points at the size field, ``sizeInBytes`` is
  len(data).
- the descriptor codecs: storageType ``u`` (path derived from a Base85
  / RFC 1924 encoded UUID — Python's ``base64.b85encode`` alphabet),
  ``i`` (inline Base85 data), ``p`` (absolute path).

Conformance: the 32-bit serialization is bit-compared against
``org.roaringbitmap.RoaringBitmap`` (the JVM implementation Spark
bundles for shuffle tracking) in tests/test_roaring.py — an independent
reference implementation, not a fixture we authored.

Scale shape: (de)serialization is O(cardinality) driver- or executor-side
byte work over vectors whose size is bounded by the per-file deleted-row
count — the same cost profile as Delta's own implementations. No Spark
jobs are launched here; callers decide where decoding runs (the snapshot
reader decodes per-descriptor inside mapInPandas tasks).
"""

from __future__ import annotations

import base64
import struct
import uuid as _uuid
import zlib

MAGIC = 1681511377  # Delta's RoaringBitmapArray magic (PROTOCOL.md)
_COOKIE_RUN = 12347  # SERIAL_COOKIE (run containers possible)
_COOKIE_NO_RUN = 12346  # SERIAL_COOKIE_NO_RUNCONTAINER
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # container cardinality above which a bitset is used
DV_FILE_VERSION = 1


# ------------------------------------------------------------ 32-bit core


def serialize_bitmap32(values) -> bytes:
    """Standard portable serialization of a 32-bit Roaring bitmap over
    ``values`` (iterable of ints in [0, 2^32)). Always emits the
    no-run-container form (cookie 12346): array containers for
    cardinality <= 4096, bitset containers above — exactly the choice
    the reference implementations make absent run optimization."""
    by_key: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v < 1 << 32:
            raise ValueError(f"value {v} outside uint32")
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    n = len(keys)
    header = struct.pack("<ii", _COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", k, len(set(by_key[k])) - 1) for k in keys
    )
    # offset header: byte position of each container from the START of
    # this bitmap's stream (mandatory with cookie 12346)
    containers: list[bytes] = []
    for k in keys:
        lows = sorted(set(by_key[k]))
        if len(lows) <= _ARRAY_MAX:
            containers.append(struct.pack(f"<{len(lows)}H", *lows))
        else:
            bits = bytearray(8192)
            for lo in lows:
                bits[lo >> 3] |= 1 << (lo & 7)
            containers.append(bytes(bits))
    pos = len(header) + len(desc) + 4 * n
    offsets = []
    for c in containers:
        offsets.append(pos)
        pos += len(c)
    return (
        header
        + desc
        + struct.pack(f"<{n}i", *offsets)
        + b"".join(containers)
    )


def deserialize_bitmap32(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Parse one standard-portable 32-bit Roaring bitmap starting at
    ``pos``; returns (sorted values, position after the bitmap). Handles
    both cookies and all three container kinds."""
    (cookie16,) = struct.unpack_from("<H", buf, pos)
    if cookie16 == _COOKIE_RUN:
        (hi,) = struct.unpack_from("<H", buf, pos + 2)
        n = hi + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    else:
        cookie, n = struct.unpack_from("<ii", buf, pos)
        if cookie != _COOKIE_NO_RUN:
            raise ValueError(f"bad roaring cookie {cookie} at {pos}")
        pos += 8
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    cards = []
    keys = []
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(cm1 + 1)
        pos += 4
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential parsing
    out: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        is_run = bool(run_flags[i >> 3] & (1 << (i & 7)))
        if is_run:
            (nruns,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(nruns):
                start, length_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(range(base + start, base + start + length_m1 + 1))
        elif cards[i] > _ARRAY_MAX:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, byte in enumerate(bits):
                while byte:
                    low = byte & -byte
                    out.append(base + (byte_i << 3) + low.bit_length() - 1)
                    byte ^= low
        else:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            out.extend(base + v for v in vals)
    return out, pos


# ------------------------------------------------- 64-bit array + magic


def serialize_rba(values) -> bytes:
    """Delta's DV payload: magic + the 64-bit portable RoaringBitmapArray
    over ``values`` (iterable of non-negative row indexes)."""
    by_key: dict[int, list[int]] = {}
    for v in values:
        if v < 0 or v >= 1 << 64:
            raise ValueError(f"row index {v} outside uint64")
        by_key.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    keys = sorted(by_key)
    out = [struct.pack("<iq", MAGIC, len(keys))]
    for k in keys:
        out.append(struct.pack("<i", k))
        out.append(serialize_bitmap32(by_key[k]))
    return b"".join(out)


def deserialize_rba(data: bytes) -> list[int]:
    """Inverse of :func:`serialize_rba`; returns sorted row indexes."""
    magic, n = struct.unpack_from("<iq", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: list[int] = []
    for _ in range(n):
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, pos = deserialize_bitmap32(data, pos)
        out.extend((key << 32) | v for v in vals)
    return out


# --------------------------------------------------------- DV file layout


def pack_dv_file(blobs: list[bytes]) -> tuple[bytes, list[int]]:
    """Assemble a deletion-vector FILE holding ``blobs`` (each a
    serialized RoaringBitmapArray): 1-byte format version, then per blob
    ``<int32 BE len><data><int32 BE crc32(data)>``. Returns (file bytes,
    per-blob offsets) — each offset points at the length field, which is
    what the descriptor's ``offset`` must carry."""
    parts = [bytes([DV_FILE_VERSION])]
    offsets = []
    pos = 1
    for data in blobs:
        offsets.append(pos)
        framed = (
            struct.pack(">i", len(data))
            + data
            + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        )
        parts.append(framed)
        pos += len(framed)
    return b"".join(parts), offsets


def read_dv_blob(raw: bytes, offset: int, size_in_bytes: int) -> bytes:
    """Extract + checksum-verify one DV blob from DV-file bytes ``raw``.
    ``offset``/``size_in_bytes`` come from the descriptor."""
    if not raw or raw[0] != DV_FILE_VERSION:
        raise ValueError(
            f"unsupported deletion-vector file version {raw[0] if raw else '<empty>'}"
        )
    (length,) = struct.unpack_from(">i", raw, offset)
    if length != size_in_bytes:
        raise ValueError(
            f"DV length field {length} != descriptor sizeInBytes {size_in_bytes}"
        )
    data = raw[offset + 4 : offset + 4 + length]
    (crc,) = struct.unpack_from(">I", raw, offset + 4 + length)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("DV checksum mismatch")
    return data


# ------------------------------------------------------ descriptor codecs


def encode_uuid_b85(u: _uuid.UUID) -> str:
    """Base85 (RFC 1924 alphabet — Python's b85) of the 16 UUID bytes:
    always 20 characters. This is ``pathOrInlineDv`` for storageType u."""
    return base64.b85encode(u.bytes).decode("ascii")


def decode_uuid_b85(s: str) -> _uuid.UUID:
    return _uuid.UUID(bytes=base64.b85decode(s.encode("ascii")))


def dv_relative_path(path_or_inline: str) -> str:
    """storageType=u: the table-relative DV file path. The LAST 20 chars
    are the Base85 UUID; anything before is an optional random prefix
    directory (PROTOCOL.md's layout for object-store key spreading)."""
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = decode_uuid_b85(enc)
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def decode_descriptor(descriptor: dict, table_path: str) -> list[int]:
    """Descriptor -> sorted deleted row indexes, for all three storage
    types. Pure function of (descriptor, table root) so executors can
    call it inside mapInPandas tasks without any driver state."""
    import os

    st = descriptor["storageType"]
    if st == "i":
        data = base64.b85decode(descriptor["pathOrInlineDv"].encode("ascii"))
        return deserialize_rba(data)
    if st == "u":
        full = os.path.join(
            table_path, dv_relative_path(descriptor["pathOrInlineDv"])
        )
    elif st == "p":
        full = descriptor["pathOrInlineDv"]
    else:
        raise NotImplementedError(
            f"deletion-vector storageType {st!r} (supported: u, i, p)"
        )
    with open(full, "rb") as fh:
        raw = fh.read()
    data = read_dv_blob(
        raw, int(descriptor["offset"]), int(descriptor["sizeInBytes"])
    )
    return deserialize_rba(data)
