"""Roaring / Delta DV binary format (operators/roaring.py).

The 32-bit portable serialization is conformance-checked BIT-FOR-BIT
against ``org.roaringbitmap.RoaringBitmap`` — the independent JVM
reference implementation Spark itself bundles (RoaringBitmap-1.3.0.jar,
used for shuffle block tracking) — via py4j. Run-container parsing is
checked against JVM ``runOptimize()`` output. The rest (64-bit array,
DV file framing, descriptor codecs) is pinned by roundtrips and
hand-checked structural asserts.
"""

from __future__ import annotations

import struct
import uuid
import zlib

import pytest

from airbnb_listings_data_pipelines_spark.operators import roaring as R


def _jvm_serialize(spark, values: list[int]) -> bytes:
    """Serialize ``values`` with the JVM RoaringBitmap (reference impl)."""
    jvm = spark.sparkContext._jvm
    rb = jvm.org.roaringbitmap.RoaringBitmap()
    for v in values:
        rb.add(v - (1 << 32) if v >= 1 << 31 else v)  # java int wraps
    bos = jvm.java.io.ByteArrayOutputStream()
    rb.serialize(jvm.java.io.DataOutputStream(bos))
    return bytes(bos.toByteArray())


def _jvm_serialize_run(spark, values: list[int]) -> bytes:
    jvm = spark.sparkContext._jvm
    rb = jvm.org.roaringbitmap.RoaringBitmap()
    for v in values:
        rb.add(v - (1 << 32) if v >= 1 << 31 else v)
    rb.runOptimize()
    bos = jvm.java.io.ByteArrayOutputStream()
    rb.serialize(jvm.java.io.DataOutputStream(bos))
    return bytes(bos.toByteArray())


CASES = [
    [0],
    [1, 2, 3, 100, 65535],
    [65536, 65537, 131072],  # multiple container keys
    list(range(5000)),  # first container crosses the 4096 bitset line
    list(range(0, 200000, 3)),  # several containers, mixed kinds
    [2**32 - 1, 2**31, 7],  # high half of the uint32 space
]


@pytest.mark.parametrize("values", CASES, ids=[str(i) for i in range(len(CASES))])
def test_serialize32_matches_jvm_reference(spark, values):
    assert R.serialize_bitmap32(values) == _jvm_serialize(spark, values)


@pytest.mark.parametrize("values", CASES, ids=[str(i) for i in range(len(CASES))])
def test_deserialize32_roundtrip_and_jvm_bytes(spark, values):
    got, _pos = R.deserialize_bitmap32(R.serialize_bitmap32(values))
    assert got == sorted(set(values))
    got2, _pos = R.deserialize_bitmap32(_jvm_serialize(spark, values))
    assert got2 == sorted(set(values))


def test_deserialize32_handles_jvm_run_containers(spark):
    """External Delta writers run-optimize their vectors; the reader must
    parse cookie-12347 run containers (we never write them)."""
    values = list(range(1000, 2000)) + list(range(70000, 70010)) + [9]
    raw = _jvm_serialize_run(spark, values)
    (cookie16,) = struct.unpack_from("<H", raw, 0)
    assert cookie16 == 12347, "runOptimize must have produced run containers"
    got, pos = R.deserialize_bitmap32(raw)
    assert got == sorted(values)
    assert pos == len(raw), "parser must consume the whole stream"


def test_rba_roundtrip_and_magic():
    vals = [0, 5, 4096 * 3, (1 << 32) + 7, (5 << 32) + 123]
    data = R.serialize_rba(vals)
    magic, n = struct.unpack_from("<iq", data, 0)
    assert magic == R.MAGIC and n == 3  # keys 0, 1, 5
    assert R.deserialize_rba(data) == sorted(vals)
    with pytest.raises(ValueError, match="magic"):
        R.deserialize_rba(b"\x00" * 12)


def test_dv_file_framing_and_checksum():
    blobs = [R.serialize_rba([1, 2, 3]), R.serialize_rba([10**6])]
    raw, offsets = R.pack_dv_file(blobs)
    assert raw[0] == R.DV_FILE_VERSION and offsets[0] == 1
    for blob, off in zip(blobs, offsets):
        got = R.read_dv_blob(raw, off, len(blob))
        assert got == blob
        assert R.deserialize_rba(got) == R.deserialize_rba(blob)
    # size mismatch and bit-flip corruption both refuse
    with pytest.raises(ValueError, match="sizeInBytes"):
        R.read_dv_blob(raw, offsets[0], len(blobs[0]) + 1)
    corrupt = bytearray(raw)
    corrupt[offsets[0] + 4 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        R.read_dv_blob(bytes(corrupt), offsets[0], len(blobs[0]))


def test_uuid_b85_and_relative_path():
    u = uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
    enc = R.encode_uuid_b85(u)
    assert len(enc) == 20 and R.decode_uuid_b85(enc) == u
    assert R.dv_relative_path(enc) == f"deletion_vector_{u}.bin"
    # optional random prefix directory before the 20-char uuid
    assert R.dv_relative_path("ab" + enc) == f"ab/deletion_vector_{u}.bin"


def test_decode_descriptor_all_storage_types(tmp_path):
    rows = [3, 7, 4096, 70000]
    blob = R.serialize_rba(rows)
    raw, offsets = R.pack_dv_file([blob])
    u = uuid.uuid4()
    (tmp_path / f"deletion_vector_{u}.bin").write_bytes(raw)
    desc_u = {
        "storageType": "u",
        "pathOrInlineDv": R.encode_uuid_b85(u),
        "offset": offsets[0],
        "sizeInBytes": len(blob),
        "cardinality": len(rows),
    }
    assert R.decode_descriptor(desc_u, str(tmp_path)) == rows
    import base64

    desc_i = {
        "storageType": "i",
        "pathOrInlineDv": base64.b85encode(blob).decode(),
        "sizeInBytes": len(blob),
        "cardinality": len(rows),
    }
    assert R.decode_descriptor(desc_i, str(tmp_path)) == rows
    desc_p = dict(desc_u, storageType="p", pathOrInlineDv=str(tmp_path / f"deletion_vector_{u}.bin"))
    assert R.decode_descriptor(desc_p, str(tmp_path)) == rows
    with pytest.raises(NotImplementedError, match="storageType"):
        R.decode_descriptor(dict(desc_u, storageType="x"), str(tmp_path))


def test_hypothesis_rba_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=(1 << 40) - 1),
            max_size=300,
        )
    )
    def check(vals):
        assert R.deserialize_rba(R.serialize_rba(vals)) == sorted(set(vals))

    check()
