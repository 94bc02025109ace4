"""TFRecord framing (`gemmsql/pipeline/tfrecord.py`): CRC-32C
vectors, masking, strict-parse fuzz.  The corpus-scale hash gate
runs in tests/test_rotation.py (`tfrecord_ingest`)."""

from __future__ import annotations

import struct

import pytest

from gemmsql.pipeline.tfrecord import (
    build_tfrecord,
    crc32c,
    masked_crc,
    parse_tfrecord,
    tfrecord_frame,
)


def test_crc32c_known_vectors():
    # the Castagnoli check value plus the all-zeros / iSCSI vectors
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_masking_is_rotr15_plus_delta():
    data = b"some record"
    c = crc32c(data)
    want = (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc(data) == want


def test_roundtrip_including_empty_and_large():
    recs = [b"hello", b"", b"x" * 100_000, bytes(range(256))]
    assert parse_tfrecord(build_tfrecord(recs)) == recs
    assert parse_tfrecord(b"") == []


def test_strict_parse_rejects_corruption():
    recs = [b"alpha", b"beta"]
    blob = bytearray(build_tfrecord(recs))
    # flip a payload byte -> data CRC mismatch
    bad = bytearray(blob)
    bad[12] ^= 0x01
    with pytest.raises(ValueError, match="data CRC"):
        parse_tfrecord(bytes(bad))
    # flip a length byte -> length CRC mismatch
    bad = bytearray(blob)
    bad[0] ^= 0x01
    with pytest.raises(ValueError, match="length CRC"):
        parse_tfrecord(bytes(bad))
    # truncate inside the payload
    with pytest.raises(ValueError, match="truncated"):
        parse_tfrecord(bytes(blob[: len(tfrecord_frame(b"alpha")) - 2]))
    # trailing garbage after the last record
    with pytest.raises(ValueError):
        parse_tfrecord(bytes(blob) + b"\x01\x02\x03")
    # a length word that overruns the buffer
    huge = struct.pack("<Q", 1 << 40)
    frame = huge + struct.pack("<I", masked_crc(huge)) + b"tiny"
    with pytest.raises(ValueError, match="truncated"):
        parse_tfrecord(frame)
