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


def test_index_covers_shard_and_splits_are_valid_streams():
    from gemmsql.pipeline.tfrecord import tfrecord_index

    recs = [bytes([i]) * (10 + 37 * i % 300) for i in range(40)]
    blob = build_tfrecord(recs)
    lens = tfrecord_index(blob)
    assert sum(lens) == len(blob)
    # cutting on any frame boundary yields two valid streams whose
    # records concatenate to the original list
    cut = sum(lens[:17])
    left = parse_tfrecord(blob[:cut])
    right = parse_tfrecord(blob[cut:])
    assert left + right == recs


def test_split_ingest_equals_whole_at_three_sizes(spark):
    from tests.conftest import SF_SMOKE

    from gemmsql.pipeline.tfrecord import (
        tfrecord_ingest,
        tfrecord_split_ingest,
    )

    whole = sorted(
        map(tuple, tfrecord_ingest(spark, SF_SMOKE).collect())
    )
    for target in (512, 4096, 1 << 20):
        split = sorted(
            map(tuple, tfrecord_split_ingest(
                spark, SF_SMOKE, target_split_bytes=target).collect())
        )
        assert split == whole, target


def test_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=400), max_size=12))
    def check(recs):
        assert parse_tfrecord(build_tfrecord(recs)) == recs

    check()


def test_crc32c_vectorized_matches_scalar():
    """The NumPy position-table CRC (gemmsql.crcvec) must equal the
    byte-at-a-time reference on every length class: empty, sub-
    threshold, around the vectorization threshold, and across the
    4096-byte chunk boundary (ragged first chunk + full-chunk carry)."""
    import random

    from gemmsql.pipeline.tfrecord import _crc32c_scalar, crc32c

    rng = random.Random(0xC3C)
    for n in (0, 1, 8, 31, 32, 33, 512, 4095, 4096, 4097,
              8192, 8193, 12289, 40000):
        d = rng.randbytes(n)
        assert crc32c(d) == _crc32c_scalar(d), n
    # the known-answer vector: CRC-32C("123456789") == 0xE3069283
    assert _crc32c_scalar(b"123456789") == 0xE3069283
    assert crc32c(b"1234567890" * 10) == _crc32c_scalar(b"1234567890" * 10)
