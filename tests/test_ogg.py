"""Ogg page framing (`gemmsql/pipeline/ogg.py`): CRC variant,
lacing/continuation round-trips, strict-parse fuzz.  The corpus
hash gate runs in tests/test_rotation.py (`ogg_shard_ingest`)."""

from __future__ import annotations

import struct
import zlib

import pytest

from gemmsql.pipeline.ogg import (
    _MAGIC,
    build_ogg,
    ogg_crc,
    parse_ogg,
)


def test_crc_is_the_forward_variant():
    # Ogg's CRC-32 shares zlib's polynomial but NOT its bit order:
    # forward form, zero init, zero final xor.  The check value for
    # those parameters is pinned as a regression vector, and it must
    # differ from zlib's reflected CRC over the same input.
    assert ogg_crc(b"123456789") == 0x89A1897F
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"123456789") != zlib.crc32(b"123456789")


def test_roundtrip_lacing_shapes():
    cases = [
        [b"x"],                                  # single tiny packet
        [b"a" * 255],                            # exact-255 (0 lace)
        [b"a" * 510, b"b"],                      # double-255
        [b"c" * 700, b"", b"tail"],              # span + empty packet
        [bytes([i % 256]) * (37 * i % 900) for i in range(20)],
    ]
    for packets in cases:
        for max_segs in (2, 3, 8, 255):
            serial, got = parse_ogg(
                build_ogg(5, packets, max_segs=max_segs)
            )
            assert serial == 5
            assert got == packets, (max_segs, [len(p) for p in packets])


def test_spanning_sets_continued_and_granule():
    blob = build_ogg(9, [b"z" * 700], max_segs=2)
    # page 0: BOS, ends mid-packet -> granule -1; page 1: continued
    assert blob[5] & 0x02                       # BOS
    (g0,) = struct.unpack("<q", blob[6:14])
    assert g0 == -1
    second = blob.index(_MAGIC, 4)
    assert blob[second + 5] & 0x01              # continued
    serial, got = parse_ogg(blob)
    assert got == [b"z" * 700]


def test_strict_parse_rejects_corruption():
    blob = bytearray(build_ogg(3, [b"hello" * 100, b"world"], max_segs=2))
    with pytest.raises(ValueError, match="capture"):
        parse_ogg(b"XggS" + bytes(blob[4:]))
    bad = bytearray(blob)
    bad[40] ^= 0x01                             # body byte flip
    with pytest.raises(ValueError, match="CRC"):
        parse_ogg(bytes(bad))
    with pytest.raises(ValueError, match="truncated|EOS|mid-packet"):
        parse_ogg(bytes(blob[: len(blob) // 2]))
    with pytest.raises(ValueError, match="after the EOS"):
        parse_ogg(bytes(blob) + bytes(blob))    # two streams glued
    # drop the first page entirely -> BOS/sequence violation
    second = bytes(blob).index(_MAGIC, 4)
    with pytest.raises(ValueError):
        parse_ogg(bytes(blob[second:]))


def test_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.binary(min_size=0, max_size=800), min_size=1,
                 max_size=8),
        st.integers(min_value=1, max_value=12),
    )
    def check(packets, max_segs):
        serial, got = parse_ogg(build_ogg(1, packets, max_segs=max_segs))
        assert got == packets

    check()


def test_fragment_parse_modes():
    from gemmsql.pipeline.ogg import ogg_page_index, parse_ogg

    packets = [bytes([i]) * (200 * i % 700) for i in range(12)]
    blob = build_ogg(2, packets, max_segs=3)
    lens, fresh = ogg_page_index(blob)
    assert sum(lens) == len(blob)
    # cut at every legal boundary: fragments reassemble exactly
    offs = [0]
    pos = 0
    for ln, fr in zip(lens, fresh):
        if pos and fr:
            offs.append(pos)
        pos += ln
    offs.append(len(blob))
    got = []
    for a, b in zip(offs, offs[1:]):
        _, ps = parse_ogg(blob[a:b], fragment=True)
        got.extend(ps)
    assert got == packets
    # a cut landing mid-packet must reject (leading continued flag)
    bad_off = next(
        o for o, fr in zip(
            [sum(lens[:i]) for i in range(len(lens))], fresh)
        if o and not fr
    )
    with pytest.raises(ValueError, match="continuation"):
        parse_ogg(blob[bad_off:], fragment=True)
    # truncation inside a page header or its lacing table must fail
    # with the module's ValueError contract, not IndexError / silent
    # clamp (ADVICE r12 #4)
    with pytest.raises(ValueError, match="truncated page header"):
        ogg_page_index(blob[:20])
    n_segs_at = 26
    with pytest.raises(ValueError, match="truncated lacing"):
        ogg_page_index(blob[:n_segs_at + 2])


def test_split_ingest_equals_whole_at_three_sizes(spark):
    from tests.conftest import SF_SMOKE

    from gemmsql.pipeline.ogg import ogg_shard_ingest, ogg_split_ingest

    whole = sorted(map(tuple, ogg_shard_ingest(spark, SF_SMOKE).collect()))
    for target in (512, 4096, 1 << 20):
        split = sorted(map(tuple, ogg_split_ingest(
            spark, SF_SMOKE, target_split_bytes=target).collect()))
        assert split == whole, target


def test_ogg_crc_vectorized_matches_scalar():
    """Forward-CRC variant of the crcvec differential: the vectorized
    Ogg page CRC must equal the byte-at-a-time reference across the
    threshold and chunk boundaries."""
    import random

    from gemmsql.pipeline.ogg import _ogg_crc_scalar, ogg_crc

    rng = random.Random(0x066)
    for n in (0, 1, 31, 32, 33, 300, 4095, 4096, 4097, 9000):
        d = rng.randbytes(n)
        assert ogg_crc(d) == _ogg_crc_scalar(d), n
