"""Avro OCF walker (`gemmsql/pipeline/avro.py`): zigzag vectors,
container round-trips, strict-parse fuzz.  The corpus hash gate runs
in tests/test_rotation.py (`avro_shard_ingest`)."""

from __future__ import annotations

import pytest

from gemmsql.pipeline.avro import (
    _read_long,
    _sync_marker,
    build_avro,
    parse_avro,
    zigzag_encode,
)


def test_zigzag_spec_vectors():
    # the Avro specification's own encoding table
    assert zigzag_encode(0) == b"\x00"
    assert zigzag_encode(-1) == b"\x01"
    assert zigzag_encode(1) == b"\x02"
    assert zigzag_encode(-2) == b"\x03"
    assert zigzag_encode(2) == b"\x04"
    assert zigzag_encode(-64) == b"\x7f"
    assert zigzag_encode(64) == b"\x80\x01"


def test_varint_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def check(n):
        assert _read_long(zigzag_encode(n), 0)[0] == n

    check()


def test_container_roundtrip_block_shapes():
    rows = [(i, "en", "s%d" % (i % 3), "body " * (i % 11)) for i in range(40)]
    for rpb in (1, 8, 40, 100):
        assert parse_avro(build_avro(7, rows, recs_per_block=rpb)) == rows
    assert parse_avro(build_avro(1, [])) == []


def test_strict_parse_rejects_corruption():
    rows = [(i, "en", "web", "hello world %d" % i) for i in range(20)]
    blob = bytearray(build_avro(5, rows))
    with pytest.raises(ValueError, match="not an Avro"):
        parse_avro(b"Obj\x02" + bytes(blob[4:]))
    # flip a byte inside the LAST sync marker
    bad = bytearray(blob)
    bad[-1] ^= 0x01
    with pytest.raises(ValueError, match="sync"):
        parse_avro(bytes(bad))
    # truncate mid-block
    with pytest.raises(ValueError):
        parse_avro(bytes(blob[:-20]))
    # corrupt the block byte-size so it disagrees with the records —
    # find the first block header after the header sync
    sync = _sync_marker(5)
    first_block = bytes(blob).index(sync) + 16
    bad = bytearray(blob)
    bad[first_block + 1] ^= 0x02   # size varint (count is 1 byte here)
    with pytest.raises(ValueError):
        parse_avro(bytes(bad))


def test_schema_and_codec_are_enforced():
    rows = [(1, "en", "web", "x")]
    blob = build_avro(2, rows)
    # splice a different schema string into the metadata
    other = blob.replace(b'"name":"doc"', b'"name":"dog"')
    with pytest.raises(ValueError, match="schema mismatch"):
        parse_avro(other)
    zstd = blob.replace(b"null", b"zstd")
    with pytest.raises(ValueError, match="codec"):
        parse_avro(zstd)


def test_deflate_codec_roundtrip_and_strictness():
    """The spec's REQUIRED deflate codec (VERDICT r12 next #6): raw
    RFC 1951 block bodies, size prefix counting compressed bytes."""
    rows = [(i, "en", "s%d" % (i % 3), "body " * (i % 11))
            for i in range(40)]
    for rpb in (1, 8, 40):
        blob = build_avro(7, rows, recs_per_block=rpb, codec="deflate")
        assert parse_avro(blob) == rows
        # deflate genuinely compresses the repetitive corpus
        assert len(blob) < len(build_avro(7, rows, recs_per_block=rpb))
    blob = build_avro(7, rows, codec="deflate")
    # a corrupted compressed body must raise ValueError (not a raw
    # zlib error, not silent garbage): flip a byte inside the first
    # block body (after header sync, after the two varints)
    from gemmsql.pipeline.avro import avro_block_index

    header_end, sync, lens, codec = avro_block_index(blob)
    assert codec == b"deflate"
    bad = bytearray(blob)
    bad[header_end + 4] ^= 0xFF
    with pytest.raises(ValueError):
        parse_avro(bytes(bad))
    # truncating the compressed stream (shorter size prefix would be
    # a different corruption): cut the blob mid-block
    with pytest.raises(ValueError):
        parse_avro(blob[:header_end + lens[0] // 2])


def test_deflate_split_fragments_reassemble():
    from gemmsql.pipeline.avro import avro_block_index, parse_avro_blocks

    rows = [(i, "en", "s", "b" * (i % 9 + 40)) for i in range(30)]
    blob = build_avro(4, rows, recs_per_block=4, codec="deflate")
    header_end, sync, lens, codec = avro_block_index(blob)
    assert header_end + sum(lens) == len(blob)
    pos = header_end
    got = []
    for ln in lens:
        got.extend(parse_avro_blocks(blob[pos:pos + ln], sync, codec))
        pos += ln
    assert got == rows
    # decoding a deflate fragment as null must fail loudly (records
    # can't consume a compressed body exactly by accident)
    with pytest.raises(ValueError):
        parse_avro_blocks(
            blob[header_end:header_end + lens[0]], sync, b"null"
        )


def test_block_index_and_fragment_walk():
    from gemmsql.pipeline.avro import (
        avro_block_index,
        parse_avro_blocks,
    )

    rows = [(i, "en", "s", "b" * (i % 9)) for i in range(30)]
    blob = build_avro(4, rows, recs_per_block=4)
    header_end, sync, lens, codec = avro_block_index(blob)
    assert codec == b"null"
    assert header_end + sum(lens) == len(blob)
    assert sync == _sync_marker(4)
    # every block-boundary cut yields valid fragments that reassemble
    pos = header_end
    got = []
    for ln in lens:
        got.extend(parse_avro_blocks(blob[pos:pos + ln], sync))
        pos += ln
    assert got == rows
    # a wrong sync rejects the fragment
    with pytest.raises(ValueError, match="sync"):
        parse_avro_blocks(blob[header_end:header_end + lens[0]],
                          b"\x00" * 16)
    # a header truncated AT the sync marker must raise, not return a
    # short sync + empty block list (ADVICE r12 #3: the split planner
    # would silently drop the shard's rows)
    with pytest.raises(ValueError, match="sync"):
        avro_block_index(blob[:header_end - 10])


def test_split_ingest_equals_whole_at_three_sizes(spark):
    from tests.conftest import SF_SMOKE

    from gemmsql.pipeline.avro import avro_shard_ingest, avro_split_ingest

    whole = sorted(map(tuple, avro_shard_ingest(spark, SF_SMOKE).collect()))
    for target in (512, 4096, 1 << 20):
        split = sorted(map(tuple, avro_split_ingest(
            spark, SF_SMOKE, target_split_bytes=target).collect()))
        assert split == whole, target
