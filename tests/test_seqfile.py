"""Hadoop SequenceFile container: VInt vectors, strict walk,
sync-aligned splits (`gemmsql/pipeline/seqfile.py`).

Full Spark-vs-DuckDB hash parity for both gate paths runs in
tests/test_rotation.py; this file pins the byte-level pieces parity
can't see."""

from __future__ import annotations

import struct

import pytest

from gemmsql.pipeline.seqfile import (
    build_seqfile,
    parse_seqfile,
    read_vint,
    seqfile_segment_index,
    write_vint,
    _sync_marker,
    _walk_records,
)


def test_vint_spec_vectors():
    # single-byte range
    assert write_vint(0) == b"\x00"
    assert write_vint(127) == b"\x7f"
    assert write_vint(-112) == bytes([(-112) & 0xFF])
    # positive multi-byte: tag -113.. then big-endian magnitude
    assert write_vint(128) == bytes([(-113) & 0xFF, 0x80])
    assert write_vint(255) == bytes([(-113) & 0xFF, 0xFF])
    assert write_vint(256) == bytes([(-114) & 0xFF, 0x01, 0x00])
    # negative multi-byte: tag -121.., magnitude of ~i
    assert write_vint(-113) == bytes([(-121) & 0xFF, 112])
    assert write_vint(-257) == bytes([(-122) & 0xFF, 0x01, 0x00])


def test_vint_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def check(i):
        enc = write_vint(i)
        got, pos = read_vint(enc, 0)
        assert got == i and pos == len(enc)

    check()


def test_container_roundtrip_sync_shapes():
    rows = [(i, "en", "s%d" % (i % 3), "body " * (i % 11))
            for i in range(40)]
    for rps in (1, 8, 40, 100):
        assert parse_seqfile(
            build_seqfile(7, rows, recs_per_sync=rps)) == rows
    # compressed roundtrips: per-record deflate and block deflate
    # recover identical rows (VERDICT r13 next #5)
    for comp in ("record", "block"):
        for rps in (1, 8, 100):
            assert parse_seqfile(build_seqfile(
                7, rows, recs_per_sync=rps, compression=comp)) == rows
    empty = build_seqfile(1, [])
    assert parse_seqfile(empty) == []
    # the split planner accepts the same empty file the parser does
    body, sync, mode, lens = seqfile_segment_index(empty)
    assert lens == [] and body == len(empty) and mode == "none"


def test_strict_parse_rejects_corruption():
    rows = [(i, "en", "web", "hello world %d" % i) for i in range(20)]
    blob = bytearray(build_seqfile(5, rows))
    with pytest.raises(ValueError, match="not a version-6"):
        parse_seqfile(b"SEQ\x05" + bytes(blob[4:]))
    # flip a byte in the LAST sync escape
    sync = _sync_marker(5)
    last_esc = bytes(blob).rindex(struct.pack(">i", -1) + sync)
    bad = bytearray(blob)
    bad[last_esc + 5] ^= 0x01
    with pytest.raises(ValueError, match="sync"):
        parse_seqfile(bytes(bad))
    # truncate mid-record
    with pytest.raises(ValueError):
        parse_seqfile(bytes(blob[:-10]))
    # corrupt a record length so it disagrees with its Texts
    body_first_rec = bytes(blob).index(struct.pack(">i", -1) + sync) + 20
    bad = bytearray(blob)
    bad[body_first_rec + 3] ^= 0x01
    with pytest.raises(ValueError):
        parse_seqfile(bytes(bad))
    # a compressed file rejects at the header (the compression flags
    # sit right after the two class-name Texts)
    from gemmsql.pipeline.seqfile import _read_text

    comp = bytearray(blob)
    pos = 4
    _, pos = _read_text(bytes(blob), pos)
    _, pos = _read_text(bytes(blob), pos)
    comp[pos] = 1
    # flag flipped to compressed: the codec class parse lands on
    # metadata bytes and must reject (DefaultCodec only)
    with pytest.raises(ValueError, match="codec"):
        parse_seqfile(bytes(comp))


def test_segment_index_and_fragment_walk():
    rows = [(i, "en", "s", "b" * (i % 9 + 20)) for i in range(30)]
    blob = build_seqfile(4, rows, recs_per_sync=4)
    body, sync, mode, seg_lens = seqfile_segment_index(blob)
    assert body + sum(seg_lens) == len(blob)
    assert len(seg_lens) == 8  # ceil(30/4) segments
    # every segment-boundary cut yields fragments that reassemble
    pos = body
    got = []
    for ln in seg_lens:
        got.extend(
            _walk_records(blob[pos:pos + ln], sync,
                          require_leading_sync=True))
        pos += ln
    assert got == rows
    # a cut landing mid-record (not at an escape) rejects
    with pytest.raises(ValueError, match="does not start at a sync"):
        _walk_records(blob[body + 25:], sync, require_leading_sync=True)
    # a wrong sync rejects the fragment
    with pytest.raises(ValueError, match="sync"):
        _walk_records(blob[body:body + seg_lens[0]], b"\x00" * 16,
                      require_leading_sync=True)


def test_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    txt = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        max_size=60,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 2**40), st.sampled_from(["en", "de"]),
                      txt, txt),
            max_size=25,
        ),
        st.integers(1, 9),
    )
    def check(rows, rps):
        rows = [(i, lang, src or "s", text) for i, lang, src, text in rows]
        # doc_ids must be unique (key/value doc_id cross-check)
        seen = set()
        rows = [r for r in rows if r[0] not in seen and not seen.add(r[0])]
        blob = build_seqfile(3, rows, recs_per_sync=rps)
        assert parse_seqfile(blob) == rows
        if rows:
            body, sync, mode, lens = seqfile_segment_index(blob)
            assert body + sum(lens) == len(blob)

    check()


def test_split_ingest_equals_whole_at_three_sizes(spark):
    from tests.conftest import SF_SMOKE

    from gemmsql.pipeline.seqfile import (
        seqfile_shard_ingest,
        seqfile_split_ingest,
    )

    whole = sorted(
        map(tuple, seqfile_shard_ingest(spark, SF_SMOKE).collect())
    )
    assert len(whole) > 0
    for tgt in (512, 4096, 10**9):
        got = sorted(
            map(tuple,
                seqfile_split_ingest(
                    spark, SF_SMOKE, target_split_bytes=tgt).collect())
        )
        assert got == whole, tgt


def test_compressed_corruption_rejects():
    """The compressed framing's loud lane: bit flips inside deflate
    streams, truncated block streams, and wrong codec classes all
    raise instead of returning partial rows."""
    rows = [(i, "en", "web", "compress me %d" % i * 3) for i in range(24)]
    for comp in ("record", "block"):
        blob = bytearray(build_seqfile(9, rows, compression=comp))
        body, sync, mode, lens = seqfile_segment_index(bytes(blob))
        assert mode == comp
        # flip a byte INSIDE the first compressed payload (past the
        # escape + framing), scanning forward until something trips —
        # every flip inside a deflate stream must be caught by the
        # zlib CRC, the length accounting, or the Text parse
        tripped = 0
        for off in range(body + 26, body + min(lens[0], 120)):
            bad = bytearray(blob)
            bad[off] ^= 0x40
            try:
                got = parse_seqfile(bytes(bad))
            except ValueError:
                tripped += 1
                continue
            # an undetected flip must at least not silently ALTER rows
            assert got == rows, (comp, off)
        assert tripped > 0, comp
        # truncation mid-stream rejects
        with pytest.raises(ValueError):
            parse_seqfile(bytes(blob[:-7]))


def test_compressed_segment_splits_reassemble():
    """Block- and record-compressed shards split on the same sync
    escapes: every segment-boundary fragment walk reassembles the
    whole, and mid-segment cuts reject."""
    rows = [(i, "de", "s", "x" * (i % 13 + 10)) for i in range(40)]
    for comp in ("record", "block"):
        blob = build_seqfile(11, rows, recs_per_sync=5, compression=comp)
        body, sync, mode, seg_lens = seqfile_segment_index(blob)
        assert body + sum(seg_lens) == len(blob)
        pos, got = body, []
        for ln in seg_lens:
            got.extend(_walk_records(
                blob[pos:pos + ln], sync,
                require_leading_sync=True, mode=mode))
            pos += ln
        assert got == rows
        with pytest.raises(ValueError, match="sync"):
            _walk_records(blob[body + 3:], sync,
                          require_leading_sync=True, mode=mode)
