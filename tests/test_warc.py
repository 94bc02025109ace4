"""WARC web-archive tier (gemmsql/pipeline/warc.py): record framing
round-trip, strict-parse enforcement, HTTP block parsing, and the
CDX-span random-access contract (per-span decode == whole-shard
decode, the media_split range-union discipline); corpus-scale ingest
hash parity lives in tests/test_rotation.py."""

from __future__ import annotations

import gzip

import pytest

from gemmsql.pipeline.jsonlgz import gunzip_members
from gemmsql.pipeline.warc import (
    _decode_shard,
    _record_uuid,
    _warc_date,
    build_warc_shard,
    parse_http_response,
    parse_warc_record,
    warc_member_spans,
    warc_record,
)

ROWS = [
    (0, "hello world", "srcA"),
    (1, "line one\nline two\r\nwith CRLF inside", "srcB"),
    (90061, "", "srcC"),            # empty body; secs roll 25:01:01 -> 01:01:01
]


def test_record_roundtrip():
    rec = warc_record("response", [("WARC-Target-URI", "http://x/1")], b"abc")
    headers, block = parse_warc_record(rec)
    assert headers["WARC-Type"] == "response"
    assert headers["WARC-Target-URI"] == "http://x/1"
    assert headers["Content-Length"] == "3"
    assert block == b"abc"


def test_record_strictness():
    rec = warc_record("response", [], b"abcd")
    with pytest.raises(ValueError, match="version"):
        parse_warc_record(b"WARC/9.9" + rec[8:])
    with pytest.raises(ValueError, match="terminator"):
        parse_warc_record(rec[:-2])
    with pytest.raises(ValueError, match="trailing"):
        parse_warc_record(rec + b"x")
    # block content shorter than Content-Length claims
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_record(rec.replace(b"Content-Length: 4", b"Content-Length: 9"))


def test_http_response_parse():
    block = (
        b"HTTP/1.1 404 Not Found\r\nContent-Length: 2\r\n"
        b"X-A: b\r\n\r\nno"
    )
    status, headers, body = parse_http_response(block)
    assert (status, body) == (404, b"no")
    assert headers["X-A"] == "b"
    with pytest.raises(ValueError, match="Content-Length"):
        parse_http_response(block.replace(b"Length: 2", b"Length: 3"))


def test_deterministic_ids_and_dates():
    assert _record_uuid(7) == _record_uuid(7)
    assert _record_uuid(7) != _record_uuid(8)
    assert _warc_date(0) == "2026-01-01T00:00:00Z"
    assert _warc_date(90061) == "2026-01-01T01:01:01Z"


def test_shard_roundtrip_and_stdlib_gzip_interop():
    shard = build_warc_shard(ROWS)
    # stdlib gzip reads the whole multi-member stream we wrote
    whole = gzip.decompress(shard)
    assert whole.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo")
    rows = _decode_shard(shard)
    assert [(r[0], r[1]) for r in rows] == [(d, s) for d, _, s in ROWS]
    assert [r[2] for r in rows] == [0, 1, 90061 % 86400]
    assert all(r[3] == 200 for r in rows)
    assert [r[4] for r in rows] == [len(t) for _, t, _ in ROWS]
    assert all(r[6] == len(ROWS) + 1 for r in rows)


def test_cdx_spans_random_access():
    """Every (offset, length) span decodes independently to one
    record, and the per-span record sequence equals the whole-shard
    parse — the Common Crawl CDX random-access contract."""
    shard = build_warc_shard(ROWS)
    spans = warc_member_spans(shard)
    assert len(spans) == len(ROWS) + 1          # warcinfo + responses
    assert spans[0][0] == 0
    assert sum(ln for _, ln in spans) == len(shard)
    per_span = []
    for off, ln in spans:
        data, n = gunzip_members(shard[off : off + ln])
        assert n == 1
        per_span.append(parse_warc_record(data))
    assert per_span[0][0]["WARC-Type"] == "warcinfo"
    whole = gzip.decompress(shard)
    # re-split the plaintext at record terminators and compare blocks
    assert b"".join(
        warc_record(
            h["WARC-Type"],
            [(k, v) for k, v in h.items()
             if k not in ("WARC-Type", "Content-Length")],
            b,
        )
        for h, b in per_span
    ) == whole


def test_decode_enforces_invariants():
    shard = build_warc_shard(ROWS)
    with pytest.raises(ValueError):
        _decode_shard(shard[:-4])               # truncated member
    # corrupt one byte inside the first response member's deflate body
    spans = warc_member_spans(shard)
    off = spans[1][0] + 16
    bad = bytearray(shard)
    bad[off] ^= 0xFF
    with pytest.raises(ValueError):
        _decode_shard(bytes(bad))
    # shard without the leading warcinfo is rejected
    tail = shard[spans[1][0]:]
    with pytest.raises(ValueError, match="warcinfo"):
        _decode_shard(tail)
