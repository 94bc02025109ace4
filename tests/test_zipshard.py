"""ZIP shard container (gemmsql/pipeline/zipshard.py): round-trip,
stdlib-zipfile interop both ways, and structural corruption checks."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from gemmsql.pipeline.zipshard import (
    DEFLATE,
    STORE,
    build_zip,
    parse_zip,
)

MEMBERS = [
    ("0.txt", b"hello zip world", STORE),
    ("0.json", b'{"doc_id":0}', DEFLATE),
    ("1.txt", b"x" * 5000, DEFLATE),          # compressible
    ("sub/1.json", b'{"doc_id":1}', STORE),   # path separator in name
    ("2.txt", b"", STORE),                    # empty member
]


def test_round_trip():
    got = parse_zip(build_zip(MEMBERS))
    assert got == MEMBERS


def test_stdlib_reads_ours():
    data = build_zip(MEMBERS)
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        assert z.testzip() is None  # stdlib CRC check passes
        assert [i.filename for i in z.infolist()] == [
            n for n, _, _ in MEMBERS
        ]
        for name, body, method in MEMBERS:
            assert z.read(name) == body
            assert z.getinfo(name).compress_type == method


def test_we_read_stdlib():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", b"alpha", compress_type=zipfile.ZIP_STORED)
        z.writestr(
            "b.txt", b"beta" * 2000, compress_type=zipfile.ZIP_DEFLATED
        )
    got = parse_zip(buf.getvalue())
    assert [(n, b) for n, b, _ in got] == [
        ("a.txt", b"alpha"), ("b.txt", b"beta" * 2000)
    ]
    assert [m for _, _, m in got] == [STORE, DEFLATE]


def test_crc_corruption_detected():
    data = bytearray(build_zip(MEMBERS))
    # flip a byte inside the first member's stored body
    at = data.index(b"hello zip world")
    data[at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-32"):
        parse_zip(bytes(data))


def test_truncated_and_bad_eocd():
    data = build_zip(MEMBERS)
    with pytest.raises(ValueError):
        parse_zip(data[:-1])  # EOCD comment-length check fails
    with pytest.raises(ValueError, match="end-of-central"):
        parse_zip(data[: len(data) - 22])  # EOCD gone entirely
    bad = bytearray(data)
    # corrupt the central-directory offset in the EOCD
    eocd_at = bytes(bad).rfind(b"PK\x05\x06")
    struct.pack_into("<I", bad, eocd_at + 16, 1)
    with pytest.raises(ValueError, match="abut"):
        parse_zip(bytes(bad))


def test_local_central_mismatch_detected():
    data = bytearray(build_zip(MEMBERS))
    # corrupt the METHOD field of the first LOCAL header only: the
    # central directory still says STORE, so the cross-check trips
    struct.pack_into("<H", data, data.index(b"PK\x03\x04") + 8, DEFLATE)
    with pytest.raises(ValueError, match="local/central"):
        parse_zip(bytes(data))


def test_unsupported_members_rejected():
    nb = b"x.bin"
    comp = b"\x00"
    # method 12 (bzip2): built by hand since build_zip refuses it
    local = b"PK\x03\x04" + struct.pack(
        "<HHHHHIIIHH", 20, 0, 12, 0, 0x21, 0, 1, 1, len(nb), 0
    ) + nb
    central = b"PK\x01\x02" + struct.pack(
        "<HHHHHHIIIHHHHHII", 20, 20, 0, 12, 0, 0x21, 0, 1, 1,
        len(nb), 0, 0, 0, 0, 0, 0,
    ) + nb
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 1, 1, len(central), len(local) + len(comp), 0
    )
    with pytest.raises(ValueError, match="method"):
        parse_zip(local + comp + central + eocd)


def test_spark_gate_runs(spark):
    from tests.conftest import SF_SMOKE
    from gemmsql.pipeline.zipshard import zip_shard_ingest

    out = zip_shard_ingest(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) > 0
    by_parity = {r.doc_id % 2 for r in rows if r.stored == 1}
    assert by_parity == {0}  # even docs stored, odd deflated
