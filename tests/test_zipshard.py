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


def test_zip64_round_trip_and_flag():
    """Forced ZIP64 members round-trip; the parser reports exactly
    which members rode ZIP64 framing (sentinels + 0x0001 extras)."""
    from gemmsql.pipeline.zipshard import parse_zip_entries

    data = build_zip(MEMBERS, zip64={"1.txt", "2.txt"}, eocd_zip64=True)
    got = parse_zip_entries(data)
    assert [(n, b, m) for n, b, m, _ in got] == MEMBERS
    assert [n for n, _, _, m64 in got if m64] == ["1.txt", "2.txt"]
    # and the all-forced variant
    got_all = parse_zip_entries(build_zip(MEMBERS, zip64=True))
    assert all(m64 for _, _, _, m64 in got_all)


def test_zip64_stdlib_reads_ours():
    data = build_zip(MEMBERS, zip64=True)
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        assert z.testzip() is None
        for name, body, method in MEMBERS:
            assert z.read(name) == body
            assert z.getinfo(name).compress_type == method


def test_zip64_we_read_stdlib_force_zip64():
    """stdlib's force_zip64 writes ZIP64 extras in the LOCAL headers
    only (sizes sentineled there, real in the extra) — the local-side
    resolution path."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        with z.open("big.txt", "w", force_zip64=True) as f:
            f.write(b"payload" * 100)
        z.writestr("small.txt", b"tiny")
    got = parse_zip(buf.getvalue())
    assert [(n, b) for n, b, _ in got] == [
        ("big.txt", b"payload" * 100), ("small.txt", b"tiny")
    ]


def test_zip64_we_read_stdlib_many_members():
    """>65 535 members saturate the classic EOCD count, forcing
    stdlib to emit the ZIP64 EOCD record + locator — the archive-side
    resolution path, at a REAL overflow rather than a forced one."""
    buf = io.BytesIO()
    n = 0xFFFF + 2
    with zipfile.ZipFile(buf, "w") as z:
        for i in range(n):
            z.writestr(f"{i}", b"")
    got = parse_zip(buf.getvalue())
    assert len(got) == n
    assert got[0][0] == "0" and got[-1][0] == str(n - 1)


def test_zip64_corruption_detected():
    from gemmsql.pipeline.zipshard import _EOCD64_SIG

    data = build_zip(MEMBERS, zip64=True)
    # classic EOCD member count disagrees with the ZIP64 record
    bad = bytearray(data)
    eocd_at = bytes(bad).rfind(b"PK\x05\x06")
    struct.pack_into("<HH", bad, eocd_at + 8,
                     len(MEMBERS) + 1, len(MEMBERS) + 1)
    with pytest.raises(ValueError, match="disagrees"):
        parse_zip(bytes(bad))
    # ZIP64 EOCD record signature destroyed -> locator points nowhere
    bad2 = bytearray(data)
    at64 = bytes(bad2).find(_EOCD64_SIG)
    bad2[at64] ^= 0xFF
    with pytest.raises(ValueError, match="ZIP64"):
        parse_zip(bytes(bad2))
    # sentinel sizes whose ZIP64 extra is missing
    bad3 = bytearray(build_zip(MEMBERS))
    cd_at = bytes(bad3).find(b"PK\x01\x02")
    struct.pack_into("<I", bad3, cd_at + 20, 0xFFFFFFFF)  # comp_size
    with pytest.raises(ValueError, match="sentinel"):
        parse_zip(bytes(bad3))


@pytest.mark.parametrize("target", [1, 64, 4096, 10**9])
def test_split_range_union_equals_whole_archive(target):
    """Range-union == whole-archive at several split sizes (the media
    readers' pinned property applied to the container tier): cutting
    the archive into ~target-byte member-aligned ranges and decoding
    each range independently must reproduce parse_zip_entries exactly
    — 1 byte/split degenerates to one member per task, 1 GB/split to
    one task for everything."""
    from gemmsql.pipeline.zipshard import (
        decode_zip_range,
        parse_zip_entries,
        split_zip,
    )

    data = build_zip(MEMBERS, zip64={"1.txt"})
    whole = parse_zip_entries(data)
    splits = split_zip(data, target)
    got = [
        e
        for s in splits
        for e in decode_zip_range(s["chunk"], s["base"], s["members"])
    ]
    assert sorted(got) == sorted(whole)
    if target == 1:
        assert len(splits) == len(MEMBERS)
    if target == 10**9:
        assert len(splits) == 1
    # splits partition the member set — no overlap, no loss
    names = [m["name"] for s in splits for m in s["members"]]
    assert sorted(names) == sorted(n for n, _, _ in MEMBERS)


def test_spark_split_ingest_matches_whole_shard(spark):
    """The distributed split path must produce the identical result
    set as the whole-shard ingest — at a split size small enough that
    shards genuinely fan out and doc pairs straddle split boundaries."""
    from tests.conftest import SF_SMOKE
    from tests.test_rotation import _hash
    from gemmsql.pipeline.zipshard import (
        zip_shard_ingest,
        zip_shard_ingest_split,
    )

    whole = zip_shard_ingest(spark, SF_SMOKE).toPandas()
    split = zip_shard_ingest_split(
        spark, SF_SMOKE, target_split_bytes=256
    ).toPandas()
    assert len(split) == len(whole)
    assert sorted(split.columns) == sorted(whole.columns)
    assert _hash(split) == _hash(whole)


def test_spark_gate_runs(spark):
    from tests.conftest import SF_SMOKE
    from gemmsql.pipeline.zipshard import zip_shard_ingest

    out = zip_shard_ingest(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) > 0
    by_parity = {r.doc_id % 2 for r in rows if r.stored == 1}
    assert by_parity == {0}  # even docs stored, odd deflated
    z64 = {r.doc_id % 3 for r in rows if r.zip64 == 1}
    assert z64 == {0}  # every third doc rides ZIP64 framing
