"""WebDataset-style tar shard tier (gemmsql/pipeline/tarshard.py):
ustar framing round-trip + stdlib interop, checksum/truncation/pairing
enforcement; corpus-scale ingest hash parity lives in
tests/test_rotation.py."""

from __future__ import annotations

import io
import tarfile

import pytest

from gemmsql.pipeline.tarshard import (
    build_tar,
    pair_members,
    parse_tar,
    tar_member,
)

MEMBERS = [
    ("0.txt", b"hello world"),
    ("0.json", b'{"doc_id":0}'),
    ("1.txt", b"x" * 513),          # spans two data blocks
    ("1.json", b"{}"),
    ("2.txt", b""),                 # zero-length member
    ("2.json", b'{"doc_id":2}'),
]


def test_roundtrip_and_order():
    assert parse_tar(build_tar(MEMBERS)) == MEMBERS


def test_stdlib_tarfile_reads_our_archives():
    """Interop proof: the from-scratch ustar writer produces archives
    the stdlib reader accepts byte-for-byte — we own the framing, not
    a private dialect."""
    t = build_tar(MEMBERS)
    tf = tarfile.open(fileobj=io.BytesIO(t))
    got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == MEMBERS


def test_we_read_stdlib_archives():
    """And the reverse: parse_tar accepts stdlib-written ustar."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in MEMBERS:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    assert parse_tar(buf.getvalue()) == MEMBERS


def test_every_header_corruption_detected_or_harmless():
    """Flip each byte of the first member's header: either parse
    raises (checksum/magic/size) or the members survive unchanged
    (flips inside the checksum field's own redundancy are impossible
    by construction — sum changes with any field byte)."""
    t = build_tar(MEMBERS)
    for pos in range(512):
        bad = bytearray(t)
        bad[pos] ^= 0x41
        try:
            got = parse_tar(bytes(bad))
        except ValueError:
            continue
        assert got == MEMBERS, f"byte {pos} silently changed members"


def test_truncation_and_missing_terminator():
    t = build_tar(MEMBERS)
    with pytest.raises(ValueError):
        parse_tar(t[: len(t) // 2 + 3])
    with pytest.raises(ValueError, match="terminator"):
        parse_tar(t[:-512])


def test_pairing_contract():
    p = pair_members(MEMBERS)
    assert set(p) == {"0", "1", "2"}
    assert p["1"]["txt"] == b"x" * 513
    with pytest.raises(ValueError, match="duplicate"):
        pair_members([("a.txt", b"1"), ("a.txt", b"2")])
    with pytest.raises(ValueError, match="extension"):
        pair_members([("noext", b"")])


def test_long_name_rejected():
    with pytest.raises(ValueError, match="100"):
        tar_member("x" * 101, b"")


LONG_NAME = "deep/nested/dir/" + "f" * 90 + ".txt"


def test_prefix_split_roundtrip():
    """Names over 100 bytes use the ustar prefix field (ADVICE r9 #3):
    our writer splits, our reader joins, and both interop with the
    stdlib in each direction."""
    members = [(LONG_NAME, b"payload"), ("short.json", b"{}")]
    t = build_tar(members)
    assert parse_tar(t) == members
    # stdlib reads our prefix member with the full path
    tf = tarfile.open(fileobj=io.BytesIO(t))
    assert [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()] \
        == members
    # and we read the stdlib's own prefix split
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            w.addfile(info, io.BytesIO(data))
    assert parse_tar(buf.getvalue()) == members


def test_unsplittable_long_name_raises():
    with pytest.raises(ValueError):
        tar_member("x" * 101, b"")
    with pytest.raises(ValueError):
        tar_member("a/" + "x" * 101, b"")  # name part itself too long
