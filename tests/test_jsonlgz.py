"""Gzip member framing + JSONL shard ingest (gemmsql/pipeline/jsonlgz.py)."""

import gzip
import struct
import zlib

import duckdb
import pytest

from gemmsql.pipeline.jsonlgz import gunzip_members, gzip_member
from tests.conftest import SF_SMOKE

PAYLOAD = b'{"a":1}\n{"b":"two words"}\n'


def test_member_roundtrip_all_header_fields():
    buf = gzip_member(
        PAYLOAD,
        name=b"shard-000.jsonl",
        extra=b"XX\x04\x00abcd",
        comment=b"written by gemmsql",
        hcrc=True,
    )
    data, n = gunzip_members(buf)
    assert (data, n) == (PAYLOAD, 1)


def test_multi_member_concat_and_appendability():
    """cat a.gz b.gz is a valid stream — the property shard appenders
    rely on; payloads concatenate in order."""
    a = gzip_member(b"alpha\n", name=b"a")
    b = gzip_member(b"beta\n")
    c = gzip_member(b"", comment=b"empty member is legal")
    data, n = gunzip_members(a + b + c)
    assert data == b"alpha\nbeta\n"
    assert n == 3


def test_stdlib_interop_both_directions():
    """Our members decode with stdlib gzip; stdlib output decodes with
    our walker — the format really is RFC 1952."""
    assert gzip.decompress(gzip_member(PAYLOAD, name=b"x")) == PAYLOAD
    blob = gzip.compress(PAYLOAD, 5)
    data, n = gunzip_members(blob)
    assert (data, n) == (PAYLOAD, 1)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"\x1e" + b[1:], "bad magic"),
        (lambda b: b[:2] + b"\x07" + b[3:], "unsupported method"),
        (lambda b: b[:3] + bytes([b[3] | 0x20]) + b[4:], "reserved FLG"),
        (lambda b: b[:9], "truncated header"),
        (lambda b: b[:-9], "truncated"),
        (
            lambda b: b[:-8] + struct.pack("<I", 0xDEAD) + b[-4:],
            "CRC32 mismatch",
        ),
        (lambda b: b[:-4] + struct.pack("<I", 999), "ISIZE mismatch"),
    ],
    ids=["magic", "method", "flg", "hdr-cut", "body-cut", "crc", "isize"],
)
def test_corruption_raises_valueerror(mutate, msg):
    buf = gzip_member(PAYLOAD)
    with pytest.raises(ValueError, match=msg.split()[0]):
        gunzip_members(mutate(buf))


def test_header_crc_detects_flip():
    buf = gzip_member(PAYLOAD, name=b"shard", hcrc=True)
    # flip one byte inside the stored FNAME (covered by FHCRC)
    bad = buf[:11] + b"X" + buf[12:]
    with pytest.raises(ValueError, match="header CRC"):
        gunzip_members(bad)


def test_fname_nul_missing_is_truncation():
    buf = gzip_member(PAYLOAD, name=b"shard")
    cut = buf[:12]  # inside the name, before its NUL
    with pytest.raises(ValueError, match="truncated header field"):
        gunzip_members(cut)


def test_jsonl_gz_ingest_corpus_parity(spark):
    """In-repo hash gate for the ingest tier: the real shard ->
    decode -> from_json path recovers every source field corpus-wide
    (rotation-tier twin lives in tests/test_rotation.py)."""
    from gemmsql.pipeline.jsonlgz import JSONL_GZ_INGEST_SQL, jsonl_gz_ingest
    from tests.test_rotation import _hash

    sdf = jsonl_gz_ingest(spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    odf = con.execute(JSONL_GZ_INGEST_SQL).df()
    con.close()
    assert len(sdf) == len(odf) > 0
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert _hash(sdf) == _hash(odf)


def test_jsonl_roundtrip_survives_hostile_text(spark):
    """JSON escaping is load-bearing: quotes, backslashes, newlines,
    tabs, and non-ASCII all round-trip bit-exactly through the shard."""
    from gemmsql.pipeline.jsonlgz import jsonl_gz_lines, jsonl_gz_shards

    hostile = 'he said "x\\y"\nnew\tline é中'
    df = spark.createDataFrame(
        [(1, hostile, "xx", len(hostile))],
        "doc_id long, text string, lang string, n_chars long",
    )
    lines = jsonl_gz_lines(jsonl_gz_shards(df)).collect()
    import json

    texts = [
        json.loads(r.line)["text"]
        for r in lines
        if "text" in json.loads(r.line)
    ]
    assert texts == [hostile]
