"""Gzip-member JSONL shard ingestion — the wire format text corpora
actually arrive in (CommonCrawl WET/WARC, HuggingFace jsonl.gz dumps):
length-unknown concatenated gzip members, each a run of JSON lines.

From-scratch member framing on top of stdlib raw-deflate (the same
split the PNG tier uses — zlib inflates, WE own the container):
:func:`gunzip_members` parses RFC 1952 headers (magic, CM, every FLG
extension: FEXTRA / FNAME / FCOMMENT / FHCRC), inflates each member
with ``wbits=-15``, verifies the CRC32 + ISIZE trailer, and walks
multi-member streams via the deflate terminator — the property that
makes ``.gz`` shards appendable (``cat a.gz b.gz`` is valid) and
lets a reader resume at any member boundary.

Scale shape: ingestion is two Arrow-batched narrow maps (encode is
test-side synthesis; decode ships bytes -> JSON lines) followed by a
JVM-side ``from_json`` projection — gzip members are NOT splittable
inside (deflate back-references cross any cut), so the parallel unit
is the SHARD, exactly how production pipelines shard jsonl.gz at a
few hundred MB each; 100 TB = ~1M shards = ~1M tasks, embarrassingly
parallel, zero shuffle until the per-doc aggregate.

The gate (:func:`jsonl_gz_ingest`) round-trips the documents table
through real two-member shards (member 1 carries FNAME so header-skip
is load-bearing; CRC/ISIZE verification runs on every member) and
hash-compares recovered text/metadata against the source columns in
DuckDB — decode(encode(x)) == x corpus-wide, the codec-tier trick
(`jpeg.py:18-35`) applied to the ingest container.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table

_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def gzip_member(
    data: bytes,
    *,
    name: bytes | None = None,
    extra: bytes | None = None,
    comment: bytes | None = None,
    hcrc: bool = False,
    level: int = 6,
    mtime: int = 0,
) -> bytes:
    """One RFC 1952 member: header (+ optional FEXTRA/FNAME/FCOMMENT/
    FHCRC fields), raw-deflate body, CRC32 + ISIZE trailer."""
    flg = (
        (_FEXTRA if extra is not None else 0)
        | (_FNAME if name is not None else 0)
        | (_FCOMMENT if comment is not None else 0)
        | (_FHCRC if hcrc else 0)
    )
    head = [struct.pack("<BBBBIBB", 0x1F, 0x8B, 8, flg, mtime, 0, 255)]
    if extra is not None:
        head.append(struct.pack("<H", len(extra)) + extra)
    if name is not None:
        head.append(name + b"\x00")
    if comment is not None:
        head.append(comment + b"\x00")
    hdr = b"".join(head)
    if hcrc:
        hdr += struct.pack("<H", zlib.crc32(hdr) & 0xFFFF)
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    body = co.compress(data) + co.flush()
    trailer = struct.pack(
        "<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) & 0xFFFFFFFF
    )
    return hdr + body + trailer


def _skip_header(buf: bytes, pos: int) -> int:
    """Validate one member header at ``pos``; return the deflate-body
    offset.  Raises ValueError on any structural violation."""
    if len(buf) - pos < 10:
        raise ValueError("gzip: truncated header")
    if buf[pos] != 0x1F or buf[pos + 1] != 0x8B:
        raise ValueError("gzip: bad magic")
    if buf[pos + 2] != 8:
        raise ValueError(f"gzip: unsupported method {buf[pos + 2]}")
    flg = buf[pos + 3]
    if flg & 0xE0:
        raise ValueError("gzip: reserved FLG bits set")
    p = pos + 10
    try:
        if flg & _FEXTRA:
            xlen = buf[p] | (buf[p + 1] << 8)
            p += 2 + xlen
        if flg & _FNAME:
            p = buf.index(b"\x00", p) + 1
        if flg & _FCOMMENT:
            p = buf.index(b"\x00", p) + 1
    except (IndexError, ValueError) as e:
        raise ValueError("gzip: truncated header field") from e
    if flg & _FHCRC:
        if len(buf) - p < 2:
            raise ValueError("gzip: truncated FHCRC")
        want = buf[p] | (buf[p + 1] << 8)
        if zlib.crc32(buf[pos:p]) & 0xFFFF != want:
            raise ValueError("gzip: header CRC mismatch")
        p += 2
    if p > len(buf):
        raise ValueError("gzip: truncated header field")
    return p


def gunzip_members(buf: bytes) -> tuple[bytes, int]:
    """Concatenated payload + member count of a multi-member gzip
    stream, with CRC32 and ISIZE verified per member."""
    out: list[bytes] = []
    n = 0
    pos = 0
    total = len(buf)
    while pos < total:
        p = _skip_header(buf, pos)
        d = zlib.decompressobj(-15)
        try:
            data = d.decompress(buf[p:])
        except zlib.error as e:
            raise ValueError(f"gzip: corrupt deflate stream: {e}") from e
        if not d.eof:
            raise ValueError("gzip: truncated deflate stream")
        rest = d.unused_data
        if len(rest) < 8:
            raise ValueError("gzip: truncated trailer")
        crc, isize = struct.unpack("<II", rest[:8])
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError("gzip: CRC32 mismatch")
        if len(data) & 0xFFFFFFFF != isize:
            raise ValueError("gzip: ISIZE mismatch")
        out.append(data)
        n += 1
        pos = total - len(rest) + 8
    return b"".join(out), n


# ---- corpus-scale shard round-trip ------------------------------------

_LINE_SCHEMA = "doc_id long, text string, lang string, n_chars long"


def jsonl_gz_shards(docs: DataFrame) -> DataFrame:
    """``(doc_id, text, lang, n_chars)`` -> ``(doc_id, shard)``: a
    real two-member ``.gz`` shard per doc — member 1 (with FNAME, so
    header-field skipping is load-bearing) carries the text line,
    member 2 (bare header) the metadata line.  Arrow-batched narrow
    map; JSON escaping via ``json.dumps`` so ANY text round-trips."""

    def enc(batches):
        import json

        import pandas as pd

        for pdf in batches:
            shards = []
            for did, text, lang, nch in zip(
                pdf["doc_id"], pdf["text"], pdf["lang"], pdf["n_chars"]
            ):
                m1 = (
                    json.dumps(
                        {"doc_id": int(did), "text": text},
                        separators=(",", ":"),
                    ).encode()
                    + b"\n"
                )
                m2 = (
                    json.dumps(
                        {
                            "doc_id": int(did),
                            "lang": lang,
                            "n_chars": int(nch),
                        },
                        separators=(",", ":"),
                    ).encode()
                    + b"\n"
                )
                shards.append(
                    gzip_member(m1, name=b"doc%d.jsonl" % int(did))
                    + gzip_member(m2)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "shard": shards})

    return docs.mapInPandas(enc, "doc_id long, shard binary")


def jsonl_gz_lines(shards: DataFrame) -> DataFrame:
    """``(doc_id, shard)`` -> ``(doc_id, n_members, line)`` — the REAL
    ingest path: member walk + inflate + CRC/ISIZE verify, then line
    split.  Arrow-batched narrow map, one output row per JSON line."""

    def dec(batches):
        import pandas as pd

        for pdf in batches:
            ids, nm, lines = [], [], []
            for did, shard in zip(pdf["doc_id"], pdf["shard"]):
                data, n = gunzip_members(bytes(shard))
                for ln in data.decode("utf-8").splitlines():
                    ids.append(did)
                    nm.append(n)
                    lines.append(ln)
            yield pd.DataFrame(
                {"doc_id": ids, "n_members": nm, "line": lines}
            )

    return shards.mapInPandas(dec, "doc_id long, n_members long, line string")


def jsonl_gz_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip gate: documents -> two-member gzip JSONL shards ->
    the real decode path -> JVM ``from_json`` -> per-doc recovery.
    The oracle reads the same fields straight off the source table, so
    the hash pins decode(encode(x)) == x corpus-wide — framing, CRC,
    multi-member walk, JSON escaping and all."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    lines = jsonl_gz_lines(jsonl_gz_shards(docs))
    parsed = lines.select(
        "doc_id",
        "n_members",
        F.from_json("line", _LINE_SCHEMA).alias("j"),
    )
    return parsed.groupBy("doc_id").agg(
        F.max("n_members").alias("n_members"),
        F.count("*").alias("n_lines"),
        F.md5(F.first(F.col("j.text"), ignorenulls=True)).alias("text_md5"),
        F.first(F.col("j.lang"), ignorenulls=True).alias("lang"),
        F.max(F.col("j.n_chars")).alias("n_chars"),
        F.min(F.col("j.doc_id")).alias("doc_id_in"),
    )


JSONL_GZ_INGEST_SQL = """
SELECT doc_id, CAST(2 AS BIGINT) AS n_members, CAST(2 AS BIGINT) AS n_lines,
       md5(text) AS text_md5, lang, n_chars, doc_id AS doc_id_in
FROM documents
"""
