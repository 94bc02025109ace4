"""WARC web-archive ingestion — the wire format web-crawl pretraining
corpora actually arrive in (Common Crawl ``.warc.gz``): ISO 28500
records, each individually gzip-membered so the archive is seekable
at record granularity via an external (CDX-style) index of
``(offset, length)`` spans.

From-scratch record framing on top of the repo's own RFC 1952 layer
(`jsonlgz.py:43` writes members, `:79` validates headers):
:func:`warc_record` emits the version line, named headers, and the
``Content-Length``-framed block with its closing CRLF CRLF;
:func:`parse_warc_record` re-parses one record strictly (version
line, header walk, exact Content-Length body, terminator).  Response
records carry a full ``application/http`` block — status line, HTTP
headers, body — parsed by :func:`parse_http_response`, so the gate
exercises all three framing layers (gzip member / WARC record / HTTP
message) exactly as a Common Crawl reader does.

Scale shape: the per-record gzip member IS the random-access unit —
:func:`warc_member_spans` recovers the ``(offset, length)`` spans a
CDX index would publish, and the unit tests pin that decoding each
span independently equals decoding the whole shard (the
`media_split.py` range-union discipline).  At 100 TB the shard is
the task unit (~1 GB each in Common Crawl, ~100k tasks) and a hot
single shard can be further split at any member boundary; ingest is
one groupBy to assemble (test-side synthesis) and one Arrow-batched
narrow decode map, zero shuffle until the per-doc aggregate.

The gate (:func:`warc_ingest`) round-trips the documents table
through real multi-record shards (one ``warcinfo`` + one ``response``
record per doc, WARC-Date seconds and the urn:uuid record id both
derived from doc_id so date parsing and id re-derivation are
hash-load-bearing) and compares the recovered columns against
DuckDB reading the source table directly — decode(encode(x)) == x
corpus-wide, the `tarshard.py:18-23` contract on the web-archive
container.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table
from gemmsql.pipeline.jsonlgz import _skip_header, gzip_member, gunzip_members

_CRLF = b"\r\n"
#: docs per shard in the gate corpus — matches the tar tier
#: (`tarshard.py:54`) so sf0.001 still makes multi-record shards.
WARC_DOCS_PER_SHARD = 16
_WARC_DATE_BASE = "2026-01-01"
_SOFTWARE = b"software: gemmsql/0.9\r\nformat: WARC File Format 1.0\r\n"


def _record_uuid(doc_id: int) -> str:
    """Deterministic urn:uuid for a response record — md5 of a fixed
    tag + doc_id, formatted 8-4-4-4-12.  Re-derived (and enforced) on
    the decode side, so a corrupted id fails ingest, not the hash."""
    h = hashlib.md5(b"gemmsql-warc-%d" % doc_id).hexdigest()
    return f"urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def _warc_date(doc_id: int) -> str:
    """W3C-DTF timestamp: fixed date, time-of-day = doc_id mod 86400
    seconds — so the decode side's date PARSE carries real signal."""
    s = doc_id % 86400
    return f"{_WARC_DATE_BASE}T{s // 3600:02d}:{s % 3600 // 60:02d}:{s % 60:02d}Z"


def warc_record(
    rtype: str, headers: list[tuple[str, str]], block: bytes
) -> bytes:
    """One WARC/1.0 record: version line, ``WARC-Type`` + caller
    headers + ``Content-Length``, blank line, block, closing CRLF
    CRLF (ISO 28500 §4: two CRLFs terminate every record)."""
    lines = [b"WARC/1.0", b"WARC-Type: " + rtype.encode()]
    lines += [f"{k}: {v}".encode() for k, v in headers]
    lines.append(b"Content-Length: %d" % len(block))
    return _CRLF.join(lines) + _CRLF * 2 + block + _CRLF * 2


def parse_warc_record(data: bytes) -> tuple[dict[str, str], bytes]:
    """Strictly parse ONE record -> (headers, block).  Raises
    ValueError on a bad version line, malformed header, missing or
    wrong Content-Length, or a missing record terminator."""
    head_end = data.find(_CRLF * 2)
    if head_end < 0:
        raise ValueError("warc: no header terminator")
    lines = data[:head_end].split(_CRLF)
    if lines[0] not in (b"WARC/1.0", b"WARC/1.1"):
        raise ValueError(f"warc: bad version line {lines[0]!r}")
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, sep, v = ln.partition(b": ")
        if not sep or not k:
            raise ValueError(f"warc: malformed header {ln!r}")
        if k.decode() in headers:
            raise ValueError(f"warc: duplicate header {k!r}")
        headers[k.decode()] = v.decode()
    if "Content-Length" not in headers:
        raise ValueError("warc: missing Content-Length")
    n = int(headers["Content-Length"])
    body_start = head_end + 4
    block = data[body_start : body_start + n]
    if len(block) != n:
        raise ValueError("warc: truncated block")
    if data[body_start + n : body_start + n + 4] != _CRLF * 2:
        raise ValueError("warc: missing record terminator")
    if data[body_start + n + 4 :]:
        raise ValueError("warc: trailing bytes after record")
    return headers, block


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """``application/http; msgtype=response`` block -> (status,
    headers, body), enforcing the HTTP Content-Length against the
    actual body length."""
    head_end = block.find(_CRLF * 2)
    if head_end < 0:
        raise ValueError("http: no header terminator")
    lines = block[:head_end].split(_CRLF)
    parts = lines[0].split(b" ", 2)
    if len(parts) < 3 or parts[0] != b"HTTP/1.1":
        raise ValueError(f"http: bad status line {lines[0]!r}")
    status = int(parts[1])
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, sep, v = ln.partition(b": ")
        if not sep:
            raise ValueError(f"http: malformed header {ln!r}")
        headers[k.decode()] = v.decode()
    body = block[head_end + 4 :]
    if int(headers.get("Content-Length", "-1")) != len(body):
        raise ValueError("http: Content-Length mismatch")
    return status, headers, body


def warc_member_spans(buf: bytes) -> list[tuple[int, int]]:
    """The CDX-index view of a ``.warc.gz`` shard: ``(offset,
    length)`` of every gzip member.  Each span decompresses to
    exactly one WARC record, so any span can be fetched and decoded
    independently — the Common Crawl random-access contract."""
    spans: list[tuple[int, int]] = []
    pos = 0
    total = len(buf)
    while pos < total:
        p = _skip_header(buf, pos)
        d = zlib.decompressobj(-15)
        try:
            d.decompress(buf[p:])
        except zlib.error as e:
            raise ValueError(f"warc.gz: corrupt deflate stream: {e}") from e
        if not d.eof:
            raise ValueError("warc.gz: truncated member")
        end = total - len(d.unused_data) + 8
        if end > total:
            raise ValueError("warc.gz: truncated trailer")
        spans.append((pos, end - pos))
        pos = end
    return spans


def _http_block(text: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/plain; charset=utf-8\r\n"
        b"Content-Length: %d\r\n\r\n" % len(text)
    ) + text


def build_warc_shard(rows: list[tuple[int, str, str]]) -> bytes:
    """``[(doc_id, text, source), ...]`` -> one ``.warc.gz`` shard:
    a ``warcinfo`` member then one ``response`` member per doc, each
    record its own gzip member (Common Crawl framing)."""
    info = warc_record(
        "warcinfo",
        [("Content-Type", "application/warc-fields")],
        _SOFTWARE,
    )
    members = [gzip_member(info)]
    for doc_id, text, source in rows:
        rec = warc_record(
            "response",
            [
                ("WARC-Record-ID", f"<{_record_uuid(doc_id)}>"),
                ("WARC-Date", _warc_date(doc_id)),
                ("WARC-Target-URI", f"http://example.com/{source}/{doc_id}"),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            _http_block(text.encode()),
        )
        members.append(gzip_member(rec))
    return b"".join(members)


def with_warc_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble the documents table into ``.warc.gz`` shards ->
    ``(shard_id, shard)``: docs grouped by ``doc_id div
    WARC_DOCS_PER_SHARD``, records in doc_id order after the
    shard-leading warcinfo."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source",
        (F.col("doc_id") / WARC_DOCS_PER_SHARD).cast("long")
        .alias("shard_id"),
    )

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard = build_warc_shard(
            [
                (int(r.doc_id), r.text, r.source)
                for r in pdf.itertuples(index=False)
            ]
        )
        return pd.DataFrame({"shard_id": [key[0]], "shard": [shard]})

    return docs.groupBy("shard_id").applyInPandas(
        assemble, schema="shard_id long, shard binary"
    )


def _decode_shard(shard: bytes) -> list[tuple[int, str, int, int, int, str, int]]:
    """One shard -> per-response rows, re-deriving and ENFORCING the
    record id, URI doc_id, and HTTP framing along the way."""
    spans = warc_member_spans(shard)
    records = []
    for off, ln in spans:
        data, n = gunzip_members(shard[off : off + ln])
        if n != 1:
            raise ValueError("warc.gz: span is not a single member")
        records.append(parse_warc_record(data))
    if not records or records[0][0].get("WARC-Type") != "warcinfo":
        raise ValueError("warc: shard must lead with warcinfo")
    out = []
    for headers, block in records[1:]:
        if headers.get("WARC-Type") != "response":
            raise ValueError(f"warc: unexpected type {headers.get('WARC-Type')!r}")
        uri = headers["WARC-Target-URI"]
        _, _, tail = uri.partition("://")
        parts = tail.split("/")
        doc_id, source = int(parts[-1]), parts[-2]
        if headers["WARC-Record-ID"] != f"<{_record_uuid(doc_id)}>":
            raise ValueError("warc: record id does not re-derive")
        date = headers["WARC-Date"]
        if date[:11] != _WARC_DATE_BASE + "T" or date[-1] != "Z":
            raise ValueError(f"warc: bad date {date!r}")
        hh, mm, ss = date[11:19].split(":")
        secs = int(hh) * 3600 + int(mm) * 60 + int(ss)
        status, _http_headers, body = parse_http_response(block)
        text = body.decode("utf-8")
        out.append((
            doc_id, source, secs, status, len(text),
            hashlib.md5(body).hexdigest(), len(records),
        ))
    return out


def warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest the shard corpus back -> per-doc ``(doc_id, source,
    warc_secs, http_status, n_chars, text_md5, shard_records)``
    recovered ENTIRELY from the ``.warc.gz`` bytes (member split,
    per-member inflate + CRC, WARC parse, id/date re-derivation, HTTP
    parse).  The DuckDB twin derives the same columns from
    ``documents`` directly — ``shard_records`` (responses in the
    doc's shard + the warcinfo) pins the multi-member walk, the
    parsed-date seconds pin W3C-DTF round-tripping."""
    from gemmsql.pipeline.staging import stage_payload_table

    def builder(spark_, sf_dir_):
        return with_warc_shards(spark_, sf_dir_).select(
            F.col("shard_id").alias("doc_id"),
            F.col("shard").alias("payload"),
        )

    shards = stage_payload_table(spark, sf_dir, "warcshard", builder)

    def ingest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows: list[tuple] = []
            for shard in pdf["payload"]:
                rows.extend(_decode_shard(bytes(shard)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "source", "warc_secs", "http_status",
                    "n_chars", "text_md5", "shard_records",
                ],
            )

    return shards.mapInPandas(
        ingest,
        schema=(
            "doc_id long, source string, warc_secs long,"
            " http_status long, n_chars long, text_md5 string,"
            " shard_records long"
        ),
    )


#: ASCII-only corpus assumption (`tarshard.py:224`): length(text) ==
#: byte length and DuckDB's md5() hashes the same bytes Python hashed.
WARC_INGEST_SQL = f"""
SELECT doc_id, source,
       CAST(doc_id % 86400 AS BIGINT) AS warc_secs,
       CAST(200 AS BIGINT) AS http_status,
       CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5,
       CAST(COUNT(*) OVER (PARTITION BY doc_id // {WARC_DOCS_PER_SHARD}) + 1
            AS BIGINT) AS shard_records
FROM documents
"""
