"""Hadoop SequenceFile walker from scratch — the SEVENTH shard
container, and the first landed entirely on the shared split spine
(`shardsplit.py`, the VERDICT r12 #8 factoring's proof case).

Built from the public Hadoop SequenceFile format specification only.
A version-6 uncompressed file is::

    "SEQ" 0x06
    | keyClassName | valueClassName          (Hadoop Text strings)
    | compression: bool | blockCompression: bool
    | metadata: int32 count + (Text, Text) pairs
    | 16-byte sync marker
    | records / sync escapes:
        int32 recordLen | int32 keyLen | key bytes | value bytes
        int32 -1 | 16-byte sync          (the periodic sync escape)

Two from-scratch encoding layers:

- **Hadoop VInt/VLong** (:func:`write_vint` / :func:`read_vint`):
  the WritableUtils variable-length integer — single byte for
  -112..127, else a length-tag byte (-113..-120 positive,
  -121..-128 negative, magnitude big-endian) — a third wire family
  next to Avro's zigzag varints and TFRecord's fixed little-endian.
  Vector- and property-tested.
- **Text** (:func:`_write_text`): VInt byte-length + UTF-8 bytes —
  used for the class names and for every key/value.

**Sync escapes are the split mechanism** (this is the container that
INVENTED the pattern Avro inherited): the writer drops
``-1 + sync`` before every ``SEQ_RECS_PER_SYNC`` records, a reader
landing anywhere scans to the next escape and is realigned.  The
split planner here does it with metadata only: one header walk
indexes the sync-delimited segments, :func:`cut_ranges` cuts
segment-aligned byte ranges, and every fragment must START with a
verified escape — a cut landing mid-record rejects loudly.

Gate (`seqfile_shard_ingest` / `seqfile_split_ingest`): documents
assemble into SequenceFile shards (key = the doc_id digits as Text,
value = the canonical key-sorted JSON record), staged once; both
paths recover every column from the container walk and must
hash-equal the shared documents-derived twin — the container tier's
standing discipline.

Scale shape: shard = task; the split path fans one shard into
~bytes/target segment-aligned ranges through the shared spine, so a
4 GiB shard at the 4 MiB default is ~1024 concurrent decode tasks.

(No analog in the reference — its surface is ML operators,
ref:gemm_map_reduce.py:1; this extends the brief's ingest tier.)
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table

SEQ_DOCS_PER_SHARD = 32
SEQ_RECS_PER_SYNC = 8

_MAGIC = b"SEQ\x06"
_KEY_CLASS = b"org.apache.hadoop.io.Text"
_VAL_CLASS = b"org.apache.hadoop.io.Text"
#: Hadoop's DefaultCodec — zlib-wrapped DEFLATE (RFC 1950, unlike
#: Avro's raw RFC 1951 blocks); the overwhelmingly common codec on
#: real record-/block-compressed SequenceFiles (VERDICT r13 next #5)
_CODEC_CLASS = b"org.apache.hadoop.io.compress.DefaultCodec"


def _inflate(blob: bytes) -> bytes:
    try:
        return zlib.decompress(blob)
    except zlib.error as e:  # corrupt stream -> the walker's loud lane
        raise ValueError(f"bad deflate stream: {e}") from None


# -------------------------------------------------- Hadoop VInt/VLong

def write_vint(i: int) -> bytes:
    """WritableUtils.writeVLong: single byte in -112..127, else a
    length-tag byte then the magnitude big-endian."""
    if -112 <= i <= 127:
        return bytes([i & 0xFF])
    length = -112
    v = i
    if v < 0:
        v = ~v
        length = -120
    tmp = v
    while tmp:
        tmp >>= 8
        length -= 1
    out = bytearray([length & 0xFF])
    n = -(length + 120) if length < -120 else -(length + 112)
    for idx in range(n, 0, -1):
        out.append((v >> ((idx - 1) * 8)) & 0xFF)
    return bytes(out)


def read_vint(data: bytes, pos: int) -> tuple[int, int]:
    if pos >= len(data):
        raise ValueError("truncated vint")
    first = data[pos]
    pos += 1
    signed = first - 256 if first > 127 else first
    if -112 <= signed <= 127:
        return signed, pos
    negative = signed < -120
    n = -(signed + 120) if negative else -(signed + 112)
    if pos + n > len(data):
        raise ValueError("truncated vint")
    v = 0
    for _ in range(n):
        v = (v << 8) | data[pos]
        pos += 1
    return (~v if negative else v), pos


def _write_text(s: bytes) -> bytes:
    return write_vint(len(s)) + s


def _read_text(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = read_vint(data, pos)
    if n < 0 or pos + n > len(data):
        raise ValueError("bad text length")
    return data[pos:pos + n], pos + n


def _sync_marker(shard_id: int) -> bytes:
    return hashlib.md5(f"seq-sync:{shard_id}".encode()).digest()


def _doc_value(doc_id: int, lang: str, source: str, text: str) -> bytes:
    return json.dumps(
        {"doc_id": doc_id, "lang": lang, "source": source, "text": text},
        separators=(",", ":"), sort_keys=True,
    ).encode()


# ----------------------------------------------------- build / parse

def build_seqfile(
    shard_id: int,
    rows: list[tuple[int, str, str, str]],
    *,
    recs_per_sync: int = SEQ_RECS_PER_SYNC,
    compression: str = "none",
) -> bytes:
    """One version-6 SequenceFile: Text keys (the doc_id digits),
    Text values (canonical JSON), a sync escape before every
    ``recs_per_sync`` records (or every record BLOCK) so the body is
    exactly sync-delimited segments.

    ``compression``:

    - ``"none"`` — plain records.
    - ``"record"`` — per-record value compression (keys stay plain,
      the value's Text serialization deflates individually; the
      DefaultCodec wire).
    - ``"block"`` — Hadoop's block format: each sync-delimited block
      is a record COUNT plus four length-prefixed deflate streams
      (key lengths, keys, value lengths, values)."""
    sync = _sync_marker(shard_id)
    out = bytearray(_MAGIC)
    out += _write_text(_KEY_CLASS) + _write_text(_VAL_CLASS)
    if compression == "none":
        out += b"\x00\x00"
    elif compression == "record":
        out += b"\x01\x00" + _write_text(_CODEC_CLASS)
    elif compression == "block":
        out += b"\x01\x01" + _write_text(_CODEC_CLASS)
    else:
        raise ValueError(f"unknown compression: {compression!r}")
    out += struct.pack(">i", 0)              # empty metadata
    out += sync
    esc = struct.pack(">i", -1) + sync
    if compression == "block":
        for b0 in range(0, len(rows), recs_per_sync):
            block = rows[b0:b0 + recs_per_sync]
            keys = [_write_text(str(d).encode()) for d, _, _, _ in block]
            vals = [
                _write_text(_doc_value(d, lg, src, tx))
                for d, lg, src, tx in block
            ]
            out += esc + write_vint(len(block))
            for part in (
                b"".join(write_vint(len(k)) for k in keys),
                b"".join(keys),
                b"".join(write_vint(len(v)) for v in vals),
                b"".join(vals),
            ):
                z = zlib.compress(part)
                out += write_vint(len(z)) + z
        return bytes(out)
    for i, (doc_id, lang, source, text) in enumerate(rows):
        if i % recs_per_sync == 0:
            out += esc
        key = _write_text(str(doc_id).encode())
        val = _write_text(_doc_value(doc_id, lang, source, text))
        if compression == "record":
            val = zlib.compress(val)
        out += struct.pack(">ii", len(key) + len(val), len(key))
        out += key + val
    return bytes(out)


def _header_end(data: bytes) -> tuple[bytes, int, str]:
    """Walk the header; return (sync, body_start, mode) with mode in
    none/record/block.  A compressed file must name the DefaultCodec
    — any other codec class rejects loudly at the header, the same
    contract the Avro reader enforces."""
    if data[:4] != _MAGIC:
        raise ValueError("not a version-6 SequenceFile")
    pos = 4
    kcls, pos = _read_text(data, pos)
    vcls, pos = _read_text(data, pos)
    if kcls != _KEY_CLASS or vcls != _VAL_CLASS:
        raise ValueError("key/value class mismatch: not a Text,Text file")
    if pos + 2 > len(data):
        raise ValueError("truncated compression flags")
    compressed, blocked = data[pos], data[pos + 1]
    pos += 2
    if compressed not in (0, 1) or blocked not in (0, 1):
        raise ValueError("bad compression flags")
    if blocked and not compressed:
        raise ValueError("blockCompression without compression")
    mode = "block" if blocked else ("record" if compressed else "none")
    if compressed:
        codec, pos = _read_text(data, pos)
        if codec != _CODEC_CLASS:
            raise ValueError(
                f"unsupported codec: {codec!r} (DefaultCodec only)"
            )
    if pos + 4 > len(data):
        raise ValueError("truncated metadata count")
    (n_meta,) = struct.unpack(">i", data[pos:pos + 4])
    pos += 4
    if n_meta < 0:
        raise ValueError("bad metadata count")
    for _ in range(n_meta):
        _, pos = _read_text(data, pos)
        _, pos = _read_text(data, pos)
    if pos + 16 > len(data):
        raise ValueError("truncated header sync marker")
    return data[pos:pos + 16], pos + 16, mode


def _pair_row(key: bytes, val: bytes) -> tuple[int, str, str, str]:
    meta = json.loads(val)
    if str(meta["doc_id"]).encode() != key:
        raise ValueError("key/value doc_id mismatch")
    return (meta["doc_id"], meta["lang"], meta["source"], meta["text"])


def _walk_records(
    chunk: bytes, sync: bytes, *, require_leading_sync: bool,
    mode: str = "none",
) -> list[tuple[int, str, str, str]]:
    """The strict record walk shared by whole-file and fragment
    paths: every escape's sync must match, record/key lengths must
    agree with the decoded Texts, and a fragment must OPEN with an
    escape (a mid-record cut cannot).  ``mode="record"`` inflates
    each value's deflate stream before the Text parse;
    ``mode="block"`` dispatches to the block walk."""
    if mode == "block":
        return _walk_blocks(
            chunk, sync, require_leading_sync=require_leading_sync
        )
    rows: list[tuple[int, str, str, str]] = []
    pos = 0
    first = True
    while pos < len(chunk):
        if pos + 4 > len(chunk):
            raise ValueError("truncated record length")
        (rec_len,) = struct.unpack(">i", chunk[pos:pos + 4])
        if rec_len == -1:
            if chunk[pos + 4:pos + 20] != sync:
                raise ValueError(f"sync marker mismatch at offset {pos}")
            pos += 20
            first = False
            continue
        if first and require_leading_sync:
            raise ValueError("fragment does not start at a sync escape")
        first = False
        if rec_len < 0 or pos + 8 + rec_len > len(chunk):
            raise ValueError("bad record length")
        (key_len,) = struct.unpack(">i", chunk[pos + 4:pos + 8])
        if key_len < 0 or key_len > rec_len:
            raise ValueError("bad key length")
        body = chunk[pos + 8:pos + 8 + rec_len]
        key, kpos = _read_text(body, 0)
        if kpos != key_len:
            raise ValueError("key length disagrees with its Text")
        if mode == "record":
            vbytes = _inflate(body[kpos:])
            val, vpos = _read_text(vbytes, 0)
            if vpos != len(vbytes):
                raise ValueError("inflated value disagrees with its Text")
        else:
            val, vpos = _read_text(body, kpos)
            if vpos != rec_len:
                raise ValueError("record length disagrees with its Texts")
        rows.append(_pair_row(key, val))
        pos += 8 + rec_len
    return rows


def _texts_from_block(
    lens_blob: bytes, data_blob: bytes, n: int, what: str
) -> list[bytes]:
    """Split an inflated data block by its inflated VInt lengths
    block; every byte of both must be accounted for."""
    lens = []
    pos = 0
    for _ in range(n):
        ln, pos = read_vint(lens_blob, pos)
        if ln < 0:
            raise ValueError(f"negative {what} length")
        lens.append(ln)
    if pos != len(lens_blob):
        raise ValueError(f"{what} lengths block has trailing bytes")
    if sum(lens) != len(data_blob):
        raise ValueError(f"{what} block size disagrees with its lengths")
    out, pos = [], 0
    for ln in lens:
        serialized = data_blob[pos:pos + ln]
        text, tpos = _read_text(serialized, 0)
        if tpos != ln:
            raise ValueError(f"{what} serialization disagrees with Text")
        out.append(text)
        pos += ln
    return out


def _walk_blocks(
    chunk: bytes, sync: bytes, *, require_leading_sync: bool
) -> list[tuple[int, str, str, str]]:
    """The block-compressed walk: every block opens with a sync
    escape, then a record count and FOUR length-prefixed deflate
    streams (key lengths, keys, value lengths, values)."""
    # every block opens with an escape, so the fragment contract
    # (require_leading_sync) is enforced by the loop's first pass in
    # both whole-file and fragment walks
    del require_leading_sync
    rows: list[tuple[int, str, str, str]] = []
    pos = 0
    while pos < len(chunk):
        if pos + 20 > len(chunk):
            raise ValueError("truncated block escape")
        (tag,) = struct.unpack(">i", chunk[pos:pos + 4])
        if tag != -1 or chunk[pos + 4:pos + 20] != sync:
            raise ValueError(f"sync marker mismatch at offset {pos}")
        pos += 20
        n, pos = read_vint(chunk, pos)
        if n <= 0:
            raise ValueError("bad block record count")
        parts = []
        for _ in range(4):
            size, pos = read_vint(chunk, pos)
            if size < 0 or pos + size > len(chunk):
                raise ValueError("bad block stream size")
            parts.append(_inflate(chunk[pos:pos + size]))
            pos += size
        keys = _texts_from_block(parts[0], parts[1], n, "key")
        vals = _texts_from_block(parts[2], parts[3], n, "value")
        rows.extend(_pair_row(k, v) for k, v in zip(keys, vals))
    return rows


def parse_seqfile(data: bytes) -> list[tuple[int, str, str, str]]:
    """Strict whole-file walk: header (magic, Text classes, codec
    enforcement, metadata), then records — plain, record-deflate, or
    block-deflate per the header flags — with every sync escape
    verified."""
    sync, body, mode = _header_end(data)
    return _walk_records(
        data[body:], sync, require_leading_sync=False, mode=mode
    )


def seqfile_segment_index(
    shard: bytes,
) -> tuple[int, bytes, str, list[int]]:
    """(body_start, sync, mode, segment_lengths): one metadata walk —
    each segment runs from one sync escape to the next, so segments
    are the legal cut units in EVERY mode (a fragment must open with
    an escape; block mode's blocks are exactly the segments)."""
    sync, body, mode = _header_end(shard)
    if body == len(shard):
        # an empty (header-only) file has no segments — the
        # whole-file parser accepts it, so the split planner must too
        return body, sync, mode, []
    esc = struct.pack(">i", -1) + sync
    pos = body
    if shard[pos:pos + 20] != esc:
        raise ValueError("body does not start at a sync escape")
    starts = [pos]
    pos += 20
    if mode == "block":
        while pos < len(shard):
            if shard[pos:pos + 20] == esc:
                starts.append(pos)
                pos += 20
                continue
            n, pos = read_vint(shard, pos)
            if n <= 0:
                raise ValueError("bad block record count")
            for _ in range(4):
                size, pos = read_vint(shard, pos)
                if size < 0 or pos + size > len(shard):
                    raise ValueError("bad block stream size")
                pos += size
    else:
        while pos < len(shard):
            if pos + 4 > len(shard):
                raise ValueError("truncated record length")
            (rec_len,) = struct.unpack(">i", shard[pos:pos + 4])
            if rec_len == -1:
                if shard[pos + 4:pos + 20] != sync:
                    raise ValueError(
                        f"sync marker mismatch at offset {pos}"
                    )
                starts.append(pos)
                pos += 20
                continue
            if rec_len < 0 or pos + 8 + rec_len > len(shard):
                raise ValueError("bad record length")
            pos += 8 + rec_len
    bounds = starts + [len(shard)]
    return body, sync, mode, [b - a for a, b in zip(bounds, bounds[1:])]


# ----------------------------------------------------------- the gate

def with_seqfile_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard_id, shard): one SequenceFile per shard, one record per
    doc, doc_id-sorted, frequent sync escapes so the segment walk
    genuinely loops.  MIXED-CODEC corpus (the Avro gate's discipline,
    VERDICT r13 next #5): shard_id % 3 picks none / record-deflate /
    block-deflate, so all three decode paths carry gate weight every
    round under the same documents-derived hash."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source",
        (F.col("doc_id") / SEQ_DOCS_PER_SHARD).cast("long")
        .alias("shard_id"),
    )

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        rows = [
            (int(r.doc_id), r.lang, r.source, r.text)
            for r in pdf.itertuples(index=False)
        ]
        sid = int(key[0])
        comp = ("none", "record", "block")[sid % 3]
        return pd.DataFrame({
            "shard_id": [sid],
            "shard": [build_seqfile(sid, rows, compression=comp)],
        })

    return docs.groupBy("shard_id").applyInPandas(
        assemble, schema="shard_id long, shard binary"
    )


def _staged_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gemmsql.pipeline.staging import stage_payload_table

    def builder(spark_, sf_dir_):
        return with_seqfile_shards(spark_, sf_dir_).select(
            F.col("shard_id").alias("doc_id"),
            F.col("shard").alias("payload"),
        )

    return stage_payload_table(spark, sf_dir, "seqfile", builder)


def seqfile_shard_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-shard ingest -> the shared gate row, recovered entirely
    from the container walk (header classes, VInt Texts, record/key
    length accounting, every sync escape).  Twin derives the same
    columns from ``documents`` directly."""
    from gemmsql.pipeline.shardsplit import DOC_OUT_SCHEMA, doc_rows_frame

    shards = _staged_shards(spark, sf_dir)

    def ingest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield doc_rows_frame(
                rec for shard in pdf["payload"]
                for rec in parse_seqfile(bytes(shard))
            )

    # NO decode spread (r18 negative result): after the vectorized
    # CRC the whole-shard decode is ~0.1-0.3 s total — a payload
    # shuffle to fan it measured strictly slower on all four ingests
    return shards.mapInPandas(ingest, schema=DOC_OUT_SCHEMA)


def seqfile_split_ingest(
    spark: SparkSession,
    sf_dir: str,
    *,
    target_split_bytes: int = 4096,
) -> DataFrame:
    """The splittable path, entirely on the shared spine: the segment
    index cuts sync-aligned byte ranges, each fragment re-verifies
    its leading escape and every interior one, and the result must
    hash-equal the whole-shard ingest."""
    from gemmsql.pipeline.shardsplit import cut_ranges, split_ingest_frame

    shards = _staged_shards(spark, sf_dir)

    def plan_row(row, payload):
        body, sync, mode, seg_lens = seqfile_segment_index(payload)
        ranges = cut_ranges(seg_lens, target_split_bytes, base=body)
        return ranges, {"sync": sync, "mode": mode}

    def decode_chunk(chunk, row):
        return _walk_records(
            chunk, bytes(row["sync"]), require_leading_sync=True,
            mode=row["mode"],
        )

    return split_ingest_frame(
        shards, plan_row, decode_chunk,
        extra_cols=(("sync", "binary"), ("mode", "string")),
    )


SEQFILE_SHARD_INGEST_SQL = """
SELECT doc_id, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5
FROM documents
"""
