"""Ogg container from scratch (RFC 3533) — the streaming-media page
framing: capture-pattern pages, lacing-value packet segmentation,
cross-page packet continuation, and Ogg's own CRC-32 variant.

Built from the public RFC 3533 only.  A physical stream is a
sequence of pages::

    "OggS" | version=0 | header_type | granule(8 LE) | serial(4 LE)
    | page_seq(4 LE) | crc(4 LE) | n_segs(1) | lacing[n_segs] | body

- **Lacing**: each packet is written as ⌈len/255⌉ lacing values —
  all 255 except a final remainder (a packet of exactly k*255 bytes
  ends with a 0 lacing value).  A page whose LAST lacing value is
  255 leaves its packet open; the next page must set the CONTINUED
  flag (0x01) and its first lacing values extend that packet.
- **Flags**: 0x02 BOS on the first page of a logical stream, 0x04
  EOS on the last, 0x01 continued as above — all three placements
  are validated strictly here.
- **Granule**: codec-specific by design; this writer records the
  count of packets COMPLETED through the end of each page, and -1
  (all ones) on pages that end mid-packet, exactly as the RFC
  prescribes for "no packet finishes on this page".
- **CRC**: Ogg's own CRC-32 — polynomial 0x04C11DB7 in the FORWARD
  (non-reflected) form with zero init and zero final xor, computed
  over the whole page with the CRC field zeroed.  This is NOT
  zlib's reflected CRC-32 — sharing a polynomial but not a bit
  order, which is why it must be table-built from scratch
  (:data:`_CRC_TABLE`) and is pinned against hand-computed vectors
  in tests.

Gate (`ogg_shard_ingest`): documents assemble into one logical Ogg
stream per shard (one canonical-JSON packet per doc, pages capped at
a small segment budget so multi-segment lacing AND cross-page
continuation are exercised on nearly every shard), staged once;
ingest recovers every column from the page walk; the DuckDB twin
derives them from ``documents`` directly — the container tier's
standing discipline.

Scale shape: shard = row = task, like every container gate; the
capture pattern ("OggS" + CRC re-sync) is what makes Ogg seekable
mid-stream at scale, and the strict parser rejects rather than
resyncs so corruption is visible in the gate.

(No analog in the reference — its surface is ML operators,
ref:gemm_map_reduce.py:1; this extends the brief's ingest tier.)
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table

OGG_DOCS_PER_SHARD = 32
_MAGIC = b"OggS"

_F_CONTINUED = 0x01
_F_BOS = 0x02
_F_EOS = 0x04

# forward (non-reflected) CRC-32 table, poly 0x04C11DB7
_CRC_TABLE = []
for _i in range(256):
    _c = _i << 24
    for _ in range(8):
        _c = ((_c << 1) ^ 0x04C11DB7) if _c & 0x80000000 else (_c << 1)
        _c &= 0xFFFFFFFF
    _CRC_TABLE.append(_c)


def _ogg_crc_scalar(data: bytes) -> int:
    """Byte-at-a-time reference; fastest for short inputs and the
    differential-test oracle for the vectorized path."""
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((c >> 24) ^ b) & 0xFF]
    return c


_VEC = None  # lazy: NumPy position tables built on first long page


def ogg_crc(data: bytes) -> int:
    """Ogg's CRC-32: forward bit order, zero init, zero final xor.
    Page-sized inputs run vectorized over NumPy position tables
    (gemmsql.crcvec); short inputs keep the scalar loop."""
    from gemmsql.crcvec import MIN_VEC_LEN

    if len(data) < MIN_VEC_LEN:
        return _ogg_crc_scalar(data)
    global _VEC
    if _VEC is None:
        from gemmsql.crcvec import VecCRC

        _VEC = VecCRC(_CRC_TABLE, reflected=False, init=0, xor_out=0)
    return _VEC.crc(data)


def _lacing(n: int) -> list[int]:
    """Lacing values for one packet of ``n`` bytes (a multiple of
    255 ends with an explicit 0)."""
    vals = [255] * (n // 255)
    vals.append(n % 255)
    return vals


def build_ogg(
    serial: int, packets: list[bytes], *, max_segs: int = 8
) -> bytes:
    """One logical stream: pack ``packets`` into pages of at most
    ``max_segs`` lacing values (small budgets force cross-page
    packet continuation), BOS on the first page, EOS on the last,
    granule = packets completed (or -1 mid-packet), correct CRC."""
    # flatten to (lacing value, data slice) pairs tagged with the
    # packet index they complete (None while the packet continues)
    segs: list[tuple[int, bytes, int | None]] = []
    for pi, p in enumerate(packets):
        vals = _lacing(len(p))
        off = 0
        for j, v in enumerate(vals):
            done = pi if j == len(vals) - 1 else None
            segs.append((v, p[off:off + v], done))
            off += v
    pages: list[bytes] = []
    pos = 0
    seq = 0
    continued = False
    while pos < len(segs) or seq == 0:
        chunk = segs[pos:pos + max_segs]
        pos += len(chunk)
        flags = 0
        if continued:
            flags |= _F_CONTINUED
        if seq == 0:
            flags |= _F_BOS
        if pos >= len(segs):
            flags |= _F_EOS
        completed = [d for _, _, d in chunk if d is not None]
        if completed:
            granule = completed[-1] + 1
        elif seq == 0 and not chunk:
            granule = 0
        else:
            granule = -1
        body = b"".join(s for _, s, _ in chunk)
        lacing = bytes(v for v, _, _ in chunk)
        header = (
            _MAGIC + b"\x00" + bytes([flags])
            + struct.pack("<q", granule)
            + struct.pack("<I", serial)
            + struct.pack("<I", seq)
            + b"\x00\x00\x00\x00"
            + bytes([len(chunk)])
            + lacing
        )
        page = bytearray(header + body)
        crc = ogg_crc(bytes(page))
        page[22:26] = struct.pack("<I", crc)
        pages.append(bytes(page))
        # does the page end mid-packet?  (last lacing value == 255)
        continued = bool(chunk) and chunk[-1][0] == 255
        seq += 1
        if pos >= len(segs):
            break
    return b"".join(pages)


def parse_ogg(data: bytes, *, fragment: bool = False) -> tuple[int, list[bytes]]:
    """Strict single-stream walk -> (serial, packets).  Validates
    magic, version, CRC, page sequence, BOS/EOS/continued placement,
    and that the final packet is complete.

    ``fragment=True`` is the SPLIT-READER mode: the bytes are a
    page-aligned slice of a stream (cut only before pages that start
    a fresh packet), so BOS/EOS may be absent, the sequence may start
    anywhere (but must stay consecutive), and a leading continued
    flag still rejects — a cut that lands mid-packet is a planner
    bug, not something to paper over."""
    packets: list[bytes] = []
    cur = bytearray()
    open_packet = False
    pos = 0
    serial = None
    expect_seq = None
    saw_eos = False
    while pos < len(data):
        if saw_eos:
            raise ValueError("data after the EOS page")
        if data[pos:pos + 4] != _MAGIC:
            raise ValueError(f"bad capture pattern at offset {pos}")
        if pos + 27 > len(data):
            raise ValueError("truncated page header")
        if data[pos + 4] != 0:
            raise ValueError("unsupported Ogg version")
        flags = data[pos + 5]
        (page_serial,) = struct.unpack("<I", data[pos + 14:pos + 18])
        (seq,) = struct.unpack("<I", data[pos + 18:pos + 22])
        (crc_stored,) = struct.unpack("<I", data[pos + 22:pos + 26])
        n_segs = data[pos + 26]
        lace_end = pos + 27 + n_segs
        if lace_end > len(data):
            raise ValueError("truncated lacing table")
        lacing = data[pos + 27:lace_end]
        body_len = sum(lacing)
        page_end = lace_end + body_len
        if page_end > len(data):
            raise ValueError("truncated page body")
        zeroed = bytearray(data[pos:page_end])
        zeroed[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(zeroed)) != crc_stored:
            raise ValueError(f"page CRC mismatch at offset {pos}")
        if serial is None:
            serial = page_serial
            if not fragment and not flags & _F_BOS:
                raise ValueError("first page missing BOS")
            expect_seq = seq if fragment else 0
        else:
            if page_serial != serial:
                raise ValueError("serial change inside a single stream")
            if flags & _F_BOS:
                raise ValueError("BOS repeated mid-stream")
        if seq != expect_seq:
            raise ValueError(
                f"page sequence gap: expected {expect_seq}, got {seq}"
            )
        expect_seq += 1
        if bool(flags & _F_CONTINUED) != open_packet:
            raise ValueError("continuation flag disagrees with lacing")
        body = data[lace_end:page_end]
        off = 0
        for v in lacing:
            cur += body[off:off + v]
            off += v
            if v < 255:
                packets.append(bytes(cur))
                cur.clear()
                open_packet = False
            else:
                open_packet = True
        if flags & _F_EOS:
            saw_eos = True
        pos = page_end
    if serial is None:
        raise ValueError("empty stream")
    if not saw_eos and not fragment:
        raise ValueError("stream missing EOS")
    if open_packet:
        raise ValueError("stream ends mid-packet")
    return serial, packets


# ----------------------------------------------------------- the gate

def _doc_packet(doc_id: int, lang: str, source: str, text: str) -> bytes:
    return json.dumps(
        {"doc_id": doc_id, "lang": lang, "source": source, "text": text},
        separators=(",", ":"), sort_keys=True,
    ).encode()


def with_ogg_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard_id, shard): one logical Ogg stream per shard, one
    packet per doc, pages capped at 8 lacing values so long docs
    span pages and multi-segment lacing fires constantly."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source",
        (F.col("doc_id") / OGG_DOCS_PER_SHARD).cast("long")
        .alias("shard_id"),
    )

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        packets = [
            _doc_packet(int(r.doc_id), r.lang, r.source, r.text)
            for r in pdf.itertuples(index=False)
        ]
        return pd.DataFrame({
            "shard_id": [key[0]],
            "shard": [build_ogg(int(key[0]), packets)],
        })

    return docs.groupBy("shard_id").applyInPandas(
        assemble, schema="shard_id long, shard binary"
    )


def ogg_shard_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest the Ogg shard corpus back -> per-doc ``(doc_id, lang,
    source, n_chars, text_md5)`` recovered entirely from the page
    walk (capture pattern, Ogg-CRC verify, lacing reassembly across
    pages, flag placement).  Twin derives the same columns from
    ``documents`` directly, so a lacing bug, CRC skip, or
    continuation mistake breaks the value hash."""
    from gemmsql.pipeline.staging import stage_payload_table

    def builder(spark_, sf_dir_):
        return with_ogg_shards(spark_, sf_dir_).select(
            F.col("shard_id").alias("doc_id"),
            F.col("shard").alias("payload"),
        )

    shards = stage_payload_table(spark, sf_dir, "oggshard", builder)

    from gemmsql.pipeline.shardsplit import (
        DOC_OUT_SCHEMA,
        doc_rows_frame,
        meta_doc,
    )

    def _docs(sid, shard):
        serial, packets = parse_ogg(bytes(shard))
        if serial != int(sid):
            raise ValueError("stream serial != shard id")
        return (meta_doc(p) for p in packets)

    def ingest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield doc_rows_frame(
                rec
                for sid, shard in zip(pdf["doc_id"], pdf["payload"])
                for rec in _docs(sid, shard)
            )

    # NO decode spread (r18 negative result): after the vectorized
    # CRC the whole-shard decode is ~0.1-0.3 s total — a payload
    # shuffle to fan it measured strictly slower on all four ingests
    return shards.mapInPandas(ingest, schema=DOC_OUT_SCHEMA)


OGG_SHARD_INGEST_SQL = """
SELECT doc_id, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5
FROM documents
"""


# ------------------------------------------------ splittable by pages

def ogg_page_index(shard: bytes) -> tuple[list[int], list[bool]]:
    """(page_lengths, page_starts_fresh_packet): the split planner's
    index — one tail-free header walk (Ogg pages are self-delimiting
    via the lacing table, the property that makes the format
    seekable).  A cut is legal only BEFORE a page whose continued
    flag is clear."""
    lens: list[int] = []
    fresh: list[bool] = []
    pos = 0
    while pos < len(shard):
        if shard[pos:pos + 4] != _MAGIC:
            raise ValueError(f"bad capture pattern at offset {pos}")
        if pos + 27 > len(shard):
            raise ValueError(f"truncated page header at offset {pos}")
        n_segs = shard[pos + 26]
        if pos + 27 + n_segs > len(shard):
            # a lacing table cut short must fail with the module's
            # ValueError contract, not clamp silently (ADVICE r12 #4)
            raise ValueError(f"truncated lacing table at offset {pos}")
        body = sum(shard[pos + 27:pos + 27 + n_segs])
        lens.append(27 + n_segs + body)
        fresh.append(not shard[pos + 5] & _F_CONTINUED)
        pos += lens[-1]
    if pos != len(shard):
        raise ValueError("index does not cover the shard")
    return lens, fresh


def ogg_split_ingest(
    spark: SparkSession,
    sf_dir: str,
    *,
    target_split_bytes: int = 4096,
) -> DataFrame:
    """The splittable path: page-aligned byte ranges of
    ~``target_split_bytes``, cut only where a fresh packet starts,
    spread on (shard, split_idx) — the media/ZIP/TFRecord split
    machinery applied to the one container that was DESIGNED for
    resync (the capture pattern exists so readers can land
    mid-stream).  Every split walks through the strict fragment
    parser (CRCs re-verified, sequence continuity inside the
    fragment, a mid-packet cut rejects), and the result must
    hash-equal the whole-shard ingest."""
    from gemmsql.pipeline.staging import stage_payload_table

    def builder(spark_, sf_dir_):
        base = with_ogg_shards(spark_, sf_dir_)

        def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                lens, fresh = zip(*[
                    ogg_page_index(bytes(s)) for s in pdf["shard"]
                ])
                yield pd.DataFrame({
                    "doc_id": pdf["shard_id"],
                    "payload": pdf["shard"],
                    "page_lens": list(lens),
                    "page_fresh": list(fresh),
                })

        return base.mapInPandas(
            index,
            schema=(
                "doc_id long, payload binary, "
                "page_lens array<long>, page_fresh array<boolean>"
            ),
        )

    shards = stage_payload_table(spark, sf_dir, "oggsplit", builder)

    from gemmsql.pipeline.shardsplit import cut_ranges, split_ingest_frame

    def plan_row(row, payload):
        # cut BEFORE a page only where it starts a fresh packet
        ranges = cut_ranges(
            row["page_lens"], target_split_bytes,
            can_cut=row["page_fresh"], total=len(payload),
        )
        return ranges, {}

    def decode_chunk(chunk, row):
        _, packets = parse_ogg(chunk, fragment=True)
        for payload in packets:
            meta = json.loads(payload)
            yield (meta["doc_id"], meta["lang"], meta["source"],
                   meta["text"])

    return split_ingest_frame(shards, plan_row, decode_chunk)
