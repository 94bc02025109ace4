"""TFRecord shard reader — length-delimited record framing with
masked CRC-32C, from scratch.

TFRecord is the ML-data shard format the TensorFlow ecosystem
standardized (public format documentation: each record is
``uint64le length, uint32le masked_crc32c(length_bytes), data,
uint32le masked_crc32c(data)``), sitting next to WebDataset tar
shards (`tarshard.py`) and ZIP shards (`zipshard.py`) in the
training-data ingest tier.  Everything here is first-principles:

- **CRC-32C** (:func:`crc32c`): the Castagnoli polynomial in its
  reflected table-driven form (table built from 0x82F63B78 at import;
  init/final-xor 0xFFFFFFFF) — no zlib, no external crc32c wheel.
- **Masking** (:func:`masked_crc`): TFRecord stores
  ``rotr15(crc) + 0xA282EAD8 (mod 2^32)`` so CRCs of CRCs stay
  well-distributed; the reader unrotates nothing — it recomputes and
  compares the masked value, rejecting on either the length CRC
  (framing trust) or the data CRC (payload trust).
- **Strict walk** (:func:`parse_tfrecord`): truncated length word,
  truncated payload, wrong length CRC, wrong data CRC, and trailing
  garbage after the last record all raise — a shard either parses
  completely or not at all.

Gate (`tfrecord_ingest`): the documents table is assembled into
TFRecord shards (one canonical-JSON record per doc, key-sorted so
the bytes are engine-replayable), staged once, and the ingest
recovers every column FROM THE BYTES; the DuckDB twin derives the
same columns from ``documents`` directly — the tar gate's
discipline, so a length mis-parse, CRC skip, or mask error breaks
the value hash.

Scale shape: shard = Arrow batch row = task; records inside a shard
are walked sequentially (the format has no central index — that is
WHY the ecosystem moved to indexable containers; the docstring says
so rather than pretending), but shards themselves fan out across
the cluster, which is how TFRecord is consumed in practice.

(No analog in the reference — its surface is ML operators,
ref:gemm_map_reduce.py:1; this extends the brief's ingest tier.)
"""

from __future__ import annotations

import hashlib
import json
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table

TFR_DOCS_PER_SHARD = 32

_MASK_DELTA = 0xA282EAD8

# reflected CRC-32C table (Castagnoli poly 0x1EDC6F41, reversed form)
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _TABLE.append(_c)


def crc32c(data: bytes) -> int:
    """Table-driven reflected CRC-32C (Castagnoli)."""
    c = 0xFFFFFFFF
    for b in data:
        c = _TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    """TFRecord's stored form: rotate right 15, add the mask delta."""
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def tfrecord_frame(record: bytes) -> bytes:
    """One framed record: length, masked length-CRC, data, masked
    data-CRC."""
    length = struct.pack("<Q", len(record))
    return (
        length
        + struct.pack("<I", masked_crc(length))
        + record
        + struct.pack("<I", masked_crc(record))
    )


def build_tfrecord(records: list[bytes]) -> bytes:
    return b"".join(tfrecord_frame(r) for r in records)


def parse_tfrecord(data: bytes) -> list[bytes]:
    """Strict shard walk: every record's BOTH CRCs verify, and the
    stream must end exactly on a record boundary."""
    out: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("truncated length header")
        length_bytes = data[pos:pos + 8]
        (length,) = struct.unpack("<Q", length_bytes)
        (lcrc,) = struct.unpack("<I", data[pos + 8:pos + 12])
        if lcrc != masked_crc(length_bytes):
            raise ValueError(f"length CRC mismatch at offset {pos}")
        pos += 12
        if pos + length + 4 > n:
            raise ValueError("truncated record payload")
        payload = data[pos:pos + length]
        (dcrc,) = struct.unpack("<I", data[pos + length:pos + length + 4])
        if dcrc != masked_crc(payload):
            raise ValueError(f"data CRC mismatch at offset {pos}")
        out.append(payload)
        pos += length + 4
    return out


# ----------------------------------------------------------- the gate

def _doc_record(doc_id: int, lang: str, source: str, text: str) -> bytes:
    """Canonical key-sorted JSON record — byte-replayable by any
    engine from the documents columns."""
    return json.dumps(
        {"doc_id": doc_id, "lang": lang, "source": source, "text": text},
        separators=(",", ":"), sort_keys=True,
    ).encode()


def with_tfrecord_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble documents into TFRecord shards -> (shard_id, shard):
    one framed JSON record per doc, doc_id-sorted within the shard."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source",
        (F.col("doc_id") / TFR_DOCS_PER_SHARD).cast("long")
        .alias("shard_id"),
    )

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        records = [
            _doc_record(int(r.doc_id), r.lang, r.source, r.text)
            for r in pdf.itertuples(index=False)
        ]
        return pd.DataFrame(
            {"shard_id": [key[0]], "shard": [build_tfrecord(records)]}
        )

    return docs.groupBy("shard_id").applyInPandas(
        assemble, schema="shard_id long, shard binary"
    )


def tfrecord_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest the shard corpus back -> per-doc ``(doc_id, lang,
    source, n_chars, text_md5)`` recovered entirely from the framed
    bytes (length walk + both masked CRC-32C verifies + JSON parse).
    The DuckDB twin derives the same columns from ``documents``
    directly, so a framing mis-parse, CRC skip, or mask bug breaks
    the value hash."""
    from gemmsql.pipeline.staging import stage_payload_table

    def builder(spark_, sf_dir_):
        return with_tfrecord_shards(spark_, sf_dir_).select(
            F.col("shard_id").alias("doc_id"),
            F.col("shard").alias("payload"),
        )

    shards = stage_payload_table(spark, sf_dir, "tfrecord", builder)

    def ingest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, langs, sources, ncs, md5s = [], [], [], [], []
            for shard in pdf["payload"]:
                for payload in parse_tfrecord(bytes(shard)):
                    meta = json.loads(payload)
                    text = meta["text"]
                    ids.append(meta["doc_id"])
                    langs.append(meta["lang"])
                    sources.append(meta["source"])
                    ncs.append(len(text))
                    md5s.append(
                        hashlib.md5(text.encode()).hexdigest()
                    )
            yield pd.DataFrame({
                "doc_id": ids, "lang": langs, "source": sources,
                "n_chars": ncs, "text_md5": md5s,
            })

    return shards.mapInPandas(
        ingest,
        schema=(
            "doc_id long, lang string, source string, "
            "n_chars long, text_md5 string"
        ),
    )


TFRECORD_INGEST_SQL = """
SELECT doc_id, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5
FROM documents
"""
