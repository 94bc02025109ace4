"""ZIP shard ingestion — the third archive container (after ustar and
WARC/gzip-member): PKZIP framing built and parsed from scratch on the
public APPNOTE format spec, with raw-DEFLATE member compression via
stdlib zlib.

What ZIP adds over tar for a 100 TB ingest tier is RANDOM ACCESS: the
end-of-central-directory record (EOCD) at the tail points at a
central directory that lists every member's offset, so one tail read
plans the whole archive — the same access pattern as a parquet footer
(`parquet_meta.read_footer_tail`), where tar requires a sequential
header walk.  :func:`parse_zip` implements exactly that walk: EOCD
scan-back at the tail, central-directory decode, per-member seek to
the local header, local/central consistency check (name, method,
sizes, CRC), store or raw-deflate decompression, and a CRC-32 +
size verification of every decompressed member.  Data-descriptor
(flag bit 3) and encryption flags are rejected by design — a member
whose sizes are only known AFTER its data defeats the planning
property this tier exists for.

The gate (:func:`zip_shard_ingest`) round-trips the documents table
through real multi-member archives — ``{doc_id}.txt`` STORED or
DEFLATED by doc parity (both decode paths hash-load-bearing, and the
recovered method itself is a gated column) plus ``{doc_id}.json``
(canonical metadata, always deflated) — and recovers everything from
the zip bytes alone.  Interop both ways with stdlib ``zipfile`` is
pinned in tests/test_zipshard.py.

Scale shape: identical to the tar tier — the shard is the parallel
unit; synthesis and ingest are narrow Arrow-batched maps with one
groupBy to assemble shards.  (No analog in the reference,
ref:gemm_map_reduce.py:1; ingest-container tier.)
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

#: docs per shard in the gate corpus (matches the tar tier)
ZIP_DOCS_PER_SHARD = 16
#: fixed DOS date 1980-01-01 00:00:00 — zip's epoch, deterministic
_DOS_DATE = (1980 - 1980) << 9 | (1 << 5) | 1
_DOS_TIME = 0

_LOCAL_SIG = b"PK\x03\x04"
_CENTRAL_SIG = b"PK\x01\x02"
_EOCD_SIG = b"PK\x05\x06"
STORE, DEFLATE = 0, 8


def _deflate(data: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def _inflate(data: bytes, expect_size: int) -> bytes:
    d = zlib.decompressobj(-15)
    out = d.decompress(data, expect_size + 1)
    if d.unconsumed_tail or len(out) != expect_size:
        raise ValueError("zip: inflated size disagrees with the directory")
    return out


def build_zip(members: list[tuple[str, bytes, int]]) -> bytes:
    """``(name, data, method)`` members -> one archive: local headers
    + data, then the central directory, then the EOCD record.  Method
    is :data:`STORE` or :data:`DEFLATE` per member."""
    blobs: list[bytes] = []
    central: list[bytes] = []
    offset = 0
    for name, data, method in members:
        if method not in (STORE, DEFLATE):
            raise ValueError(f"zip: unsupported method {method}")
        nb = name.encode()
        comp = data if method == STORE else _deflate(data)
        crc = zlib.crc32(data) & 0xFFFFFFFF
        local = (
            _LOCAL_SIG
            + struct.pack(
                "<HHHHHIIIHH",
                20, 0, method, _DOS_TIME, _DOS_DATE,
                crc, len(comp), len(data), len(nb), 0,
            )
            + nb
        )
        central.append(
            _CENTRAL_SIG
            + struct.pack(
                "<HHHHHHIIIHHHHHII",
                20, 20, 0, method, _DOS_TIME, _DOS_DATE,
                crc, len(comp), len(data), len(nb), 0, 0,
                0, 0, 0, offset,
            )
            + nb
        )
        blobs.append(local + comp)
        offset += len(local) + len(comp)
    cd = b"".join(central)
    eocd = _EOCD_SIG + struct.pack(
        "<HHHHIIH",
        0, 0, len(members), len(members), len(cd), offset, 0,
    )
    return b"".join(blobs) + cd + eocd


def parse_zip(data: bytes) -> list[tuple[str, bytes, int]]:
    """Tail-first archive walk -> ordered ``(name, bytes, method)``.

    EOCD found by scanning back from the tail (comments bound the
    scan to 64 KiB + 22 by spec); central directory entries decoded
    and verified against each member's LOCAL header (signature, name,
    method, sizes, CRC all must agree); every member decompressed and
    CRC-32-checked.  Multi-disk archives, encryption, and
    data-descriptor members are rejected."""
    tail_from = max(0, len(data) - (0xFFFF + 22))
    eocd_at = data.rfind(_EOCD_SIG, tail_from)
    if eocd_at < 0 or eocd_at + 22 > len(data):
        raise ValueError("zip: no end-of-central-directory record")
    (disk, cd_disk, n_here, n_total, cd_size, cd_off, comment_len) = (
        struct.unpack_from("<HHHHIIH", data, eocd_at + 4)
    )
    if eocd_at + 22 + comment_len != len(data):
        raise ValueError("zip: EOCD comment length disagrees with the tail")
    if disk or cd_disk or n_here != n_total:
        raise ValueError("zip: multi-disk archives unsupported")
    if cd_off + cd_size != eocd_at:
        raise ValueError("zip: central directory does not abut the EOCD")
    out: list[tuple[str, bytes, int]] = []
    pos = cd_off
    for _ in range(n_total):
        if data[pos : pos + 4] != _CENTRAL_SIG:
            raise ValueError("zip: bad central directory signature")
        (
            _ver_made, _ver_need, flags, method, _t, _d, crc,
            comp_size, uncomp_size, name_len, extra_len, comment_len2,
            _disk, _iattr, _eattr, local_off,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", data, pos + 4)
        if flags & 0x1:
            raise ValueError("zip: encrypted member")
        if flags & 0x8:
            raise ValueError("zip: data-descriptor members unsupported")
        if method not in (STORE, DEFLATE):
            raise ValueError(f"zip: unsupported method {method}")
        name = data[pos + 46 : pos + 46 + name_len].decode()
        pos += 46 + name_len + extra_len + comment_len2
        # seek to the local header and cross-check it
        if data[local_off : local_off + 4] != _LOCAL_SIG:
            raise ValueError("zip: bad local header signature")
        (
            _lver, lflags, lmethod, _lt, _ld, lcrc,
            lcomp, luncomp, lname_len, lextra_len,
        ) = struct.unpack_from("<HHHHHIIIHH", data, local_off + 4)
        lname = data[local_off + 30 : local_off + 30 + lname_len].decode()
        if (lname, lmethod, lcrc, lcomp, luncomp, lflags) != (
            name, method, crc, comp_size, uncomp_size, flags
        ):
            raise ValueError(f"zip: local/central mismatch for {name!r}")
        body_at = local_off + 30 + lname_len + lextra_len
        comp = data[body_at : body_at + comp_size]
        if len(comp) != comp_size:
            raise ValueError("zip: truncated member data")
        if method == STORE:
            if comp_size != uncomp_size:
                raise ValueError("zip: stored member size mismatch")
            body = comp
        else:
            body = _inflate(comp, uncomp_size)
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            raise ValueError(f"zip: CRC-32 mismatch for {name!r}")
        out.append((name, body, method))
    return out


def _doc_json(doc_id: int, lang: str, source: str) -> bytes:
    return json.dumps(
        {"doc_id": doc_id, "lang": lang, "source": source},
        separators=(",", ":"), sort_keys=True,
    ).encode()


def with_zip_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble the documents table into zip shards ->
    ``(shard_id, shard)``: ``{doc_id}.txt`` STORED for even doc_ids
    and DEFLATED for odd (both decode paths load-bearing) plus
    ``{doc_id}.json`` (always deflated), members in doc_id order."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source",
        (F.col("doc_id") / ZIP_DOCS_PER_SHARD).cast("long")
        .alias("shard_id"),
    )

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        members: list[tuple[str, bytes, int]] = []
        for r in pdf.itertuples(index=False):
            did = int(r.doc_id)
            method = STORE if did % 2 == 0 else DEFLATE
            members.append((f"{did}.txt", r.text.encode(), method))
            members.append((
                f"{did}.json", _doc_json(did, r.lang, r.source), DEFLATE,
            ))
        return pd.DataFrame(
            {"shard_id": [key[0]], "shard": [build_zip(members)]}
        )

    return docs.groupBy("shard_id").applyInPandas(
        assemble, schema="shard_id long, shard binary"
    )


def zip_shard_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest the zip shard corpus back -> per-doc ``(doc_id, lang,
    source, n_chars, text_md5, stored)`` recovered ENTIRELY from the
    archive bytes (EOCD walk + central/local cross-check + inflate +
    CRC verify + JSON parse).  ``stored`` is the method the walk
    FOUND for the text member, so the per-doc store/deflate choice —
    and therefore both decompression paths — is hash-load-bearing.
    The DuckDB twin derives every column from ``documents``."""
    from gemmsql.pipeline.staging import stage_payload_table

    def builder(spark_, sf_dir_):
        return with_zip_shards(spark_, sf_dir_).select(
            F.col("shard_id").alias("doc_id"),
            F.col("shard").alias("payload"),
        )

    shards = stage_payload_table(spark, sf_dir, "zipshard", builder)

    def ingest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, langs, sources, ncs, md5s, stored = [], [], [], [], [], []
            for shard in pdf["payload"]:
                samples: dict[str, dict[str, tuple[bytes, int]]] = {}
                for name, body, method in parse_zip(bytes(shard)):
                    stem, dot, ext = name.rpartition(".")
                    if not dot:
                        raise ValueError(f"zip: member {name!r} has no ext")
                    exts = samples.setdefault(stem, {})
                    if ext in exts:
                        raise ValueError(f"zip: duplicate member {name!r}")
                    exts[ext] = (body, method)
                for stem, exts in samples.items():
                    if set(exts) != {"txt", "json"}:
                        raise ValueError(
                            f"sample {stem}: members {sorted(exts)}"
                        )
                    meta = json.loads(exts["json"][0])
                    if meta["doc_id"] != int(stem):
                        raise ValueError("metadata/stem doc_id mismatch")
                    body, method = exts["txt"]
                    ids.append(meta["doc_id"])
                    langs.append(meta["lang"])
                    sources.append(meta["source"])
                    ncs.append(len(body.decode()))
                    md5s.append(hashlib.md5(body).hexdigest())
                    stored.append(1 if method == STORE else 0)
            yield pd.DataFrame({
                "doc_id": ids, "lang": langs, "source": sources,
                "n_chars": ncs, "text_md5": md5s, "stored": stored,
            })

    return shards.mapInPandas(
        ingest,
        schema=(
            "doc_id long, lang string, source string, n_chars long,"
            " text_md5 string, stored long"
        ),
    )


#: ASCII-only corpus assumption, as in the tar twin; ``stored``
#: replays the writer's parity rule, so the walk must RECOVER it
ZIP_SHARD_INGEST_SQL = """
SELECT doc_id, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS stored
FROM documents
"""
