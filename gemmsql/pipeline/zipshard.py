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
_EOCD64_SIG = b"PK\x06\x06"
_EOCD64_LOCATOR_SIG = b"PK\x06\x07"
#: the ZIP64 extended-information extra field id (APPNOTE 4.5.3)
_ZIP64_EXTRA_ID = 0x0001
_U16_MAX = 0xFFFF
_U32_MAX = 0xFFFFFFFF
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


def build_zip(
    members: list[tuple[str, bytes, int]],
    zip64: bool | frozenset[str] | set[str] = frozenset(),
    eocd_zip64: bool = False,
) -> bytes:
    """``(name, data, method)`` members -> one archive: local headers
    + data, then the central directory, then the EOCD record.  Method
    is :data:`STORE` or :data:`DEFLATE` per member.

    ZIP64 (APPNOTE 4.5): any member whose sizes or local-header
    offset exceed 32 bits — or whose name is listed in ``zip64``
    (``True`` = all; the ``force_zip64`` regime stdlib ``zipfile``
    uses for testable small fixtures) — gets 0xFFFFFFFF sentinels in
    the fixed fields and a 0x0001 extended-information extra carrying
    the real 64-bit values, in both its local header (uncomp, comp)
    and central entry (uncomp, comp, offset).  The archive gets a
    ZIP64 end-of-central-directory record + locator when the member
    count exceeds 65 535, the directory size/offset exceeds 32 bits,
    or ``zip64 is True`` / ``eocd_zip64`` — with the classic EOCD
    keeping real values where they fit and sentinels where they
    don't, exactly the stdlib writer's discipline.  This is the production WebDataset
    shard regime: >4 GiB shards saturate every classic offset field."""
    force_all = zip64 is True
    forced = frozenset() if isinstance(zip64, bool) else frozenset(zip64)
    blobs: list[bytes] = []
    central: list[bytes] = []
    offset = 0
    for name, data, method in members:
        if method not in (STORE, DEFLATE):
            raise ValueError(f"zip: unsupported method {method}")
        nb = name.encode()
        comp = data if method == STORE else _deflate(data)
        crc = zlib.crc32(data) & 0xFFFFFFFF
        m64 = (
            force_all or name in forced
            or len(comp) > _U32_MAX or len(data) > _U32_MAX
            or offset > _U32_MAX
        )
        if m64:
            lextra = struct.pack(
                "<HHQQ", _ZIP64_EXTRA_ID, 16, len(data), len(comp)
            )
            local = (
                _LOCAL_SIG
                + struct.pack(
                    "<HHHHHIIIHH",
                    45, 0, method, _DOS_TIME, _DOS_DATE,
                    crc, _U32_MAX, _U32_MAX, len(nb), len(lextra),
                )
                + nb + lextra
            )
            cextra = struct.pack(
                "<HHQQQ", _ZIP64_EXTRA_ID, 24,
                len(data), len(comp), offset,
            )
            central.append(
                _CENTRAL_SIG
                + struct.pack(
                    "<HHHHHHIIIHHHHHII",
                    45, 45, 0, method, _DOS_TIME, _DOS_DATE,
                    crc, _U32_MAX, _U32_MAX, len(nb), len(cextra), 0,
                    0, 0, 0, _U32_MAX,
                )
                + nb + cextra
            )
        else:
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
    n = len(members)
    need64 = (
        force_all or eocd_zip64 or n > _U16_MAX
        or len(cd) > _U32_MAX or offset > _U32_MAX
    )
    out = [b"".join(blobs), cd]
    if need64:
        eocd64_at = offset + len(cd)
        out.append(
            _EOCD64_SIG
            + struct.pack(
                "<QHHIIQQQQ", 44, 45, 45, 0, 0, n, n, len(cd), offset
            )
        )
        out.append(
            _EOCD64_LOCATOR_SIG + struct.pack("<IQI", 0, eocd64_at, 1)
        )
    out.append(
        _EOCD_SIG
        + struct.pack(
            "<HHHHIIH",
            0, 0, min(n, _U16_MAX), min(n, _U16_MAX),
            min(len(cd), _U32_MAX), min(offset, _U32_MAX), 0,
        )
    )
    return b"".join(out)


def _zip64_extra(extra: bytes) -> bytes | None:
    """Walk an extra-field block -> the 0x0001 ZIP64 body, or None."""
    ep = 0
    found = None
    while ep + 4 <= len(extra):
        eid, esz = struct.unpack_from("<HH", extra, ep)
        if ep + 4 + esz > len(extra):
            raise ValueError("zip: extra field overruns its block")
        if eid == _ZIP64_EXTRA_ID:
            if found is not None:
                raise ValueError("zip: duplicate ZIP64 extra field")
            found = extra[ep + 4 : ep + 4 + esz]
        ep += 4 + esz
    return found


def _resolve_zip64(
    extra: bytes | None, *fields: tuple[int, int]
) -> tuple[list[int], bool]:
    """Resolve 0xFFFFFFFF / 0xFFFF sentinels against a ZIP64 extra.

    ``fields`` are ``(value, sentinel)`` pairs in APPNOTE 4.5.3 order
    (uncompressed size, compressed size, local offset, disk number);
    each sentineled field consumes its slot — 8 bytes, or 4 for the
    disk number — from the extra body.  Returns the resolved values
    plus whether anything was actually deferred to ZIP64."""
    out: list[int] = []
    zp = 0
    used = False
    for value, sentinel in fields:
        if value == sentinel:
            if extra is None:
                raise ValueError(
                    "zip: sentinel field without a ZIP64 extra"
                )
            width = 8 if sentinel == _U32_MAX else 4
            if zp + width > len(extra):
                raise ValueError("zip: ZIP64 extra too short")
            value = int.from_bytes(
                extra[zp : zp + width], "little"
            )
            zp += width
            used = True
        out.append(value)
    return out, used


def zip_central_index(data: bytes) -> list[dict]:
    """Tail-first planning walk -> ordered per-member metadata, WITHOUT
    touching any member data: the random-access index a 100 TB ingest
    plans splits from (one tail read per shard, like a parquet
    footer).

    EOCD found by scanning back from the tail (comments bound the
    scan to 64 KiB + 22 by spec); when a ZIP64 EOCD locator sits
    immediately before it, the ZIP64 EOCD record supplies the
    authoritative count/size/offset and every classic field must
    either agree or carry its sentinel.  Central directory entries
    decoded with 0xFFFFFFFF-sentineled sizes/offsets resolved from
    the 0x0001 extra.  Each record carries ``name, method, flags,
    crc, comp_size, uncomp_size, local_off, zip64, data_end`` —
    ``data_end`` is the exclusive upper byte bound of the member's
    local region (the next member's offset, or the central
    directory's start), which is what makes byte-range split cutting
    possible.  Multi-disk archives, encryption, and data-descriptor
    members are rejected."""
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
    cd_end = eocd_at
    loc_at = eocd_at - 20
    if loc_at >= 0 and data[loc_at : loc_at + 4] == _EOCD64_LOCATOR_SIG:
        l_disk, eocd64_at, n_disks = struct.unpack_from(
            "<IQI", data, loc_at + 4
        )
        if l_disk or n_disks != 1:
            raise ValueError("zip: multi-disk archives unsupported")
        if (
            eocd64_at + 56 > len(data)
            or data[eocd64_at : eocd64_at + 4] != _EOCD64_SIG
        ):
            raise ValueError("zip: bad ZIP64 EOCD record")
        (
            rec_size, _vm, _vn, disk64, cd_disk64,
            n_here64, n_total64, cd_size64, cd_off64,
        ) = struct.unpack_from("<QHHIIQQQQ", data, eocd64_at + 4)
        if rec_size < 44:
            raise ValueError("zip: bad ZIP64 EOCD record size")
        if disk64 or cd_disk64 or n_here64 != n_total64:
            raise ValueError("zip: multi-disk archives unsupported")
        # every classic field must agree with the ZIP64 record or
        # carry its sentinel (writers vary: stdlib sentinels only the
        # overflowing fields, Info-ZIP sentinels all of them) — any
        # OTHER value is corruption
        for classic, real, sentinel in (
            (n_total, n_total64, _U16_MAX),
            (cd_size, cd_size64, _U32_MAX),
            (cd_off, cd_off64, _U32_MAX),
        ):
            if classic != real and classic != sentinel:
                raise ValueError(
                    "zip: classic EOCD disagrees with the ZIP64 record"
                )
        n_total, cd_size, cd_off = n_total64, cd_size64, cd_off64
        cd_end = eocd64_at
    if cd_off + cd_size != cd_end:
        raise ValueError("zip: central directory does not abut the EOCD")
    out: list[dict] = []
    pos = cd_off
    for _ in range(n_total):
        if data[pos : pos + 4] != _CENTRAL_SIG:
            raise ValueError("zip: bad central directory signature")
        (
            _ver_made, _ver_need, flags, method, _t, _d, crc,
            comp_size, uncomp_size, name_len, extra_len, comment_len2,
            disk_no, _iattr, _eattr, local_off,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", data, pos + 4)
        if flags & 0x1:
            raise ValueError("zip: encrypted member")
        if flags & 0x8:
            raise ValueError("zip: data-descriptor members unsupported")
        if method not in (STORE, DEFLATE):
            raise ValueError(f"zip: unsupported method {method}")
        name = data[pos + 46 : pos + 46 + name_len].decode()
        extra = data[
            pos + 46 + name_len : pos + 46 + name_len + extra_len
        ]
        (
            (uncomp_size, comp_size, local_off, disk_no),
            member64,
        ) = _resolve_zip64(
            _zip64_extra(extra),
            (uncomp_size, _U32_MAX),
            (comp_size, _U32_MAX),
            (local_off, _U32_MAX),
            (disk_no, _U16_MAX),
        )
        if disk_no:
            raise ValueError("zip: multi-disk archives unsupported")
        pos += 46 + name_len + extra_len + comment_len2
        out.append({
            "name": name, "method": method, "flags": flags, "crc": crc,
            "comp_size": comp_size, "uncomp_size": uncomp_size,
            "local_off": local_off, "zip64": member64,
        })
    # exclusive byte bound of each member's local region: members are
    # ordered by offset on the wire; the last one ends where the
    # central directory starts
    by_off = sorted(range(len(out)), key=lambda k: out[k]["local_off"])
    for rank, k in enumerate(by_off):
        nxt = (
            out[by_off[rank + 1]]["local_off"]
            if rank + 1 < len(by_off) else cd_off
        )
        out[k]["data_end"] = nxt
    return out


def decode_zip_member(buf: bytes, base: int, m: dict) -> bytes:
    """Decode ONE member from ``buf`` (= archive bytes ``base:``),
    given its central-directory record: local-header cross-check
    (signature, name, method, resolved sizes, CRC, flags all must
    agree with the central entry), store/inflate, CRC-32 verify.
    ``base`` is what makes this run on a cut byte RANGE instead of
    the whole archive — the split path's decode unit."""
    local_off = m["local_off"] - base
    if local_off < 0 or buf[local_off : local_off + 4] != _LOCAL_SIG:
        raise ValueError("zip: bad local header signature")
    (
        _lver, lflags, lmethod, _lt, _ld, lcrc,
        lcomp, luncomp, lname_len, lextra_len,
    ) = struct.unpack_from("<HHHHHIIIHH", buf, local_off + 4)
    lname = buf[local_off + 30 : local_off + 30 + lname_len].decode()
    lextra = buf[
        local_off + 30 + lname_len
        : local_off + 30 + lname_len + lextra_len
    ]
    # local sizes may themselves defer to a ZIP64 extra (the
    # stdlib force_zip64 local-header discipline)
    (luncomp, lcomp), _ = _resolve_zip64(
        _zip64_extra(lextra),
        (luncomp, _U32_MAX),
        (lcomp, _U32_MAX),
    )
    if (lname, lmethod, lcrc, lcomp, luncomp, lflags) != (
        m["name"], m["method"], m["crc"], m["comp_size"],
        m["uncomp_size"], m["flags"],
    ):
        raise ValueError(f"zip: local/central mismatch for {lname!r}")
    body_at = local_off + 30 + lname_len + lextra_len
    comp = buf[body_at : body_at + m["comp_size"]]
    if len(comp) != m["comp_size"]:
        raise ValueError("zip: truncated member data")
    if m["method"] == STORE:
        if m["comp_size"] != m["uncomp_size"]:
            raise ValueError("zip: stored member size mismatch")
        body = comp
    else:
        body = _inflate(comp, m["uncomp_size"])
    if zlib.crc32(body) & 0xFFFFFFFF != m["crc"]:
        raise ValueError(f"zip: CRC-32 mismatch for {m['name']!r}")
    return body


def parse_zip_entries(
    data: bytes,
) -> list[tuple[str, bytes, int, bool]]:
    """Whole-archive walk -> ordered ``(name, bytes, method, zip64)``:
    :func:`zip_central_index` + :func:`decode_zip_member` over every
    record.  ``zip64`` reports whether the member's central entry
    deferred any field to a ZIP64 extra."""
    return [
        (m["name"], decode_zip_member(data, 0, m), m["method"], m["zip64"])
        for m in zip_central_index(data)
    ]


def parse_zip(data: bytes) -> list[tuple[str, bytes, int]]:
    """:func:`parse_zip_entries` without the per-member zip64 flag."""
    return [(n, b, m) for n, b, m, _ in parse_zip_entries(data)]


def split_zip(
    data: bytes, target_split_bytes: int | None = None
) -> list[dict]:
    """Cut one archive into member-aligned byte-range splits of
    ~``target_split_bytes`` (default the media tier's 4 MiB) ->
    ``[{split_idx, base, chunk, members}]``, the central directory
    used exactly as a parquet footer: one tail read plans every
    split, then each split decodes independently from its OWN bytes.

    Members are packed in wire (offset) order; a member never spans
    splits (they are the atomic unit, like frames in the media
    readers), so one multi-GiB WebDataset shard fans out to
    ~archive_bytes / target concurrent decode tasks instead of one."""
    from gemmsql.pipeline.media_split import DEFAULT_SPLIT_BYTES

    tgt = (
        DEFAULT_SPLIT_BYTES if target_split_bytes is None
        else max(1, int(target_split_bytes))
    )
    idx = sorted(zip_central_index(data), key=lambda m: m["local_off"])
    splits: list[dict] = []
    cur: list[dict] = []
    for m in idx:
        cur.append(m)
        lo = cur[0]["local_off"]
        if m["data_end"] - lo >= tgt:
            splits.append(cur)
            cur = []
    if cur:
        splits.append(cur)
    return [
        {
            "split_idx": k,
            "base": grp[0]["local_off"],
            "chunk": data[grp[0]["local_off"] : grp[-1]["data_end"]],
            "members": grp,
        }
        for k, grp in enumerate(splits)
    ]


def decode_zip_range(
    chunk: bytes, base: int, members: list[dict]
) -> list[tuple[str, bytes, int, bool]]:
    """Decode one split's members from its cut byte range — the
    distributed unit :func:`zip_shard_ingest_split` runs per task."""
    return [
        (m["name"], decode_zip_member(chunk, base, m), m["method"],
         m["zip64"])
        for m in members
    ]


def _doc_json(doc_id: int, lang: str, source: str) -> bytes:
    return json.dumps(
        {"doc_id": doc_id, "lang": lang, "source": source},
        separators=(",", ":"), sort_keys=True,
    ).encode()


def with_zip_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble the documents table into zip shards ->
    ``(shard_id, shard)``: ``{doc_id}.txt`` STORED for even doc_ids
    and DEFLATED for odd (both decode paths load-bearing) plus
    ``{doc_id}.json`` (always deflated), members in doc_id order.

    ZIP64 coverage (r12): the text member of every ``doc_id % 3 == 0``
    doc is written with sentinel fields + ZIP64 extras (the
    force-zip64 small-fixture regime), and every EVEN shard carries a
    ZIP64 EOCD record + locator — so the ingest exercises classic and
    ZIP64 framing side by side in one corpus, and the recovered
    per-member flag is a gated column."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source",
        (F.col("doc_id") / ZIP_DOCS_PER_SHARD).cast("long")
        .alias("shard_id"),
    )

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        members: list[tuple[str, bytes, int]] = []
        forced: set[str] = set()
        for r in pdf.itertuples(index=False):
            did = int(r.doc_id)
            method = STORE if did % 2 == 0 else DEFLATE
            members.append((f"{did}.txt", r.text.encode(), method))
            if did % 3 == 0:
                forced.add(f"{did}.txt")
            members.append((
                f"{did}.json", _doc_json(did, r.lang, r.source), DEFLATE,
            ))
        shard = build_zip(
            members, zip64=forced, eocd_zip64=int(key[0]) % 2 == 0
        )
        return pd.DataFrame({"shard_id": [key[0]], "shard": [shard]})

    return docs.groupBy("shard_id").applyInPandas(
        assemble, schema="shard_id long, shard binary"
    )


def zip_shard_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest the zip shard corpus back -> per-doc ``(doc_id, lang,
    source, n_chars, text_md5, stored, zip64)`` recovered ENTIRELY
    from the archive bytes (EOCD / ZIP64-EOCD walk + central/local
    cross-check + inflate + CRC verify + JSON parse).  ``stored`` is
    the method the walk FOUND for the text member and ``zip64``
    whether its central entry deferred fields to a ZIP64 extra — so
    the per-doc store/deflate choice, both decompression paths, AND
    both framing generations are hash-load-bearing.  The DuckDB twin
    derives every column from ``documents``."""
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
            cols: dict[str, list] = {
                "doc_id": [], "lang": [], "source": [], "n_chars": [],
                "text_md5": [], "stored": [], "zip64": [],
            }
            for shard in pdf["payload"]:
                samples: dict[str, dict[str, tuple[bytes, int, bool]]] = {}
                for name, body, method, m64 in parse_zip_entries(
                    bytes(shard)
                ):
                    stem, dot, ext = name.rpartition(".")
                    if not dot:
                        raise ValueError(f"zip: member {name!r} has no ext")
                    exts = samples.setdefault(stem, {})
                    if ext in exts:
                        raise ValueError(f"zip: duplicate member {name!r}")
                    exts[ext] = (body, method, m64)
                for stem, exts in samples.items():
                    if set(exts) != {"txt", "json"}:
                        raise ValueError(
                            f"sample {stem}: members {sorted(exts)}"
                        )
                    meta = json.loads(exts["json"][0])
                    if meta["doc_id"] != int(stem):
                        raise ValueError("metadata/stem doc_id mismatch")
                    body, method, m64 = exts["txt"]
                    cols["doc_id"].append(meta["doc_id"])
                    cols["lang"].append(meta["lang"])
                    cols["source"].append(meta["source"])
                    cols["n_chars"].append(len(body.decode()))
                    cols["text_md5"].append(hashlib.md5(body).hexdigest())
                    cols["stored"].append(1 if method == STORE else 0)
                    cols["zip64"].append(1 if m64 else 0)
            yield pd.DataFrame(cols)

    return shards.mapInPandas(
        ingest,
        schema=(
            "doc_id long, lang string, source string, n_chars long,"
            " text_md5 string, stored long, zip64 long"
        ),
    )


def zip_shard_ingest_split(
    spark: SparkSession,
    sf_dir: str,
    target_split_bytes: int | None = None,
) -> DataFrame:
    """:func:`zip_shard_ingest` through the SPLITTABLE path — the
    media tier's range machinery applied to the archive container:
    stage 1 reads each shard's central directory ONCE and cuts
    member-aligned byte-range splits (:func:`split_zip`); the splits
    are spread across the cluster on ``(shard, split_idx)``; stage 2
    decodes each split independently (:func:`decode_zip_range`) into
    per-MEMBER rows; one final groupBy reassembles the txt/json pair
    of each doc (the pair may land in different splits — wire order
    packs members, not docs).

    Identical output, schema, and hash to the whole-shard ingest —
    pinned in tests/test_zipshard.py across several split sizes and
    in tests/test_rotation.py against the documents-derived oracle.
    At 100 TB this is the difference between one task per multi-GiB
    WebDataset shard and ~shard_bytes / 4 MiB concurrent tasks."""
    from gemmsql.pipeline.staging import stage_payload_table

    def builder(spark_, sf_dir_):
        return with_zip_shards(spark_, sf_dir_).select(
            F.col("shard_id").alias("doc_id"),
            F.col("shard").alias("payload"),
        )

    shards = stage_payload_table(spark, sf_dir, "zipshard", builder)

    def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for shard_id, p in zip(pdf["doc_id"], pdf["payload"]):
                for s in split_zip(bytes(p), target_split_bytes):
                    rows.append((
                        int(shard_id), s["split_idx"], s["base"],
                        json.dumps(s["members"]), s["chunk"],
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard_id", "split_idx", "base", "members", "chunk",
                ],
            )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols: dict[str, list] = {
                "stem": [], "doc_id_meta": [], "lang": [], "source": [],
                "n_chars": [], "text_md5": [], "stored": [], "zip64": [],
            }
            for row in pdf.itertuples(index=False):
                members = json.loads(row.members)
                for name, body, method, m64 in decode_zip_range(
                    bytes(row.chunk), int(row.base), members
                ):
                    stem, dot, ext = name.rpartition(".")
                    if not dot or ext not in ("txt", "json"):
                        raise ValueError(f"zip: unexpected member {name!r}")
                    if ext == "txt":
                        cols["stem"].append(int(stem))
                        cols["doc_id_meta"].append(None)
                        cols["lang"].append(None)
                        cols["source"].append(None)
                        cols["n_chars"].append(len(body.decode()))
                        cols["text_md5"].append(
                            hashlib.md5(body).hexdigest()
                        )
                        cols["stored"].append(
                            1 if method == STORE else 0
                        )
                        cols["zip64"].append(1 if m64 else 0)
                    else:
                        meta = json.loads(body)
                        cols["stem"].append(int(stem))
                        cols["doc_id_meta"].append(meta["doc_id"])
                        cols["lang"].append(meta["lang"])
                        cols["source"].append(meta["source"])
                        cols["n_chars"].append(None)
                        cols["text_md5"].append(None)
                        cols["stored"].append(None)
                        cols["zip64"].append(None)
            # nullable Int64 so the half-populated numeric columns
            # cross Arrow as int64-with-nulls, not NaN-poisoned floats
            yield pd.DataFrame(cols).astype({
                "doc_id_meta": "Int64", "n_chars": "Int64",
                "stored": "Int64", "zip64": "Int64",
            })

    splits = shards.mapInPandas(
        index,
        schema=(
            "shard_id long, split_idx long, base long, members string,"
            " chunk binary"
        ),
    )
    # explicit count: byte-light/compute-heavy spread — see the
    # media_split r17 note (AQE would coalesce to one partition)
    spread = splits.repartition(
        spark.sparkContext.defaultParallelism,
        F.col("shard_id"), F.col("split_idx"))
    parts = spread.mapInPandas(
        decode,
        schema=(
            "stem long, doc_id_meta long, lang string, source string,"
            " n_chars long, text_md5 string, stored long, zip64 long"
        ),
    )
    # reassemble each doc's txt/json pair; the filter enforces the
    # pairing invariants — a violation DROPS rows, which the
    # row-count gate surfaces rather than hides
    return (
        parts.groupBy("stem")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max("doc_id_meta").alias("doc_id"),
            F.max("lang").alias("lang"),
            F.max("source").alias("source"),
            F.max("n_chars").alias("n_chars"),
            F.max("text_md5").alias("text_md5"),
            F.max("stored").alias("stored"),
            F.max("zip64").alias("zip64"),
        )
        .where((F.col("n_members") == 2) & (F.col("doc_id") == F.col("stem")))
        .select(
            "doc_id", "lang", "source", "n_chars", "text_md5",
            "stored", "zip64",
        )
    )


#: ASCII-only corpus assumption, as in the tar twin; ``stored`` and
#: ``zip64`` replay the writer's parity rules, so the walk must
#: RECOVER both the compression method and the framing generation
ZIP_SHARD_INGEST_SQL = """
SELECT doc_id, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars,
       md5(text) AS text_md5,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS stored,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS zip64
FROM documents
"""
