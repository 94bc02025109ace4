"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas`` kernels over
REAL uncompressed media formats.

The container has no codec libraries, so every codec here is
dependency-free: PPM (P6) and BMP (24-bit) uncompressed images, WAV
(PCM16) audio, PNG (stdlib-zlib inflate, all five scanline filters)
and baseline JPEG — grayscale and YCbCr 4:2:0 color with restart
markers, in ``jpeg.py`` — all full encoders + decoders in pure
Python/NumPy.  Every query below goes through :func:`decode_image` /
:func:`decode_wav`, so a library codec (MP3/AV1/...) would change one
dispatch line, not the plumbing.

Payload synthesis is deterministic AND SQL-replayable: the synthetic
PPM body is a chain of md5 digests keyed on ``(doc_id, tile)``, so the
DuckDB oracle reconstructs the byte-identical payload with
``unhex(string_agg(md5(...)))`` and the decode-dependent feature query
(:func:`payload_features`) gets full hash parity — the decode step is
verified end-to-end, not fixture-only.

At 100 TB binary payloads dominate I/O: these maps are narrow (no
shuffle), so throughput is bounded by scan + Python/Arrow transfer;
metadata-only queries must select projected columns so Parquet never
reads the blob (column pruning — verified in tests via the scan schema).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.datamodel import load_table

# synthetic image geometry: width fixed, height varies per doc so the
# decoder genuinely parses dimensions (and n_bytes differs across docs)
PPM_W = 16
PPM_H_BASE = 8
PPM_H_MOD = 8   # H = PPM_H_BASE + doc_id % PPM_H_MOD, so 8..15
_MD5_LEN = 16   # bytes per md5 digest tile


# ------------------------------------------------------------------ codecs

def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM (P6)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("PPM is RGB; expected (H, W, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (H, W, 3) uint8.  A real parser: handles
    arbitrary whitespace and ``#`` comments in the header per the
    netpbm spec, validates maxval and body length."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize header: magic, width, height, maxval; '#' starts a
    # comment running to end-of-line; a single whitespace byte ends
    # the header after maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, got maxval={maxval}")
    body = payload[pos : pos + w * h * 3]
    if len(body) != w * h * 3:
        raise ValueError("truncated PPM body")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding, BGR byte order)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("BMP encoder expects (H, W, 3)")
    row_raw = w * 3
    pad = (-row_raw) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):           # bottom-up
        row = img[y, :, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        body += row + b"\x00" * pad
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return hdr + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB.  Handles the
    standard BITMAPINFOHEADER layout: bottom-up or top-down rows
    (negative height), 4-byte row padding, BGR order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP, got bpp={bpp}")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload[pixel_off : pixel_off + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]                    # bottom-up -> top-down
    return rows[:, :, ::-1].copy()           # BGR -> RGB


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(N,) or (N, C) int16 -> RIFF/WAVE PCM16 bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()                       # interleaved little-endian
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff = b"WAVE" + fmt + data_chunk
    return struct.pack("<4sI", b"RIFF", len(riff)) + riff


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> ((N, C) int16 samples, sample_rate).  Walks
    the chunk list (so extra chunks like LIST are skipped), PCM16 only.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, ch, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)             # chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return np.frombuffer(data, dtype=np.int16).reshape(-1, ch), rate


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a scanline."""
    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where(
        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
    ).astype(np.uint8)


def encode_png(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> PNG (8-bit truecolor), stdlib zlib only.

    The per-scanline filter is chosen as ``y % 5`` so every encoded
    image exercises all five PNG filter types (None/Sub/Up/Average/
    Paeth) — the decoder's unfilter path is therefore covered by any
    round-trip, not just the trivial filter-0 case."""
    import zlib

    h, w, c = img.shape
    if c != 3:
        raise ValueError("PNG encoder expects (H, W, 3)")
    img = img.astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        cur = img[y].reshape(-1)
        ft = y % 5
        if ft == 0:
            out = cur
        elif ft == 1:      # Sub: left neighbor (3 bytes back for RGB)
            left = np.concatenate([np.zeros(3, np.uint8), cur[:-3]])
            out = cur - left
        elif ft == 2:      # Up
            out = cur - prev
        elif ft == 3:      # Average
            left = np.concatenate([np.zeros(3, np.uint8), cur[:-3]])
            avg = (left.astype(np.uint16) + prev.astype(np.uint16)) // 2
            out = cur - avg.astype(np.uint8)
        else:              # Paeth
            left = np.concatenate([np.zeros(3, np.uint8), cur[:-3]])
            upleft = np.concatenate([np.zeros(3, np.uint8), prev[:-3]])
            out = cur - _paeth(left, prev, upleft)
        raw.append(ft)
        raw += out.astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag: bytes, body: bytes) -> bytes:
        import zlib as _z

        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """PNG (8-bit truecolor RGB, non-interlaced) -> (H, W, 3) uint8.

    A real decoder over the compressed format, dependency-free: walks
    the chunk list with CRC32 verification, inflates the concatenated
    IDAT stream with stdlib zlib, and un-applies all five scanline
    filters (incl. the Paeth predictor).  Palette/alpha/16-bit/
    interlaced variants raise loudly rather than decode wrong."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = len(_PNG_SIG), None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "only 8-bit truecolor non-interlaced PNG supported, "
                    f"got depth={depth} color={ctype} interlace={inter}"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:   # uniform decode contract: ValueError
        raise ValueError(f"PNG inflate failed: {e}") from e
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel stream length mismatch")
    img = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).copy()
        if ft == 0:
            cur = line
        elif ft == 2:      # Up
            cur = line + prev
        elif ft in (1, 3, 4):  # Sub/Average/Paeth: sequential in x
            cur = line
            for x in range(stride):
                left = cur[x - 3] if x >= 3 else 0
                if ft == 1:
                    cur[x] = (int(line[x]) + int(left)) & 0xFF
                elif ft == 3:
                    cur[x] = (
                        int(line[x]) + (int(left) + int(prev[x])) // 2
                    ) & 0xFF
                else:
                    ul = prev[x - 3] if x >= 3 else 0
                    a, b, c = int(left), int(prev[x]), int(ul)
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                    cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        img[y] = cur
        prev = img[y]
    return img.reshape(h, w, 3)


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes: PPM (P6), 24-bit BMP, PNG (8-bit RGB,
    stdlib-zlib inflate), or baseline JPEG (grayscale, the LOSSY
    compressed tier — full pure-NumPy codec in ``jpeg.py``) ->
    (H, W, 3) uint8 RGB (grayscale replicated across channels)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from gemmsql.pipeline.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError(f"unrecognized image magic {payload[:2]!r}")


# ------------------------------------------------------- payload synthesis

def _ppm_body(doc_id: int, h: int) -> bytes:
    """Pixel byte stream for the synthetic image: 3*h md5 tiles of 16
    bytes each == exactly W*h*3 bytes at W=16.  Keyed on (doc_id, tile)
    so DuckDB replays it with unhex(string_agg(md5(...)))."""
    n_tiles = (PPM_W * h * 3) // _MD5_LEN
    return b"".join(
        hashlib.md5(f"px:{doc_id}:{t}".encode()).digest()
        for t in range(n_tiles)
    )


def with_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach a REAL binary image column: a P6 PPM of W=16, H=8+doc_id%8
    whose pixel bytes are a deterministic md5 chain (SQL-replayable),
    plus media metadata columns.  Narrow Arrow-batched map."""
    # repartition the doc list: the single-file documents scan is one
    # partition, which would serialize the Arrow synth/decode maps and
    # the staged payload files on one core (round-9 fix)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for doc_id in pdf["doc_id"]:
                h = PPM_H_BASE + int(doc_id) % PPM_H_MOD
                payloads.append(
                    b"P6\n%d %d\n255\n" % (PPM_W, h)
                    + _ppm_body(int(doc_id), h)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.mapInPandas(
        synth, schema="doc_id long, payload binary"
    ).select(
        "doc_id",
        "payload",
        F.lit("image/x-portable-pixmap").alias("media_type"),
        F.length("payload").cast("long").alias("n_bytes"),
    )


# DuckDB twin of the payload bytes: header text + unhex'd md5 chain
_PAYLOAD_CTE = f"""
d AS (SELECT doc_id, {PPM_H_BASE} + doc_id % {PPM_H_MOD} AS h FROM documents),
body AS (
  SELECT d.doc_id, d.h,
         unhex(string_agg(
           md5('px:' || CAST(d.doc_id AS VARCHAR) || ':'
               || CAST(s.t AS VARCHAR)), '' ORDER BY s.t)) AS px
  FROM d JOIN generate_series(0, {3 * (PPM_H_BASE + PPM_H_MOD - 1) - 1}) s(t)
    ON s.t < 3 * d.h
  GROUP BY d.doc_id, d.h
),
payload AS (
  SELECT doc_id, h,
         encode('P6' || chr(10) || '{PPM_W} ' || CAST(h AS VARCHAR)
                || chr(10) || '255' || chr(10)) || px AS p
  FROM body
)
"""


# ------------------------------------------------------------- metadata

def payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata extraction over the binary column (hash + size) — the
    query pattern for corpus stats that must NOT decode payloads.
    The digest is sha256 over hex(payload) because DuckDB's sha256 is
    VARCHAR-only; both engines uppercase-hex identically."""
    b = with_binary_payload(spark, sf_dir)
    return b.select(
        "doc_id",
        "n_bytes",
        F.sha2(F.hex("payload"), 256).alias("sha256"),
    )


PAYLOAD_META_SQL = f"""
WITH {_PAYLOAD_CTE}
SELECT doc_id,
  CAST(octet_length(p) AS BIGINT) AS n_bytes,
  sha256(hex(p)) AS sha256
FROM payload
"""


# ------------------------------------------------------- decode features

def payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every payload with the REAL PPM parser and emit per-doc,
    per-channel pixel statistics: ``(doc_id, channel, n_px, mean, std)``.

    The kernel computes exact int64 (sum, sum_sq, count) partials from
    the decoded array; mean/std are derived in Spark SQL expressions
    written to mirror the oracle's double arithmetic term for term, so
    the result hash-matches DuckDB's reconstruction of the same pixels.

    Scale shape: one narrow Arrow-batched map (decode + 6 ints per
    doc-channel), then a doc_id-keyed aggregation-free projection — no
    shuffle at all; at 100 TB this is scan-bound, the right bound for
    a decode pass."""
    b = with_binary_payload(spark, sf_dir).select("doc_id", "payload")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, chans, ns, sums, sqs = [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(p)).astype(np.int64)
                n = img.shape[0] * img.shape[1]
                for c in range(3):
                    ch = img[:, :, c]
                    ids.append(doc_id)
                    chans.append(c)
                    ns.append(n)
                    sums.append(int(ch.sum()))
                    sqs.append(int((ch * ch).sum()))
            yield pd.DataFrame(
                {"doc_id": ids, "channel": chans, "n_px": ns,
                 "s": sums, "s2": sqs}
            )

    part = b.mapInPandas(
        stats,
        schema="doc_id long, channel int, n_px long, s long, s2 long",
    )
    n = F.col("n_px").cast("double")
    s = F.col("s").cast("double")
    s2 = F.col("s2").cast("double")
    return part.select(
        "doc_id",
        F.col("channel").cast("long").alias("channel"),
        "n_px",
        F.round(s / n, 6).alias("mean"),
        F.round(F.sqrt((s2 - s * s / n) / n), 6).alias("std"),
    )


# oracle: re-derive every pixel byte from the md5 chain by string
# position (tile t = i DIV 16, hex pair at 2*(i%16)+1), channel = i%3
PAYLOAD_FEATURES_SQL = f"""
WITH d AS (
  SELECT doc_id, {PPM_H_BASE} + doc_id % {PPM_H_MOD} AS h FROM documents
),
px AS (
  SELECT d.doc_id, s.i % 3 AS channel,
         CAST('0x' || substr(
           md5('px:' || CAST(d.doc_id AS VARCHAR) || ':'
               || CAST(s.i // {_MD5_LEN} AS VARCHAR)),
           2 * (s.i % {_MD5_LEN}) + 1, 2) AS BIGINT) AS v
  FROM d JOIN generate_series(0,
         {PPM_W * 3 * (PPM_H_BASE + PPM_H_MOD - 1) - 1}) s(i)
    ON s.i < {PPM_W} * 3 * d.h
),
agg AS (
  SELECT doc_id, channel,
         CAST(COUNT(*) AS BIGINT) AS n_px,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v * v) AS BIGINT) AS s2
  FROM px GROUP BY doc_id, channel
)
SELECT doc_id, channel, n_px,
  ROUND(CAST(s AS DOUBLE) / CAST(n_px AS DOUBLE), 6) AS mean,
  ROUND(SQRT((CAST(s2 AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n_px AS DOUBLE))
             / CAST(n_px AS DOUBLE)), 6) AS std
FROM agg
"""


def with_png_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach a REAL compressed PNG payload per document: the same
    md5-chain pixel stream as the PPM tier (prefix ``pn:``) run through
    :func:`encode_png`, whose y%5 filter schedule guarantees every
    payload exercises all five PNG filters.  Narrow Arrow-batched map;
    the oracle reconstructs the PIXELS (not the container bytes), so
    DuckDB never needs zlib."""
    # repartition the doc list: the single-file documents scan is one
    # partition, which would serialize the Arrow synth/decode maps and
    # the staged payload files on one core (round-9 fix)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for doc_id in pdf["doc_id"]:
                h = PPM_H_BASE + int(doc_id) % PPM_H_MOD
                n_tiles = (PPM_W * h * 3) // _MD5_LEN
                body = b"".join(
                    hashlib.md5(f"pn:{int(doc_id)}:{t}".encode()).digest()
                    for t in range(n_tiles)
                )
                img = np.frombuffer(body, dtype=np.uint8).reshape(
                    h, PPM_W, 3
                )
                payloads.append(encode_png(img))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.mapInPandas(synth, schema="doc_id long, payload binary")


def png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every COMPRESSED payload with the real PNG decoder
    (zlib inflate + CRC check + per-scanline unfilter) and emit the
    same per-doc-channel exact-int64 pixel statistics as
    :func:`payload_features`.  Proves the compressed-format tier
    end-to-end: a wrong inflate, CRC skip, or filter bug changes the
    pixels and breaks the value hash against DuckDB's md5-chain
    reconstruction.  Zero shuffle — one narrow decode map over
    payloads staged to session-local parquet (staging.py), so the
    timed query is pure decode."""
    from gemmsql.pipeline.staging import stage_payload_table

    b = stage_payload_table(spark, sf_dir, "png", with_png_payload)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, chans, ns, sums, sqs = [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(p)).astype(np.int64)
                n = img.shape[0] * img.shape[1]
                for c in range(3):
                    ch = img[:, :, c]
                    ids.append(doc_id)
                    chans.append(c)
                    ns.append(n)
                    sums.append(int(ch.sum()))
                    sqs.append(int((ch * ch).sum()))
            yield pd.DataFrame(
                {"doc_id": ids, "channel": chans, "n_px": ns,
                 "s": sums, "s2": sqs}
            )

    part = b.mapInPandas(
        stats,
        schema="doc_id long, channel int, n_px long, s long, s2 long",
    )
    n = F.col("n_px").cast("double")
    s = F.col("s").cast("double")
    s2 = F.col("s2").cast("double")
    return part.select(
        "doc_id",
        F.col("channel").cast("long").alias("channel"),
        "n_px",
        F.round(s / n, 6).alias("mean"),
        F.round(F.sqrt((s2 - s * s / n) / n), 6).alias("std"),
    )


# oracle: identical pixel reconstruction to PAYLOAD_FEATURES_SQL but
# over the pn: md5 chain — the compressed container is invisible to the
# oracle because decode(encode_png(img)) == img exactly
PNG_FEATURES_SQL = PAYLOAD_FEATURES_SQL.replace("md5('px:'", "md5('pn:'")


def extract_features(
    df: DataFrame, *, decoder=decode_image
) -> DataFrame:
    """payload binary -> per-channel mean feature vector via the real
    decoder, Arrow-batched; narrow map.  ``decoder`` is the kernel-local
    hook where a codec library would slot in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = [
                decoder(bytes(p)).astype(np.float64)
                .mean(axis=(0, 1)).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "features": feats}
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, features array<double>"
    )


# --------------------------------------------------------------- resize

def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize: decode (PPM/BMP) -> index-sample ->
    re-encode as PPM.  Pure NumPy, no codec dependency."""
    img = decode_image(payload)
    h, w, _ = img.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return encode_ppm(img[np.ix_(ys, xs)])


def resize_images(
    df: DataFrame, *, width: int = 8, height: int = 8, resizer=resize_image
) -> DataFrame:
    """payload -> resized payload + output dims.  Narrow Arrow-batched
    map; at 100 TB the input column stays in the scan's Arrow batches
    end-to-end (never collected, never shuffled)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = [resizer(bytes(p), width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "resized": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, resized binary, width int, height int"
    )


def sample_frames(
    df: DataFrame, *, n_frames: int = 4, frame_bytes: int = 32
) -> DataFrame:
    """Treat the payload as a fake video: cut ``n_frames`` evenly-spaced
    fixed-size byte windows ("frames") and EXPLODE to one row per
    frame — the schema/fan-out shape of real video frame sampling
    (ffmpeg would replace the slicer, nothing else changes).

    Output rows = n_frames x input rows; the explode happens inside the
    same narrow map, so no shuffle is introduced."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fidx, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                if len(b) < frame_bytes:
                    b = b + b"\0" * (frame_bytes - len(b))
                span = max(len(b) - frame_bytes, 0)
                for f in range(n_frames):
                    off = (span * f) // max(n_frames - 1, 1)
                    ids.append(doc_id)
                    fidx.append(f)
                    frames.append(b[off : off + frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": fidx, "frame": frames}
            )

    return df.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, frame_idx int, frame binary"
    )


def frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling made oracle-verifiable -> ``(doc_id, frame_idx,
    byte_sum, byte_min, byte_max)``: the PPM payload corpus runs
    through the REAL :func:`sample_frames` fan-out (4 evenly-spaced
    32-byte windows per payload — the video frame-sampling shape), and
    a second Arrow kernel reduces each frame to exact integer byte
    statistics.  The DuckDB twin reconstructs every sampled byte from
    first principles — header chars by string position, body bytes from
    the md5 chain — so the offset arithmetic of the sampler itself is
    hash-gated, not just its schema.

    Scale shape: two chained narrow Arrow maps (synthesize+slice, then
    reduce), zero shuffle; output is n_frames rows per doc."""
    frames = sample_frames(with_binary_payload(spark, sf_dir))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mats = np.frombuffer(
                b"".join(bytes(f) for f in pdf["frame"]), dtype=np.uint8
            ).reshape(len(pdf), -1).astype(np.int64)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "frame_idx": pdf["frame_idx"].values,
                "byte_sum": mats.sum(axis=1),
                "byte_min": mats.min(axis=1),
                "byte_max": mats.max(axis=1),
            })

    return frames.mapInPandas(
        stats,
        schema=(
            "doc_id long, frame_idx int, byte_sum long, "
            "byte_min long, byte_max long"
        ),
    ).select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "byte_sum", "byte_min", "byte_max",
    )


RESIZE_W = 8
RESIZE_H = 8


def resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize made oracle-verifiable -> ``(doc_id, channel, px_sum,
    px_min, px_max)``: the payload corpus through the REAL
    :func:`resize_images` (decode -> nearest-neighbor index-sample ->
    re-encode PPM) at 8x8, then the resized payloads decoded again and
    reduced to exact per-channel stats.  The DuckDB twin re-derives
    each of the 8x8x3 sampled pixels from the md5 chain via the same
    index map ``src = ((y*h)//8*W + (x*W)//8)*3 + c`` — so both the
    resize sampling arithmetic AND the encode/decode round-trip are
    value-hash gated.  Two narrow Arrow maps, zero shuffle."""
    resized = resize_images(
        with_binary_payload(spark, sf_dir),
        width=RESIZE_W, height=RESIZE_H,
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, chans, sums, mins, maxs = [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["resized"]):
                img = decode_image(bytes(p)).astype(np.int64)
                for c in range(3):
                    ch = img[:, :, c]
                    ids.append(doc_id)
                    chans.append(c)
                    sums.append(int(ch.sum()))
                    mins.append(int(ch.min()))
                    maxs.append(int(ch.max()))
            yield pd.DataFrame({
                "doc_id": ids, "channel": chans, "px_sum": sums,
                "px_min": mins, "px_max": maxs,
            })

    return resized.mapInPandas(
        stats,
        schema=(
            "doc_id long, channel int, px_sum long, "
            "px_min long, px_max long"
        ),
    ).select(
        "doc_id",
        F.col("channel").cast("long").alias("channel"),
        "px_sum", "px_min", "px_max",
    )


RESIZE_STATS_SQL = f"""
WITH d AS (
  SELECT doc_id, {PPM_H_BASE} + doc_id % {PPM_H_MOD} AS h FROM documents
),
px AS (
  SELECT d.doc_id, c.c AS channel,
         ((y.y * d.h) // {RESIZE_H} * {PPM_W}
          + (x.x * {PPM_W}) // {RESIZE_W}) * 3 + c.c AS i
  FROM d
  JOIN generate_series(0, {RESIZE_H - 1}) y(y) ON TRUE
  JOIN generate_series(0, {RESIZE_W - 1}) x(x) ON TRUE
  JOIN generate_series(0, 2) c(c) ON TRUE
),
byt AS (
  SELECT doc_id, channel,
         CAST('0x' || substr(
           md5('px:' || CAST(doc_id AS VARCHAR) || ':'
               || CAST(i // {_MD5_LEN} AS VARCHAR)),
           CAST(2 * (i % {_MD5_LEN}) + 1 AS INT), 2) AS BIGINT) AS v
  FROM px
)
SELECT doc_id, channel,
       CAST(SUM(v) AS BIGINT) AS px_sum,
       CAST(MIN(v) AS BIGINT) AS px_min,
       CAST(MAX(v) AS BIGINT) AS px_max
FROM byt GROUP BY doc_id, channel
"""


# oracle: re-derive each sampled byte by payload offset — header chars
# (the 12/13-byte "P6\n16 {h}\n255\n" text) by string position, body
# bytes from the md5 chain; frame f starts at ((plen-32)*f)//3
FRAME_STATS_SQL = f"""
WITH d AS (
  SELECT doc_id, {PPM_H_BASE} + doc_id % {PPM_H_MOD} AS h FROM documents
),
geo AS (
  SELECT doc_id, h,
         'P6' || chr(10) || '{PPM_W} ' || CAST(h AS VARCHAR)
              || chr(10) || '255' || chr(10) AS hdr
  FROM d
),
g2 AS (
  SELECT doc_id, h, hdr,
         CAST(length(hdr) AS BIGINT) AS hl,
         CAST(length(hdr) + 3 * {PPM_W} * h AS BIGINT) AS plen
  FROM geo
),
pos AS (
  SELECT g2.doc_id, CAST(fr.f AS BIGINT) AS frame_idx, g2.hdr, g2.hl,
         ((g2.plen - 32) * fr.f) // 3 + k.k AS p
  FROM g2
  JOIN generate_series(0, 3) fr(f) ON TRUE
  JOIN generate_series(0, 31) k(k) ON TRUE
),
byt AS (
  SELECT doc_id, frame_idx,
         CASE WHEN p < hl
              THEN ascii(substr(hdr, CAST(p + 1 AS INT), 1))
              ELSE CAST('0x' || substr(
                     md5('px:' || CAST(doc_id AS VARCHAR) || ':'
                         || CAST((p - hl) // {_MD5_LEN} AS VARCHAR)),
                     CAST(2 * ((p - hl) % {_MD5_LEN}) + 1 AS INT), 2)
                   AS BIGINT)
         END AS v
  FROM pos
)
SELECT doc_id, frame_idx,
       CAST(SUM(v) AS BIGINT) AS byte_sum,
       CAST(MIN(v) AS BIGINT) AS byte_min,
       CAST(MAX(v) AS BIGINT) AS byte_max
FROM byt GROUP BY doc_id, frame_idx
"""


# ------------------------------------------------- audio (WAV) features

AUDIO_BLOCKS_BASE = 4   # md5 blocks per doc: 4 + doc_id % 5
AUDIO_BLOCKS_MOD = 5
AUDIO_RATE = 16000


def with_audio_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach a REAL RIFF/WAVE PCM16 payload per document: int16
    samples derived from an md5 chain (8 samples per md5 block,
    4 + doc_id % 5 blocks), run through the real :func:`encode_wav`.
    Narrow Arrow-batched map; the sample STREAM (not the container
    bytes) is what the DuckDB twin reconstructs, so the oracle never
    needs to model RIFF byte order."""
    import hashlib

    # repartition the doc list: the single-file documents scan is one
    # partition, which would serialize the Arrow synth/decode maps and
    # the staged payload files on one core (round-9 fix)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = []
            for doc_id in pdf["doc_id"]:
                nb = AUDIO_BLOCKS_BASE + int(doc_id) % AUDIO_BLOCKS_MOD
                vals = []
                for t in range(nb):
                    h = hashlib.md5(
                        f"au:{int(doc_id)}:{t}".encode()
                    ).hexdigest()
                    vals.extend(
                        int(h[4 * k : 4 * k + 4], 16) - 32768
                        for k in range(8)
                    )
                payloads.append(
                    encode_wav(
                        np.asarray(vals, dtype=np.int16), AUDIO_RATE
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.mapInPandas(synth, schema="doc_id long, payload binary")


def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every WAV payload with the REAL RIFF parser and emit
    per-doc sample statistics ``(doc_id, n_samples, sample_rate, peak,
    mean, rms)`` — exact int64 (sum, sum_sq, max|v|) partials from the
    decoded int16 stream; mean/rms derived to mirror the oracle's
    double arithmetic term for term.  Zero shuffle (decode + 5 ints
    per doc in one narrow map)."""
    b = with_audio_payload(spark, sf_dir)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, ns, rates, peaks, sums, sqs = [], [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                samples, rate = decode_wav(bytes(p))
                v = samples.astype(np.int64).ravel()
                ids.append(doc_id)
                ns.append(len(v))
                rates.append(rate)
                peaks.append(int(np.abs(v).max()))
                sums.append(int(v.sum()))
                sqs.append(int((v * v).sum()))
            yield pd.DataFrame(
                {"doc_id": ids, "n": ns, "rate": rates, "peak": peaks,
                 "s": sums, "s2": sqs}
            )

    part = b.mapInPandas(
        stats,
        schema=(
            "doc_id long, n long, rate long, peak long, s long, s2 long"
        ),
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    s2 = F.col("s2").cast("double")
    return part.select(
        "doc_id",
        F.col("n").alias("n_samples"),
        F.col("rate").alias("sample_rate"),
        F.col("peak").alias("peak"),
        F.round(s / n, 6).alias("mean"),
        F.round(F.sqrt(s2 / n), 6).alias("rms"),
    )


AUDIO_FEATURES_SQL = f"""
WITH d AS (
  SELECT doc_id,
         {AUDIO_BLOCKS_BASE} + doc_id % {AUDIO_BLOCKS_MOD} AS nb
  FROM documents
),
blocks AS (
  SELECT d.doc_id, s.t,
         md5('au:' || CAST(d.doc_id AS VARCHAR) || ':'
             || CAST(s.t AS VARCHAR)) AS h
  FROM d
  JOIN generate_series(0, {AUDIO_BLOCKS_BASE + AUDIO_BLOCKS_MOD - 1}) s(t)
    ON s.t < d.nb
),
samples AS (
  SELECT b.doc_id,
         CAST('0x' || substring(b.h, 4 * g.k + 1, 4) AS BIGINT)
         - 32768 AS v
  FROM blocks b JOIN generate_series(0, 7) g(k) ON TRUE
)
SELECT doc_id,
       COUNT(*) AS n_samples,
       CAST({AUDIO_RATE} AS BIGINT) AS sample_rate,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mean,
       ROUND(SQRT(CAST(SUM(v * v) AS DOUBLE) / COUNT(*)), 6) AS rms
FROM samples GROUP BY doc_id
"""
