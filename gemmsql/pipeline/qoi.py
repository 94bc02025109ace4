"""QOI image codec from scratch — the tenth dependency-free codec,
and the byte-op compression family (run/index/delta ops over a
rolling 64-color hash table).

Built from the public QOI specification (qoiformat.org, "Quite OK
Image format", public domain): a 14-byte header (``qoif`` magic,
big-endian u32 width/height, channels, colorspace), then one op per
pixel chosen greedily —

- ``QOI_OP_RUN``   (0b11xxxxxx): 1..62 repeats of the previous pixel;
- ``QOI_OP_INDEX`` (0b00xxxxxx): a hit in the 64-entry rolling table
  indexed by ``(3r + 5g + 7b + 11a) % 64``;
- ``QOI_OP_DIFF``  (0b01rrggbb): per-channel deltas in -2..1, biased
  by 2, with mod-256 wraparound;
- ``QOI_OP_LUMA``  (0b10gggggg + byte): green delta -32..31 biased 32,
  red/blue deltas RELATIVE TO GREEN in -8..7 biased 8;
- ``QOI_OP_RGB``   (0xFE): literal bytes when nothing smaller fits;

closed by the 8-byte end marker ``\\x00*7 + \\x01``.  Tag precedence
matters: 0xFE/0xFF are the two reserved values of the RUN tag space,
so runs cap at 62 — the decoder must check the 8-bit tags BEFORE the
2-bit ones, and this parser does, strictly (bad magic, truncation,
pixel under/overflow, and a missing end marker all raise).

The gate corpus is a CUMULATIVE-DELTA pixel stream (each channel is
a running sum of per-step deltas in -1..2 derived from the md5
chain, mod 256), which drives the decoder through DIFF, LUMA and RUN
on nearly every pixel — a noise corpus would exercise only the RGB
literal.  The DuckDB oracle reconstructs the same pixels with a
windowed running sum over ``generate_series``, so the compressed
container stays invisible to it: ``decode(encode(img)) == img``
exactly, and any op mis-decode moves the value hash.

Scale shape: synthesis/encode is staged once (`staging.py`); the
timed query is ONE narrow Arrow-batched decode map, zero shuffle —
payload bytes never leave the partition that read them.

(No analog in the reference — its surface is ML operators,
ref:gemm_map_reduce.py:1; this extends the brief's multimodal tier.)
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
from gemmsql.pipeline.multimodal import (
    _MD5_LEN,
    PPM_H_BASE,
    PPM_H_MOD,
    PPM_W,
)

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"

_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array per the QOI spec (alpha fixed
    at 255; the RGBA op is decoded but never emitted here)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8")
    h, w = img.shape[:2]
    out = bytearray()
    out += _MAGIC + struct.pack(">II", w, h) + bytes([3, 0])
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = img.reshape(-1, 3)
    for r, g, b in flat:
        r, g, b = int(r), int(g), int(b)
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:           # 63/64 are the RGB/RGBA tags
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        ih = _hash(r, g, b, 255)
        if index[ih] == (r, g, b, 255):
            out.append(_OP_INDEX | ih)
        else:
            index[ih] = (r, g, b, 255)
            dr = (r - pr + 128) % 256 - 128   # wraparound deltas
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(
                    _OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                )
            elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                  and -8 <= db - dg <= 7):
                out.append(_OP_LUMA | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes([_OP_RGB, r, g, b])
        pr, pg, pb = r, g, b
    if run:
        out.append(_OP_RUN | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(data: bytes) -> np.ndarray:
    """Strict QOI decode -> (H, W, 3) uint8.  8-bit tags (RGB/RGBA)
    are checked before the 2-bit tag space; pixel overflow, underrun,
    truncation and a wrong end marker all raise."""
    if len(data) < 14 + len(_END) or data[:4] != _MAGIC:
        raise ValueError("not a QOI stream")
    w, h = struct.unpack(">II", data[4:12])
    channels, _cs = data[12], data[13]
    if channels not in (3, 4):
        raise ValueError(f"bad channel count {channels}")
    n_px = w * h
    out = np.empty((n_px, 3), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, px = 14, 0
    end_at = len(data) - len(_END)
    while px < n_px:
        if pos >= end_at:
            raise ValueError("pixel underrun: stream ended early")
        byte = data[pos]
        pos += 1
        # operand bytes must also sit before the end marker — a
        # multi-byte op starting at end_at-1 may not read into the
        # end-marker region or past the buffer (ADVICE r12 #5)
        if byte == _OP_RGB:
            if pos + 3 > end_at:
                raise ValueError("pixel underrun: stream ended early")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == _OP_RGBA:
            if pos + 4 > end_at:
                raise ValueError("pixel underrun: stream ended early")
            r, g, b, a = (data[pos], data[pos + 1], data[pos + 2],
                          data[pos + 3])
            pos += 4
        else:
            tag = byte & 0xC0
            if tag == _OP_INDEX:
                r, g, b, a = index[byte & 0x3F]
                out[px] = (r, g, b)
                index[_hash(r, g, b, a)] = (r, g, b, a)
                px += 1
                continue
            if tag == _OP_DIFF:
                r = (r + ((byte >> 4) & 3) - 2) % 256
                g = (g + ((byte >> 2) & 3) - 2) % 256
                b = (b + (byte & 3) - 2) % 256
            elif tag == _OP_LUMA:
                dg = (byte & 0x3F) - 32
                if pos + 1 > end_at:
                    raise ValueError("pixel underrun: stream ended early")
                nxt = data[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0xF) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nxt & 0xF) - 8) % 256
            else:  # _OP_RUN
                run = (byte & 0x3F) + 1
                if px + run > n_px:
                    raise ValueError("run overflows the pixel count")
                out[px:px + run] = (r, g, b)
                px += run
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[px] = (r, g, b)
        px += 1
    if data[pos:pos + len(_END)] != _END:
        raise ValueError("missing or misplaced end marker")
    if pos + len(_END) != len(data):
        raise ValueError("trailing bytes after end marker")
    return out.reshape(h, w, 3)


# ----------------------------------------------------------- the gate

def _qoi_pixels(doc_id: int) -> np.ndarray:
    """The cumulative-delta pixel stream: per channel, a running sum
    (mod 256) of per-pixel deltas in -1..2 read from the ``qi:`` md5
    chain — byte i drives channel i%3 at pixel i//3, the same
    interleave as every payload tier."""
    h = PPM_H_BASE + doc_id % PPM_H_MOD
    n_tiles = (PPM_W * h * 3) // _MD5_LEN
    body = b"".join(
        hashlib.md5(f"qi:{doc_id}:{t}".encode()).digest()
        for t in range(n_tiles)
    )
    stream = np.frombuffer(body, dtype=np.uint8).astype(np.int64)
    # byte 255 (~1/256) jumps +101 — past every DIFF/LUMA bound, so
    # the corpus also exercises the RGB literal a few times per doc
    deltas = np.where(stream == 255, 101, stream % 4 - 1)
    img = np.empty((h * PPM_W, 3), dtype=np.uint8)
    for c in range(3):
        img[:, c] = (np.cumsum(deltas[c::3]) % 256).astype(np.uint8)
    return img.reshape(h, PPM_W, 3)


def with_qoi_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach a real QOI payload per document (narrow Arrow map; the
    staging layer materializes this once per sf tier)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [
                encode_qoi(_qoi_pixels(int(d))) for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.mapInPandas(synth, schema="doc_id long, payload binary")


def qoi_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every QOI payload and emit per-(doc, channel) exact
    int64 pixel statistics — the same gate shape as the PNG/JPEG
    tiers: a wrong DIFF bias, LUMA green-relative delta, run length,
    or index hash changes pixels and breaks the hash against the
    oracle's windowed-cumsum reconstruction."""
    from gemmsql.pipeline.staging import stage_payload_table

    b = stage_payload_table(spark, sf_dir, "qoi", with_qoi_payload)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, chans, ns, sums, sqs = [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_qoi(bytes(p)).astype(np.int64)
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


# oracle: the same cumulative-delta stream, rebuilt with a windowed
# running sum — byte i of the qi: chain -> delta (i%4 semantics match
# numpy's), channel i%3, pixel i//3; value = running sum mod 256
QOI_FEATURES_SQL = f"""
WITH d AS (
  SELECT doc_id, {PPM_H_BASE} + doc_id % {PPM_H_MOD} AS h FROM documents
),
raw AS (
  SELECT d.doc_id, s.i % 3 AS channel, s.i // 3 AS px,
         CASE WHEN CAST('0x' || substr(
           md5('qi:' || CAST(d.doc_id AS VARCHAR) || ':'
               || CAST(s.i // {_MD5_LEN} AS VARCHAR)),
           2 * (s.i % {_MD5_LEN}) + 1, 2) AS BIGINT) = 255 THEN 101
         ELSE CAST('0x' || substr(
           md5('qi:' || CAST(d.doc_id AS VARCHAR) || ':'
               || CAST(s.i // {_MD5_LEN} AS VARCHAR)),
           2 * (s.i % {_MD5_LEN}) + 1, 2) AS BIGINT) % 4 - 1
         END AS delta
  FROM d JOIN generate_series(0,
         {PPM_W * 3 * (PPM_H_BASE + PPM_H_MOD - 1) - 1}) s(i)
    ON s.i < {PPM_W} * 3 * d.h
),
px AS (
  SELECT doc_id, channel,
         ((SUM(delta) OVER (PARTITION BY doc_id, channel
                            ORDER BY px) % 256) + 256) % 256 AS v
  FROM raw
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
