"""GIF89a codec (LZW dictionary coding), dependency-free, plus the
gated animated-corpus query.

This adds the one compression family the codec matrix did not yet
carry: **dictionary coding**.  PNG rides DEFLATE (via zlib), JPEG is
DCT + Huffman, FLAC is Rice + LPC, ADPCM is DPCM — GIF's
variable-width LZW is a genuinely different decoder shape (a code
table that grows as it is read, with mid-stream width changes and
resets), and it is the format every animation/sticker/meme corpus is
full of, so a training-data pipeline meets it constantly.

From scratch here:

- **LZW** (:func:`lzw_encode` / :func:`lzw_decode`): the GIF variant —
  LSB-first bit packing, clear/EOI control codes, code width growing
  9->12 bits, dictionary reset at 4095 entries.  The width-change
  bookkeeping follows the de-facto standard pairing every GIF codec
  interoperates on (the encoder checks its next-assignable code
  *after* emitting, the decoder bumps a per-code-read counter), which
  is the part naive LZW implementations get subtly wrong.  The decoder
  is strict: invalid codes, a non-root first code, pixel overrun,
  truncation, nonzero pad bits after EOI, and trailing bytes all
  raise.
- **Container** (:func:`encode_gif` / :func:`decode_gif`): logical
  screen descriptor, global + per-frame local color tables, graphic
  control extensions (frame delays), the NETSCAPE2.0 loop extension,
  interlaced scan-order (the 8/8/4/2 four-pass scheme), sub-block
  framing, trailer.  Unknown extensions are skipped by the sub-block
  rule (as a real ingester must), but everything parsed is validated:
  GCE reserved bits, block sizes, index-vs-palette bounds, exact pixel
  counts, orphaned GCEs, bytes after the trailer.

GIF has NO checksums, so unlike FLAC the format itself detects
nothing — detection comes entirely from the parser's structural
strictness; the corruption fuzz in ``tests/test_gif.py`` pins that
every single-byte flip either raises or changes the decoded output
(indices, palette, or metadata — all of which the decoder exposes).

Hash-parity strategy: GIF is lossless over palette indices, so the
gate corpus needs no exactness subdomain (unlike JPEG) — frame pixels
are md5-chain bytes, and the DuckDB oracle replays the formula with
zero codec math.  Palette indirection is made load-bearing by giving
odd frames a REVERSED local palette with complemented indices (the
decoded gray value only matches the formula if the local table is
actually applied), interlacing odd frames makes the de-interlace
permutation load-bearing through a position-weighted checksum
(``wsum`` — an order-invariant mean would not see a row shuffle), and
frame delays/loop count gate the extension parsing.

Scale shape: synthesis and decode are narrow Arrow-batched maps over
payloads staged once per session (staging.py) — zero shuffle, decode
cost linear in bytes, embarrassingly parallel.  (No analog in the
reference — its surface is ML operators, ref:gemm_map_reduce.py:1;
this belongs to the training-data-pipeline tier of the brief.)
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

LZW_MAX_CODE = 4095  # 12-bit code space; slot 4095 triggers the reset


# ------------------------------------------------------------------ LZW

def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: ``data`` (one byte per pixel index, each
    ``< 2**min_code_size``) -> packed code stream (no sub-block
    framing — the container layer chunks it).

    Emits an initial clear code, grows the code width whenever the
    next assignable slot stops fitting (checked after each emit, so
    the decoder's per-read counter stays in lockstep), and emits a
    clear + full reset when the table reaches slot 4095."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    running = eoi + 1          # next assignable slot
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits, width
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        # width change takes effect for the NEXT code: once the slot
        # counter reaches the current capacity, codes referencing the
        # new entries need one more bit
        if running >= (1 << width) and width < 12:
            width += 1

    table: dict[tuple[int, int], int] = {}
    emit(clear)
    prefix = -1
    for b in data:
        if b >= clear:
            raise ValueError(f"pixel index {b} exceeds {clear - 1}")
        if prefix < 0:
            prefix = b
            continue
        key = (prefix, b)
        code = table.get(key)
        if code is not None:
            prefix = code
            continue
        emit(prefix)
        if running >= LZW_MAX_CODE:
            emit(clear)
            table.clear()
            running = eoi + 1
            width = min_code_size + 1
        else:
            table[key] = running
            running += 1
        prefix = b
    if prefix >= 0:
        emit(prefix)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)  # zero-padded final byte
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytes:
    """Strict GIF-variant LZW decode -> pixel index bytes.

    Raises on: running out of bytes before EOI, an invalid (not yet
    assigned) code, a non-root first code after clear, more than
    ``max_pixels`` output bytes, nonzero pad bits after EOI, or
    whole trailing bytes after EOI."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    running = eoi + 1          # per-code-read counter (width lockstep)
    next_entry = eoi + 1       # next table slot
    table: dict[int, bytes] = {}
    out = bytearray()
    last: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("LZW stream ended before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        running += 1
        if running > (1 << width) and width < 12:
            width += 1
        if code == eoi:
            break
        if code == clear:
            width = min_code_size + 1
            running = eoi + 1
            next_entry = eoi + 1
            table.clear()
            last = None
            continue
        if last is None:
            if code >= clear:
                raise ValueError("first code after clear is not a root")
            entry = bytes([code])
        elif code < clear:
            entry = bytes([code])
        elif code < next_entry:
            entry = table[code]
        elif code == next_entry and next_entry <= LZW_MAX_CODE:
            entry = last + last[:1]  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError("LZW output exceeds the declared pixel count")
        if last is not None and next_entry <= LZW_MAX_CODE:
            table[next_entry] = last + entry[:1]
            next_entry += 1
        last = entry
    if acc != 0:
        raise ValueError("nonzero pad bits after EOI")
    if pos != n:
        raise ValueError(f"{n - pos} trailing LZW bytes after EOI")
    return bytes(out)


# ------------------------------------------------------------ interlace

def interlace_order(h: int) -> list[int]:
    """GIF 4-pass interlace: the source row written as scanline i."""
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


# ------------------------------------------------------------- encoder

def _palette_bytes(palette: np.ndarray) -> tuple[bytes, int]:
    p = np.asarray(palette, dtype=np.uint8)
    if p.ndim != 2 or p.shape[1] != 3:
        raise ValueError("palette must be Nx3")
    n = p.shape[0]
    bits = max(1, (n - 1).bit_length())
    if n != 1 << bits or not 2 <= n <= 256:
        raise ValueError(f"palette size {n} must be a power of two in 2..256")
    return p.tobytes(), bits


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray],
    *,
    palette: np.ndarray,
    delays_cs: list[int] | None = None,
    local_palettes: list[np.ndarray | None] | None = None,
    interlace: list[bool] | None = None,
    loop: int | None = None,
    bg: int = 0,
    aspect: int = 0,
) -> bytes:
    """Index frames (uint8 ``(h, w)`` arrays, all the same shape) ->
    GIF89a bytes: global palette, optional NETSCAPE2.0 loop extension,
    per-frame GCE (when ``delays_cs`` given), optional per-frame local
    palettes and interlacing."""
    if not frames:
        raise ValueError("empty frame list")
    h, w = frames[0].shape
    nf = len(frames)
    delays = delays_cs if delays_cs is not None else [None] * nf
    locals_ = local_palettes if local_palettes is not None else [None] * nf
    inter = interlace if interlace is not None else [False] * nf
    if not nf == len(delays) == len(locals_) == len(inter):
        raise ValueError("per-frame argument lengths disagree")
    gpal, gbits = _palette_bytes(palette)
    out = bytearray(b"GIF89a")
    out += struct.pack(
        "<HHBBB", w, h, 0x80 | ((8 - 1) << 4) | (gbits - 1), bg, aspect
    )
    out += gpal
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0" + struct.pack(
            "<BBH", 3, 1, loop
        ) + b"\x00"
    for fr, delay, lpal, il in zip(frames, delays, locals_, inter):
        fr = np.asarray(fr, dtype=np.uint8)
        if fr.shape != (h, w):
            raise ValueError("all frames must match the logical screen")
        if delay is not None:
            out += b"\x21\xf9" + struct.pack("<BBHB", 4, 0, delay, 0) + b"\x00"
        if lpal is not None:
            lbytes, lbits = _palette_bytes(lpal)
            packed = 0x80 | (0x40 if il else 0) | (lbits - 1)
            n_colors = 1 << lbits
        else:
            lbytes, lbits = b"", gbits
            packed = 0x40 if il else 0
            n_colors = 1 << gbits
        if int(fr.max(initial=0)) >= n_colors:
            raise ValueError("frame index exceeds its palette")
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, packed)
        out += lbytes
        scan = fr[interlace_order(h), :] if il else fr
        mcs = max(2, lbits)
        out.append(mcs)
        out += _sub_blocks(lzw_encode(scan.tobytes(), mcs))
    out.append(0x3B)
    return bytes(out)


# ------------------------------------------------------------- decoder

def _read_sub_blocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(buf):
            raise ValueError("sub-block chain ran off the payload")
        n = buf[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(buf):
            raise ValueError("truncated sub-block")
        out += buf[pos : pos + n]
        pos += n


def decode_gif(payload: bytes) -> tuple[list[dict], dict]:
    """GIF87a/89a bytes -> ``(frames, meta)``.

    Each frame dict: ``indices`` ((h, w) uint8, de-interlaced),
    ``palette`` ((N, 3) uint8 — local if present, else global),
    ``local_palette`` (bool), ``interlaced`` (bool), ``left``/``top``,
    ``delay_cs``/``disposal``/``transparent_idx`` (from the GCE, None
    if absent).  ``meta``: ``width height n_frames loop bg_index
    aspect color_resolution sort_flag version``.

    Frames are returned raw (no inter-frame compositing/disposal —
    this tier extracts per-frame pixels for feature kernels, it is not
    a renderer).  Raises ``ValueError`` on any structural violation
    (module docstring lists the checks)."""
    if len(payload) < 13:
        raise ValueError("payload too short for a GIF header")
    version = payload[:6]
    if version not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"bad GIF magic {version!r}")
    sw, sh, packed, bg, aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gpal = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated global color table")
        gpal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        gpal = gpal.reshape(n, 3).copy()
        pos += 3 * n
    if bg >= (gpal.shape[0] if gpal is not None else 0) and bg != 0:
        raise ValueError("background index outside the global table")
    frames: list[dict] = []
    loop = None
    gce: dict | None = None
    done = False
    while not done:
        if pos >= len(payload):
            raise ValueError("payload ended without a trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            done = True
        elif block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                if gce is not None:
                    raise ValueError("two GCEs before one image")
                body, pos = _read_sub_blocks(payload, pos)
                if len(body) != 4:
                    raise ValueError("GCE block size must be 4")
                gpk, delay, tidx = struct.unpack("<BHB", body)
                if gpk & 0xE0:
                    raise ValueError("GCE reserved bits set")
                if not (gpk & 0x01) and tidx != 0:
                    # strict-ingest rule: with the transparency flag
                    # clear this byte is dead space — GIF has no CRCs,
                    # so the parser leaves no silently-ignored bytes
                    raise ValueError(
                        "transparent index set without the flag"
                    )
                gce = {
                    "delay_cs": delay,
                    "disposal": (gpk >> 2) & 0x07,
                    "transparent_idx": tidx if gpk & 0x01 else None,
                }
            elif label == 0xFF:  # application
                body, pos = _read_sub_blocks(payload, pos)
                if body[:11] == b"NETSCAPE2.0":
                    if len(body) != 14 or body[11] != 1:
                        raise ValueError("malformed NETSCAPE loop block")
                    loop = int.from_bytes(body[12:14], "little")
                # other applications: skipped (already consumed)
            else:  # comment / plain text / unknown: skip by sub-blocks
                _body, pos = _read_sub_blocks(payload, pos)
        elif block == 0x2C:  # image descriptor
            left, top, w, h, ipk = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if left + w > sw or top + h > sh or w == 0 or h == 0:
                raise ValueError("frame rectangle outside the screen")
            interlaced = bool(ipk & 0x40)
            if ipk & 0x80:
                n = 1 << ((ipk & 0x07) + 1)
                if pos + 3 * n > len(payload):
                    raise ValueError("truncated local color table")
                pal = np.frombuffer(payload[pos : pos + 3 * n], np.uint8)
                pal = pal.reshape(n, 3).copy()
                pos += 3 * n
                local = True
            else:
                if gpal is None:
                    raise ValueError("no color table for this frame")
                pal, local = gpal, False
            if pos >= len(payload):
                raise ValueError("truncated image data")
            mcs = payload[pos]
            pos += 1
            data, pos = _read_sub_blocks(payload, pos)
            idx = lzw_decode(data, mcs, w * h)
            if len(idx) != w * h:
                raise ValueError(
                    f"decoded {len(idx)} pixels, expected {w * h}"
                )
            arr = np.frombuffer(idx, dtype=np.uint8).reshape(h, w)
            if int(arr.max()) >= pal.shape[0]:
                raise ValueError("pixel index outside the color table")
            if interlaced:
                out = np.empty_like(arr)
                out[interlace_order(h), :] = arr
                arr = out
            fr = {
                "indices": arr,
                "palette": pal,
                "local_palette": local,
                "interlaced": interlaced,
                "left": left,
                "top": top,
                "delay_cs": None,
                "disposal": None,
                "transparent_idx": None,
            }
            if gce is not None:
                fr.update(gce)
                gce = None
            frames.append(fr)
        else:
            raise ValueError(f"unknown block introducer 0x{block:02x}")
    if gce is not None:
        raise ValueError("orphaned GCE before the trailer")
    if pos != len(payload):
        raise ValueError(f"{len(payload) - pos} bytes after the trailer")
    if not frames:
        raise ValueError("no image blocks")
    return frames, {
        "width": sw,
        "height": sh,
        "n_frames": len(frames),
        "loop": loop,
        "bg_index": bg,
        "aspect": aspect,
        "color_resolution": ((packed >> 4) & 0x07) + 1,
        "sort_flag": bool(packed & 0x08),
        "version": version[3:].decode(),
    }


# ---------------------------------------------------- gated corpus query

GIF_W = 16
GIF_H_BASE = 16      # frame height: 16 + 8 * (doc_id % 3) -> 16/24/32
GIF_H_MOD = 3        # (the 512-px tall variant crosses into 10-bit codes,
GIF_H_STEP = 8       #  so the width-change path is load-bearing in the gate)
GIF_FRAMES_BASE = 3  # frames per doc: 3 + doc_id % 4
GIF_FRAMES_MOD = 4
GIF_DELAY_MOD = 7    # per-frame delay: 1 + doc_id % 7 centiseconds
GIF_LOOP_MOD = 5     # NETSCAPE loop count: doc_id % 5

_GRAY = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
_GRAY_REV = _GRAY[::-1].copy()


def _gif_frame_values(doc_id: int, f: int, h: int) -> np.ndarray:
    """Gray value of pixel p (row-major) = byte p%16 of
    md5('gf:doc:frame:p//16') — one digest per 16-pixel block, i.e.
    one per row at GIF_W=16."""
    raw = b"".join(
        hashlib.md5(f"gf:{doc_id}:{f}:{b}".encode()).digest()
        for b in range(h * GIF_W // 16)
    )
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, GIF_W).copy()


def with_gif_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach a REAL animated GIF89a payload per document (narrow
    Arrow-batched map): 3-6 md5-chain frames, odd frames interlaced
    with a reversed local palette over complemented indices, GCE
    delays, NETSCAPE loop."""
    # repartition the doc list: the single-file documents scan is one
    # partition, which would serialize the Arrow synth map on one core
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
            for d in pdf["doc_id"]:
                doc_id = int(d)
                h = GIF_H_BASE + GIF_H_STEP * (doc_id % GIF_H_MOD)
                nf = GIF_FRAMES_BASE + doc_id % GIF_FRAMES_MOD
                delay = 1 + doc_id % GIF_DELAY_MOD
                frames, lpals, inter = [], [], []
                for f in range(nf):
                    v = _gif_frame_values(doc_id, f, h)
                    if f % 2:  # palette indirection is load-bearing:
                        frames.append(255 - v)  # index i -> gray 255-i
                        lpals.append(_GRAY_REV)
                        inter.append(True)
                    else:
                        frames.append(v)
                        lpals.append(None)
                        inter.append(False)
                payloads.append(
                    encode_gif(
                        frames,
                        palette=_GRAY,
                        delays_cs=[delay] * nf,
                        local_palettes=lpals,
                        interlace=inter,
                        loop=doc_id % GIF_LOOP_MOD,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.mapInPandas(synth, schema="doc_id long, payload binary")


def gif_anim_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every animated GIF -> one row per frame: ``(doc_id,
    frame_idx, n_frames, delay_cs, loop_count, n_px, wsum, mean,
    std)``.

    What the hash gates: the LZW decode itself (values), the 9->10 bit
    width change (the 512-px docs), the de-interlace permutation and
    local-palette application (``wsum`` is position- and palette-
    sensitive), and the GCE/NETSCAPE extension parse (``delay_cs`` /
    ``loop_count``).  Zero shuffle — one narrow Arrow-batched map over
    payloads staged to session-local parquet, so the timed query is
    pure decode."""
    from gemmsql.pipeline.staging import stage_payload_table

    b = stage_payload_table(spark, sf_dir, "gif", with_gif_payload)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "fi", "nf", "delay", "loop", "n", "w", "s", "s2"
                )
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                frames, meta = decode_gif(bytes(p))
                for i, fr in enumerate(frames):
                    gray = fr["palette"][fr["indices"], 0].astype(np.int64)
                    flat = gray.ravel()
                    rows["doc_id"].append(doc_id)
                    rows["fi"].append(i)
                    rows["nf"].append(meta["n_frames"])
                    rows["delay"].append(fr["delay_cs"])
                    rows["loop"].append(meta["loop"])
                    rows["n"].append(flat.size)
                    rows["w"].append(
                        int(np.dot(np.arange(flat.size, dtype=np.int64), flat))
                    )
                    rows["s"].append(int(flat.sum()))
                    rows["s2"].append(int((flat * flat).sum()))
            yield pd.DataFrame(rows)

    part = b.mapInPandas(
        stats,
        schema=(
            "doc_id long, fi long, nf long, delay long, loop long,"
            " n long, w long, s long, s2 long"
        ),
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    s2 = F.col("s2").cast("double")
    return part.select(
        "doc_id",
        F.col("fi").alias("frame_idx"),
        F.col("nf").alias("n_frames"),
        F.col("delay").alias("delay_cs"),
        F.col("loop").alias("loop_count"),
        F.col("n").alias("n_px"),
        F.col("w").alias("wsum"),
        F.round(s / n, 6).alias("mean"),
        F.round(F.sqrt((s2 - s * s / n) / n), 6).alias("std"),
    )


# oracle: pixel p of frame f of doc d is byte p%16 of
# md5('gf:d:f:p//16'); the codec is lossless, so no decoder math
# appears — palette/interlace tricks cancel by construction.
GIF_ANIM_FEATURES_SQL = f"""
WITH d AS (
  SELECT doc_id,
         {GIF_H_BASE} + {GIF_H_STEP} * (doc_id % {GIF_H_MOD}) AS h,
         {GIF_FRAMES_BASE} + doc_id % {GIF_FRAMES_MOD} AS nf,
         1 + doc_id % {GIF_DELAY_MOD} AS delay,
         doc_id % {GIF_LOOP_MOD} AS loop_count
  FROM documents
),
fr AS (
  SELECT d.*, s.f
  FROM d
  JOIN generate_series(0, {GIF_FRAMES_BASE + GIF_FRAMES_MOD - 2}) s(f)
    ON s.f < d.nf
),
px AS (
  SELECT fr.doc_id, fr.f, fr.nf, fr.delay, fr.loop_count,
         16 * sb.blk + bi.i AS p,
         CAST('0x' || substr(
           md5('gf:' || CAST(fr.doc_id AS VARCHAR) || ':'
               || CAST(fr.f AS VARCHAR) || ':'
               || CAST(sb.blk AS VARCHAR)),
           2 * bi.i + 1, 2) AS BIGINT) AS v
  FROM fr
  JOIN generate_series(0, {(GIF_H_BASE + GIF_H_STEP * (GIF_H_MOD - 1)) - 1})
       sb(blk) ON sb.blk < fr.h
  JOIN generate_series(0, 15) bi(i) ON TRUE
),
agg AS (
  SELECT doc_id, f, nf, delay, loop_count,
         CAST(COUNT(*) AS BIGINT) AS n_px,
         SUM(v) AS s, SUM(v * v) AS s2, SUM(p * v) AS w
  FROM px GROUP BY 1, 2, 3, 4, 5
)
SELECT doc_id,
  CAST(f AS BIGINT) AS frame_idx,
  CAST(nf AS BIGINT) AS n_frames,
  CAST(delay AS BIGINT) AS delay_cs,
  CAST(loop_count AS BIGINT) AS loop_count,
  n_px,
  CAST(w AS BIGINT) AS wsum,
  ROUND(CAST(s AS DOUBLE) / CAST(n_px AS DOUBLE), 6) AS mean,
  ROUND(SQRT((CAST(s2 AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n_px AS DOUBLE))
             / CAST(n_px AS DOUBLE)), 6) AS std
FROM agg
"""
