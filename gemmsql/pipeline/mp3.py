"""MP3 (MPEG-1 Layer III) frame walker, dependency-free, plus the
gated corpus query.

This retires the codec matrix's last import-gated caveat ("MP3 stays
import-gated").  What a 100 TB audio-curation pipeline needs from MP3
is almost never PCM — it is *metadata at scan speed*: frame counts,
exact duration, bitrate profile, sample rate, channel mode, tag
sizes.  All of that lives in the 4-byte frame headers, and a walker
that hops header-to-header reads a few bytes per frame while
*validating* the whole container structure.  Full Layer III PCM
decode (hybrid filterbank + Huffman spectral data) stays out of
scope — the payload is opaque BY DESIGN here, exactly like
`multimodal.payload_meta`'s never-decode scan.

From scratch, from the public MPEG framing layout:

- **Frame headers**: 11-bit sync, version/layer ids, the MPEG-1
  Layer III bitrate table (32..320 kbps), sample-rate table
  (44.1/48/32 kHz), padding, channel mode; frame size =
  ``144 * bitrate / sample_rate + padding``, 1152 samples per frame.
- **CRC-16 protection**: when the protection bit is 0 a CRC-16
  (poly 0x8005, init 0xFFFF) of the last two header bytes + the
  side-info block (17 bytes mono / 32 stereo) follows the header —
  computed by the encoder, verified by the walker, so corrupting any
  protected side-info byte is detected.
- **Xing/Info VBR header**: in the first frame, after the side info;
  the walker parses the frame/byte counts and CROSS-CHECKS them
  against what the walk actually found — the consistency check a
  real ingester uses to spot truncated uploads.
- **ID3v2** (syncsafe-length skip at the head) and **ID3v1** (128
  bytes at the tail) tags.

Every byte the walker READS is load-bearing: the corruption fuzz in
``tests/test_mp3.py`` flips each structural byte (headers, CRCs,
protected side info, Info counts, tag framing) and requires a raise
or a changed result; payload bytes are exempt because ignoring them
is the operator's contract.

Hash-parity strategy: per-frame bitrate/padding follow a closed-form
(doc_id, frame) formula, so n_frames, total bytes, exact duration
and the kbps profile are all md5-free SQL replays; the CRC path,
Xing cross-check and tag skipping are load-bearing through the
structural validation (a walker that skips them mis-walks and
changes the row).  Scale shape: one narrow Arrow-batched map over
staged payloads — zero shuffle.  (No analog in the reference,
ref:gemm_map_reduce.py:1; training-data-pipeline tier.)
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

# MPEG-1 Layer III tables (public framing spec)
BITRATE_KBPS = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320
)
SAMPLE_RATES = (44100, 48000, 32000)
SAMPLES_PER_FRAME = 1152


def crc16_mp3(data: bytes) -> int:
    """CRC-16 with polynomial 0x8005, init 0xFFFF (the MPEG audio
    protection variant), MSB-first."""
    crc = 0xFFFF
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1)
            crc &= 0xFFFF
    return crc


def frame_size(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    return 144 * bitrate_kbps * 1000 // sample_rate + padding


def _side_info_len(mono: bool) -> int:
    return 17 if mono else 32


def _junk(doc_id: int, tag: str, n: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"mp3:{doc_id}:{tag}:{i}".encode()).digest()
        i += 1
    return bytes(out[:n])


# ------------------------------------------------------------- encoder

def encode_mp3_frames(
    doc_id: int,
    *,
    n_frames: int,
    sr_idx: int,
    mono: bool,
    bitrate_indices: list[int],
    paddings: list[int],
    crc: bool,
    info_frame: bool = True,
    id3v2_junk: int = 0,
    id3v1: bool = False,
) -> bytes:
    """Structurally valid MPEG-1 Layer III stream: optional ID3v2,
    an Info (VBR) first frame carrying the audio frame/byte counts,
    the audio frames (junk payload, real headers/CRCs/side info),
    optional ID3v1 tail tag."""
    sr = SAMPLE_RATES[sr_idx]
    side_len = _side_info_len(mono)
    mode = 0b11 if mono else 0b00

    def frame(bidx: int, pad: int, body_tag: str, info: bytes = b"") -> bytes:
        kbps = BITRATE_KBPS[bidx]
        size = frame_size(kbps, sr, pad)
        hdr = bytes([
            0xFF,
            0xE0 | (0b11 << 3) | (0b01 << 1) | (0 if crc else 1),
            (bidx << 4) | (sr_idx << 2) | (pad << 1),
            (mode << 6) | 0b0100,  # mode ext 01, copyright 0, original 0
        ])
        side = _junk(doc_id, body_tag + ":side", side_len)
        head = hdr + (b"\0\0" if crc else b"") + side
        if crc:
            c = crc16_mp3(hdr[2:4] + side)
            head = hdr + struct.pack(">H", c) + side
        body = info + _junk(
            doc_id, body_tag, size - len(head) - len(info)
        )
        if len(head) + len(info) > size:
            raise ValueError("frame too small for side info + Info tag")
        return head + body

    frames = []
    total_audio = sum(
        frame_size(BITRATE_KBPS[b], sr, p)
        for b, p in zip(bitrate_indices, paddings)
    )
    if info_frame:
        # Info = CBR flavor of the Xing header: flags 0x3 (frames+bytes)
        info = b"Info" + struct.pack(
            ">III", 0x3, n_frames, total_audio
        )
        frames.append(frame(1, 0, "info", info))
    for i in range(n_frames):
        frames.append(frame(bitrate_indices[i], paddings[i], f"f{i}"))
    out = b""
    if id3v2_junk:
        n = id3v2_junk
        out += b"ID3\x04\x00\x00" + bytes([
            (n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F
        ]) + _junk(doc_id, "id3v2", n)
    out += b"".join(frames)
    if id3v1:
        out += b"TAG" + _junk(doc_id, "id3v1", 125)
    return out


# ------------------------------------------------------------- walker

def walk_mp3(payload: bytes, *, collect: list | None = None) -> dict:
    """Header-hopping metadata walk -> dict: ``n_frames`` (audio
    frames), ``sample_rate``, ``channels``, ``crc_frames``,
    ``total_audio_bytes``, ``duration_us`` (exact integer),
    ``kbps_min/kbps_max/kbps_sum``, ``id3v2_size``, ``has_id3v1``,
    ``info_frame`` (bool).  ``collect`` receives per-audio-frame
    ``(offset, size, kbps, pad, protected)`` tuples when given (the
    splittable reader's index hook).

    Validates: sync/version/layer bits per frame, bitrate and sample
    rate indices, CRC-16 over protected side info, Xing/Info counts
    vs the actual walk, tag framing, exact byte consumption, and a
    single sample rate / channel mode across the stream."""
    pos = 0
    end = len(payload)
    id3v2_size = 0
    if payload[:3] == b"ID3":
        if end < 10:
            raise ValueError("truncated ID3v2 header")
        if payload[3] not in (2, 3, 4) or payload[4] != 0:
            # strict-ingest rule: v2.2/2.3/2.4 revision 0 is the
            # universe of real tags; anything else is corruption
            raise ValueError("unsupported ID3v2 version")
        if payload[5] & 0x0F:
            raise ValueError("unsupported ID3v2 flags")
        sz = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise ValueError("ID3v2 size byte is not syncsafe")
            sz = (sz << 7) | b
        id3v2_size = 10 + sz
        pos = id3v2_size
        if pos > end:
            raise ValueError("ID3v2 size exceeds the payload")
    # A tail starting with b"TAG" is only *possibly* an ID3v1 tag —
    # frame payload bytes can collide with it (~2^-24 per doc, ADVICE
    # r9 #2).  Disambiguate structurally: try the tag interpretation
    # first (the common case when the prefix matches), and fall back
    # to walking the full stream if the stripped walk does not parse.
    # The two can never both succeed: a frame boundary at end-128
    # requires a 0xFF sync byte there, which b"TAG" is not.
    tag_tail = end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG"
    if tag_tail:
        try:
            out = _walk_frames(payload, pos, end - 128, collect=collect)
            out["has_id3v1"] = True
        except ValueError:
            out = _walk_frames(payload, pos, end, collect=collect)
            out["has_id3v1"] = False
    else:
        out = _walk_frames(payload, pos, end, collect=collect)
        out["has_id3v1"] = False
    out["id3v2_size"] = id3v2_size
    return out


def _walk_frames(
    payload: bytes,
    pos: int,
    end: int,
    *,
    collect: list | None = None,
    allow_info: bool = True,
) -> dict:
    """The frame-hop loop of :func:`walk_mp3` over ``payload[pos:end]``
    (tags already sliced off); raises ``ValueError`` unless the range
    parses as a whole number of valid frames.

    ``collect`` (splittable-reader hook, media_split.split_mp3): a
    list to receive one ``(offset, size, kbps, pad, protected)`` tuple
    per AUDIO frame, in stream order — cleared first, so a failed
    attempt never leaks partial frames into a retry.  ``allow_info``
    False disables the first-frame Xing/Info recognition: a split
    range never contains the metadata frame, so its first frame must
    count as audio even if junk payload bytes spell the tag."""
    if collect is not None:
        collect.clear()
    n_frames = 0
    crc_frames = 0
    total = 0
    sr = mode = None
    kbps_min = kbps_max = None
    kbps_sum = 0
    info = None
    first = True
    while pos < end:
        if end - pos < 4:
            raise ValueError("trailing bytes too short for a frame header")
        h0, h1, h2, h3 = payload[pos : pos + 4]
        if h0 != 0xFF or (h1 & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at byte {pos}")
        if (h1 >> 3) & 0x03 != 0b11:
            raise ValueError("not MPEG-1")
        if (h1 >> 1) & 0x03 != 0b01:
            raise ValueError("not Layer III")
        protected = not (h1 & 0x01)
        bidx = h2 >> 4
        if bidx in (0, 15):
            raise ValueError(f"bad bitrate index {bidx}")
        sridx = (h2 >> 2) & 0x03
        if sridx == 3:
            raise ValueError("reserved sample rate index")
        pad = (h2 >> 1) & 0x01
        fmode = h3 >> 6
        if sr is None:
            sr, mode = SAMPLE_RATES[sridx], fmode
        elif SAMPLE_RATES[sridx] != sr or fmode != mode:
            raise ValueError("sample rate / channel mode changed mid-stream")
        kbps = BITRATE_KBPS[bidx]
        size = frame_size(kbps, sr, pad)
        if pos + size > end:
            raise ValueError("frame runs past the payload")
        body = pos + 4
        if protected:
            if crc16_mp3(
                payload[pos + 2 : pos + 4]
                + payload[body + 2 : body + 2 + _side_info_len(fmode == 0b11)]
            ) != struct.unpack(">H", payload[body : body + 2])[0]:
                raise ValueError(f"CRC mismatch in frame at byte {pos}")
            body += 2
        side_end = body + _side_info_len(fmode == 0b11)
        tag = payload[side_end : side_end + 4]
        if allow_info and first and tag in (b"Xing", b"Info"):
            flags, = struct.unpack_from(">I", payload, side_end + 4)
            if flags & ~0xF:
                # defined bits: 1 frames, 2 bytes, 4 TOC, 8 quality —
                # anything else is corruption, not a format variant
                raise ValueError(f"unknown Xing/Info flag bits 0x{flags:x}")
            off = side_end + 8
            vals = {}
            for bit, name in ((0x1, "frames"), (0x2, "bytes")):
                if flags & bit:
                    vals[name], = struct.unpack_from(">I", payload, off)
                    off += 4
            if flags & 0x4:
                off += 100  # seek-point TOC, opaque to the walk
            if flags & 0x8:
                off += 4  # encoder quality
            info = vals
        else:
            n_frames += 1
            total += size
            crc_frames += protected
            kbps_sum += kbps
            kbps_min = kbps if kbps_min is None else min(kbps_min, kbps)
            kbps_max = kbps if kbps_max is None else max(kbps_max, kbps)
            if collect is not None:
                collect.append((pos, size, kbps, pad, int(protected)))
        first = False
        pos += size
    if pos != end:
        raise ValueError("frame walk did not consume the stream exactly")
    if n_frames == 0:
        raise ValueError("no audio frames")
    if info is not None:
        if "frames" in info and info["frames"] != n_frames:
            raise ValueError(
                f"Info frame count {info['frames']} != walked {n_frames}"
            )
        if "bytes" in info and info["bytes"] != total:
            raise ValueError(
                f"Info byte count {info['bytes']} != walked {total}"
            )
    return {
        "n_frames": n_frames,
        "sample_rate": sr,
        "channels": 1 if mode == 0b11 else 2,
        "crc_frames": crc_frames,
        "total_audio_bytes": total,
        "duration_us": n_frames * SAMPLES_PER_FRAME * 1_000_000 // sr,
        "kbps_min": kbps_min,
        "kbps_max": kbps_max,
        "kbps_sum": kbps_sum,
        "info_frame": info is not None,
    }


# ---------------------------------------------------- gated corpus query

MP3_FRAMES_BASE = 4   # audio frames per doc: 4 + doc_id % 5
MP3_FRAMES_MOD = 5
MP3_BIDX_MOD = 14     # frame i bitrate index: 1 + (doc_id + i) % 14
MP3_CRC_MOD = 3       # protected stream when doc_id % 3 == 0
MP3_ID3V2_MOD = 7     # ID3v2 body bytes: 11 * (doc_id % 7)
MP3_ID3V1_MOD = 4     # ID3v1 tail when doc_id % 4 == 0


def _doc_params(doc_id: int) -> dict:
    nf = MP3_FRAMES_BASE + doc_id % MP3_FRAMES_MOD
    return {
        "n_frames": nf,
        "sr_idx": doc_id % 3,
        "mono": bool(doc_id % 2),
        "bitrate_indices": [
            1 + (doc_id + i) % MP3_BIDX_MOD for i in range(nf)
        ],
        "paddings": [(doc_id + i) % 2 for i in range(nf)],
        "crc": doc_id % MP3_CRC_MOD == 0,
        "id3v2_junk": 11 * (doc_id % MP3_ID3V2_MOD),
        "id3v1": doc_id % MP3_ID3V1_MOD == 0,
    }


def synth_mp3_payload(doc_id: int) -> bytes:
    return encode_mp3_frames(doc_id, **_doc_params(doc_id))


def with_mp3_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach a structurally real MP3 stream per document (narrow
    Arrow-batched map; doc list repartitioned off the single-file
    scan)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "payload": [
                    synth_mp3_payload(int(d)) for d in pdf["doc_id"]
                ],
            })

    return docs.mapInPandas(synth, schema="doc_id long, payload binary")


def mp3_stream_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk every MP3 -> one row per doc with the curation metadata
    (counts, exact duration, bitrate profile, tag sizes).  Zero
    shuffle; payloads staged to session parquet so the timed query is
    pure walk."""
    from gemmsql.pipeline.staging import stage_payload_table

    b = stage_payload_table(spark, sf_dir, "mp3", with_mp3_payload)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                m = walk_mp3(bytes(p))
                rows.append((
                    doc_id, m["n_frames"], m["sample_rate"], m["channels"],
                    m["crc_frames"], m["total_audio_bytes"],
                    m["duration_us"], m["kbps_min"], m["kbps_max"],
                    m["kbps_sum"], m["id3v2_size"], int(m["has_id3v1"]),
                ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "nf", "sr", "ch", "crcn", "tb", "dur",
                "kmin", "kmax", "ksum", "id3v2", "id3v1",
            ])

    part = b.mapInPandas(
        stats,
        schema=(
            "doc_id long, nf long, sr long, ch long, crcn long, tb long,"
            " dur long, kmin long, kmax long, ksum long, id3v2 long,"
            " id3v1 long"
        ),
    )
    return part.select(
        "doc_id",
        F.col("nf").alias("n_frames"),
        F.col("sr").alias("sample_rate"),
        F.col("ch").alias("channels"),
        F.col("crcn").alias("crc_frames"),
        F.col("tb").alias("total_audio_bytes"),
        F.col("dur").alias("duration_us"),
        F.col("kmin").alias("kbps_min"),
        F.col("kmax").alias("kbps_max"),
        F.round(F.col("ksum").cast("double") / F.col("nf"), 6)
        .alias("kbps_avg"),
        F.col("id3v2").alias("id3v2_size"),
        F.col("id3v1").alias("has_id3v1"),
    )


# oracle: every output is a closed-form replay of the per-frame
# (doc_id + i) formulas — no md5, no codec math.
_BR_CASE = "CASE 1 + (doc_id + i) % 14 " + " ".join(
    f"WHEN {idx} THEN {kbps}" for idx, kbps in enumerate(BITRATE_KBPS)
    if kbps is not None
) + " END"

MP3_STREAM_STATS_SQL = f"""
WITH d AS (
  SELECT doc_id,
         {MP3_FRAMES_BASE} + doc_id % {MP3_FRAMES_MOD} AS nf,
         CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
              ELSE 32000 END AS sr,
         CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 2 END AS ch,
         CASE WHEN doc_id % {MP3_CRC_MOD} = 0 THEN 1 ELSE 0 END AS crc,
         11 * (doc_id % {MP3_ID3V2_MOD}) AS id3v2_body,
         CASE WHEN doc_id % {MP3_ID3V1_MOD} = 0 THEN 1 ELSE 0 END AS id3v1
  FROM documents
),
fr AS (
  SELECT d.*, s.i,
         {_BR_CASE} AS kbps,
         (doc_id + i) % 2 AS pad
  FROM d
  JOIN generate_series(0, {MP3_FRAMES_BASE + MP3_FRAMES_MOD - 2}) s(i)
    ON s.i < d.nf
),
agg AS (
  SELECT doc_id, nf, sr, ch, crc, id3v2_body, id3v1,
         SUM(CAST(FLOOR(144000.0 * kbps / sr) AS BIGINT) + pad) AS tb,
         MIN(kbps) AS kmin, MAX(kbps) AS kmax, SUM(kbps) AS ksum
  FROM fr
  GROUP BY 1, 2, 3, 4, 5, 6, 7
)
SELECT doc_id,
  CAST(nf AS BIGINT) AS n_frames,
  CAST(sr AS BIGINT) AS sample_rate,
  CAST(ch AS BIGINT) AS channels,
  CAST(crc * nf AS BIGINT) AS crc_frames,
  CAST(tb AS BIGINT) AS total_audio_bytes,
  CAST(FLOOR(nf * {SAMPLES_PER_FRAME} * 1000000.0 / sr) AS BIGINT)
    AS duration_us,
  CAST(kmin AS BIGINT) AS kbps_min,
  CAST(kmax AS BIGINT) AS kbps_max,
  ROUND(CAST(ksum AS DOUBLE) / CAST(nf AS DOUBLE), 6) AS kbps_avg,
  CAST(CASE WHEN id3v2_body > 0 THEN 10 + id3v2_body ELSE 0 END
       AS BIGINT) AS id3v2_size,
  CAST(id3v1 AS BIGINT) AS has_id3v1
FROM agg
"""
