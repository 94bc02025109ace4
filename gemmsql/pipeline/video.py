"""AVI/MJPEG video container (RIFF), dependency-free, plus the gated
frame-sampling corpus query.

This upgrades the video tier from the byte-window stand-in
(``multimodal.sample_frames``) to a REAL container format: Motion-JPEG
in the RIFF/AVI structure every camera and ffmpeg build can emit —
``LIST hdrl`` (``avih`` main header, ``LIST strl`` with a ``vids``
stream header whose handler is ``MJPG`` and a ``BITMAPINFOHEADER``
``strf``), ``LIST movi`` with word-aligned ``00dc`` frame chunks, and
the ``idx1`` index.  Frames are baseline JPEGs decoded by the
in-repo codec (`gemmsql.pipeline.jpeg`), so the tier composes two
real parsers: container walk -> per-frame entropy decode.

The decoder cross-checks structure the way a production ingester must:
stream count and handler, ``dwTotalFrames`` == ``strh.dwLength`` ==
``idx1`` entry count == ``movi`` chunk count, every ``idx1`` entry's
offset/size against the chunk actually found there, frame dimensions
against ``strf``, and SOI/EOI byte framing per frame.

Hash-parity strategy: frames are synthesized on the JPEG codec's
flat-block exactness subdomain (jpeg.py:18-35), so sampled-frame
pixel statistics are md5-replayable by the DuckDB oracle; the gate
samples every SECOND frame, so the frame-sampling arithmetic (which
frames were decoded) is load-bearing in the hash, as is the container
metadata (``n_frames`` comes from the parsed ``avih``).

Scale shape: synthesis and decode are narrow Arrow-batched maps —
zero shuffle.  Frame sampling fans out rows WITHOUT decoding skipped
frames (the container index makes skipping O(1) per frame — the whole
point of sampling at 100 TB: decode cost is per *sampled* frame, scan
cost is per byte).  (No analog in the reference — its surface is ML
operators, ref:gemm_map_reduce.py:1; this belongs to the
training-data-pipeline tier of the brief.)
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
from gemmsql.pipeline.jpeg import decode_jpeg_gray, encode_jpeg_gray

AVIF_HASINDEX = 0x00000010
AVIIF_KEYFRAME = 0x00000010


def _chunk(tag: bytes, body: bytes) -> bytes:
    out = struct.pack("<4sI", tag, len(body)) + body
    if len(body) & 1:
        out += b"\0"
    return out


def _list(tag: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", tag + body)


# ------------------------------------------------------------- encoder

def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG frame payloads -> RIFF/AVI MJPEG bytes with a populated
    ``hdrl`` (avih + vids/MJPG strl), word-aligned ``00dc`` chunks in
    ``LIST movi``, and an ``idx1`` keyframe index (every MJPEG frame
    is a keyframe — that independence is what makes the format
    splittable at scale)."""
    if not frames:
        raise ValueError("empty frame list")
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,            # dwMicroSecPerFrame
        max_bytes * fps,             # dwMaxBytesPerSec
        0,                           # dwPaddingGranularity
        AVIF_HASINDEX,               # dwFlags
        len(frames),                 # dwTotalFrames
        0,                           # dwInitialFrames
        1,                           # dwStreams
        max_bytes,                   # dwSuggestedBufferSize
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids", b"MJPG",
        0, 0, 0, 0,                  # flags, prio, lang, initFrames
        1, fps,                      # dwScale, dwRate
        0, len(frames),              # dwStart, dwLength
        max_bytes, -1, 0,            # bufSize, quality, sampleSize
        0, 0, width, height,         # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    idx_entries = []
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append(
            struct.pack(
                "<4sIII", b"00dc", AVIIF_KEYFRAME, len(movi_body), len(f)
            )
        )
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff = b"AVI " + hdrl + movi + idx1
    return struct.pack("<4sI", b"RIFF", len(riff)) + riff


# ------------------------------------------------------------- decoder

def decode_avi_mjpeg(payload: bytes) -> tuple[list[bytes], dict]:
    """RIFF/AVI MJPEG -> (list of per-frame JPEG payloads, metadata
    dict with ``width``/``height``/``fps``/``n_frames``).

    Validates the full container contract (module docstring): header
    consistency, idx1 <-> movi cross-check, per-frame SOI/EOI framing.
    Raises ``ValueError`` on any structural violation."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    pos = 12
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    avih = strh = strf = None
    frames: list[bytes] = []
    frame_offsets: list[tuple[int, int]] = []
    idx1 = None
    while pos + 8 <= end:
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + sz]
        if len(body) < sz:
            raise ValueError("truncated chunk")
        if cid == b"LIST":
            ltag, lbody = body[:4], body[4:]
            if ltag == b"hdrl":
                avih, strh, strf = _parse_hdrl(lbody)
            elif ltag == b"movi":
                frames, frame_offsets = _parse_movi(lbody)
        elif cid == b"idx1":
            idx1 = body
        pos += 8 + sz + (sz & 1)
    if avih is None:
        raise ValueError("missing avih header")
    if strh is None or strf is None:
        raise ValueError("missing stream headers")
    if not frames:
        raise ValueError("no movi frames")
    if avih["n_frames"] != len(frames) or strh["length"] != len(frames):
        raise ValueError("frame count disagrees with headers")
    if idx1 is not None:
        _check_idx1(idx1, frame_offsets)
    elif avih["flags"] & AVIF_HASINDEX:
        raise ValueError("AVIF_HASINDEX set but no idx1 chunk")
    for f in frames:
        if f[:2] != b"\xff\xd8" or f[-2:] != b"\xff\xd9":
            raise ValueError("frame is not SOI..EOI framed")
    return frames, {
        "width": strf["width"],
        "height": strf["height"],
        "fps": strh["rate"] // max(strh["scale"], 1),
        "n_frames": avih["n_frames"],
    }


def _parse_hdrl(body: bytes) -> tuple[dict, dict, dict]:
    avih = strh = strf = None
    pos = 0
    while pos + 8 <= len(body):
        cid, sz = struct.unpack_from("<4sI", body, pos)
        cbody = body[pos + 8 : pos + 8 + sz]
        if cid == b"avih":
            v = struct.unpack_from("<IIIIIIIIII", cbody, 0)
            if v[6] != 1:
                raise ValueError("exactly one stream supported")
            avih = {"flags": v[3], "n_frames": v[4],
                    "width": v[8], "height": v[9]}
        elif cid == b"LIST" and cbody[:4] == b"strl":
            strh, strf = _parse_strl(cbody[4:])
        pos += 8 + sz + (sz & 1)
    if avih is None or strh is None or strf is None:
        raise ValueError("incomplete hdrl")
    return avih, strh, strf


def _parse_strl(body: bytes) -> tuple[dict, dict]:
    strh = strf = None
    pos = 0
    while pos + 8 <= len(body):
        cid, sz = struct.unpack_from("<4sI", body, pos)
        cbody = body[pos + 8 : pos + 8 + sz]
        if cid == b"strh":
            fcc_type, handler = struct.unpack_from("<4s4s", cbody, 0)
            if fcc_type != b"vids":
                raise ValueError("stream is not video")
            if handler != b"MJPG":
                raise ValueError(f"unsupported codec {handler!r}")
            scale, rate, _start, length = struct.unpack_from("<IIII", cbody, 20)
            strh = {"scale": scale, "rate": rate, "length": length}
        elif cid == b"strf":
            _bisz, w, h, _planes, _bits, comp = struct.unpack_from(
                "<IiiHH4s", cbody, 0
            )
            if comp != b"MJPG":
                raise ValueError("strf compression is not MJPG")
            strf = {"width": w, "height": abs(h)}
        pos += 8 + sz + (sz & 1)
    if strh is None or strf is None:
        raise ValueError("incomplete strl")
    return strh, strf


def _parse_movi(body: bytes) -> tuple[list[bytes], list[tuple[int, int]]]:
    frames, offsets = [], []
    pos = 0  # offsets recorded relative to the 'movi' fourcc = pos + 4
    while pos + 8 <= len(body):
        cid, sz = struct.unpack_from("<4sI", body, pos)
        if cid != b"00dc":
            raise ValueError(f"unexpected movi chunk {cid!r}")
        frame = body[pos + 8 : pos + 8 + sz]
        if len(frame) < sz:
            raise ValueError("truncated frame chunk")
        frames.append(frame)
        offsets.append((pos + 4, sz))
        pos += 8 + sz + (sz & 1)
    return frames, offsets


def _check_idx1(idx1: bytes, frame_offsets: list[tuple[int, int]]) -> None:
    if len(idx1) != 16 * len(frame_offsets):
        raise ValueError("idx1 entry count disagrees with movi")
    for i, (off, sz) in enumerate(frame_offsets):
        tag, _flags, ioff, isz = struct.unpack_from("<4sIII", idx1, 16 * i)
        if tag != b"00dc" or ioff != off or isz != sz:
            raise ValueError(f"idx1 entry {i} disagrees with movi chunk")


def sample_video_frames(
    payload: bytes, *, stride: int = 2
) -> list[tuple[int, bytes]]:
    """Container-walk frame sampling: every ``stride``-th frame as
    ``(frame_idx, jpeg_bytes)`` — skipped frames are never entropy-
    decoded, only chunk-skipped (the O(bytes-scanned) vs
    O(frames-decoded) separation that makes sampling worthwhile)."""
    frames, _meta = decode_avi_mjpeg(payload)
    return [(i, f) for i, f in enumerate(frames) if i % stride == 0]


# ---------------------------------------------------- gated corpus query

VIDEO_W = 16
VIDEO_HB_MOD = 3          # block rows per frame: 1 + doc_id % 3
VIDEO_FRAMES_BASE = 4     # frames per doc: 4 + doc_id % 5
VIDEO_FRAMES_MOD = 5
VIDEO_STRIDE = 2          # gate samples every 2nd frame
VIDEO_FPS = 10


def _video_frame(doc_id: int, frame: int, hb: int) -> np.ndarray:
    """Flat-block frame on the JPEG exactness subdomain: block b is
    flat at byte b of md5('vf:doc:frame')."""
    vals = hashlib.md5(f"vf:{doc_id}:{frame}".encode()).digest()
    img = np.zeros((hb * 8, VIDEO_W), dtype=np.uint8)
    for b in range(hb * (VIDEO_W // 8)):
        by, bx = divmod(b, VIDEO_W // 8)
        img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = vals[b]
    return img


def with_video_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach a REAL RIFF/AVI MJPEG payload per document (narrow
    Arrow-batched map): 4-8 flat-block JPEG frames through
    :func:`encode_avi_mjpeg` — genuine headers, chunk alignment and
    idx1 index over genuinely entropy-coded frames."""
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
            for d in pdf["doc_id"]:
                doc_id = int(d)
                hb = 1 + doc_id % VIDEO_HB_MOD
                nf = VIDEO_FRAMES_BASE + doc_id % VIDEO_FRAMES_MOD
                frames = [
                    encode_jpeg_gray(_video_frame(doc_id, f, hb))
                    for f in range(nf)
                ]
                payloads.append(
                    encode_avi_mjpeg(frames, VIDEO_W, hb * 8, VIDEO_FPS)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return docs.mapInPandas(synth, schema="doc_id long, payload binary")


def video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk every AVI container, sample every 2nd frame, decode the
    sampled frames with the REAL baseline-JPEG decoder, and emit
    ``(doc_id, n_frames, frame_idx, n_px, mean, std)`` — one row per
    SAMPLED frame.  ``n_frames`` comes from the parsed ``avih``
    header, so container metadata is hash-gated alongside the sampler
    arithmetic (which frame indices appear) and the per-frame pixel
    decode.  Zero shuffle — one narrow Arrow-batched map over payloads
    staged to session-local parquet (staging.py), so the timed query is
    pure container-walk + decode."""
    from gemmsql.pipeline.staging import stage_payload_table

    b = stage_payload_table(spark, sf_dir, "video", with_video_payload)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, nfs, fidx, ns, sums, sqs = [], [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                frames, meta = decode_avi_mjpeg(bytes(p))
                for i in range(0, len(frames), VIDEO_STRIDE):
                    img = decode_jpeg_gray(frames[i]).astype(np.int64)
                    ids.append(doc_id)
                    nfs.append(meta["n_frames"])
                    fidx.append(i)
                    ns.append(img.size)
                    sums.append(int(img.sum()))
                    sqs.append(int((img * img).sum()))
            yield pd.DataFrame(
                {"doc_id": ids, "nf": nfs, "frame_idx": fidx,
                 "n_px": ns, "s": sums, "s2": sqs}
            )

    part = b.mapInPandas(
        stats,
        schema=(
            "doc_id long, nf long, frame_idx long, n_px long,"
            " s long, s2 long"
        ),
    )
    n = F.col("n_px").cast("double")
    s = F.col("s").cast("double")
    s2 = F.col("s2").cast("double")
    return part.select(
        "doc_id",
        F.col("nf").alias("n_frames"),
        "frame_idx",
        "n_px",
        F.round(s / n, 6).alias("mean"),
        F.round(F.sqrt((s2 - s * s / n) / n), 6).alias("std"),
    )


# oracle: sampled frame f of doc d has blocks flat at bytes
# 0..2*hb-1 of md5('vf:d:f'); only even frame indices appear.
VIDEO_FEATURES_SQL = f"""
WITH d AS (
  SELECT doc_id,
         1 + doc_id % {VIDEO_HB_MOD} AS hb,
         {VIDEO_FRAMES_BASE} + doc_id % {VIDEO_FRAMES_MOD} AS nf
  FROM documents
),
fr AS (
  SELECT d.doc_id, d.hb, d.nf, s.f
  FROM d
  JOIN generate_series(0, {VIDEO_FRAMES_BASE + VIDEO_FRAMES_MOD - 1}) s(f)
    ON s.f < d.nf AND s.f % {VIDEO_STRIDE} = 0
),
blk AS (
  SELECT fr.doc_id, fr.hb, fr.nf, fr.f,
         CAST('0x' || substr(
           md5('vf:' || CAST(fr.doc_id AS VARCHAR) || ':'
               || CAST(fr.f AS VARCHAR)),
           2 * s.b + 1, 2) AS BIGINT) AS v
  FROM fr
  JOIN generate_series(0, {2 * VIDEO_HB_MOD - 1}) s(b)
    ON s.b < fr.hb * {VIDEO_W // 8}
),
agg AS (
  SELECT doc_id, nf, f,
         CAST(64 * COUNT(*) AS BIGINT) AS n_px,
         CAST(64 * SUM(v) AS BIGINT) AS s,
         CAST(64 * SUM(v * v) AS BIGINT) AS s2
  FROM blk GROUP BY doc_id, nf, f
)
SELECT doc_id,
  CAST(nf AS BIGINT) AS n_frames,
  CAST(f AS BIGINT) AS frame_idx,
  n_px,
  ROUND(CAST(s AS DOUBLE) / CAST(n_px AS DOUBLE), 6) AS mean,
  ROUND(SQRT((CAST(s2 AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n_px AS DOUBLE))
             / CAST(n_px AS DOUBLE)), 6) AS std
FROM agg
"""
