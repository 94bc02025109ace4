"""Splittable media reader — intra-file parallel decode of large
AVI and FLAC payloads (VERDICT r8 next #5).

The codec tiers decode one payload per task, which is the right shape
for a corpus of ordinary-sized files but leaves a 4 GB single payload
as ONE task.  Both in-repo container formats carry the metadata a
splittable reader needs, the same role parquet row groups play:

- **AVI**: the ``idx1`` chunk is a table of (offset, size) entries —
  O(1) seek to any frame — and every MJPEG frame is an independently
  decodable SOI..EOI JPEG.  :func:`avi_frame_index` reads ONLY the
  container skeleton (top-level chunk walk + idx1), no entropy
  decode; :func:`split_avi` groups the indexed frames into byte
  ranges.
- **FLAC**: frames are self-contained after their 14-bit sync code
  (header carries blocksize/rate/channels; CRC-8/CRC-16 guard each
  frame independently).  :func:`flac_frame_index` scans for sync
  candidates and validates each with the header CRC-8 plus the coded
  frame number (defeating false syncs inside Rice residual bytes);
  :func:`split_flac` cuts frame-aligned byte ranges.

:func:`read_media_ranges` is the Spark op: stage 1 is a narrow
Arrow-batched index map emitting one row per SPLIT (doc_id,
split_idx, frame_lo, byte range content); a repartition then spreads
the splits of one file across executors; stage 2 decodes each split
independently and emits one row per frame with a pixel/sample MD5.
Range-union equality with the whole-file decoders is pinned in
tests/test_media_split.py.

Scale shape: at 100 TB the index stage reads container skeletons
(bytes-per-file ~ frames * 16, not the payload), the one shuffle
moves each byte range exactly once to its decode task, and decode
parallelism becomes min(frames, cluster cores) instead of
files-count.  In production the stage-1 output would be (path,
byte_lo, byte_hi) against object storage with executors range-reading
— the descriptor algebra (what this module owns) is identical; here
the range CONTENT rides the shuffle because testdata payloads are
in-row binary columns.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gemmsql.pipeline.flac import (
    _BitReader,
    _crc8,
    _decode_one_frame,
    parse_streaminfo,
)
from gemmsql.pipeline.jpeg import decode_jpeg_gray

#: default split target in BYTES (VERDICT r10 next #6): decode tasks
#: are sized like scan tasks — by data volume, not frame count.  A
#: 4 GiB payload still becomes ~1024 concurrent tasks; a 100 KiB test
#: fixture becomes ONE, so small-file corpora no longer pay the
#: index/shuffle constant per tiny split.
DEFAULT_SPLIT_BYTES = 4 * 1024 * 1024


def _resolve_fps(
    n_frames: int,
    span_bytes: int,
    frames_per_split: int | None,
    target_split_bytes: int | None,
) -> int:
    """Frames per split for a payload whose indexed frames cover
    ``span_bytes``.  An explicit ``frames_per_split`` wins (the parity
    tests pin exact shapes); otherwise the count is sized so each
    split carries ~``target_split_bytes`` of payload, never below one
    frame."""
    if frames_per_split is not None:
        if frames_per_split < 1:
            raise ValueError("frames_per_split must be >= 1")
        return frames_per_split
    tgt = DEFAULT_SPLIT_BYTES if target_split_bytes is None else target_split_bytes
    if tgt < 1:
        raise ValueError("target_split_bytes must be >= 1")
    avg = max(1, span_bytes // max(1, n_frames))
    return max(1, tgt // avg)


# ------------------------------------------------------------ AVI side


def avi_frame_index(payload: bytes) -> list[tuple[int, int]]:
    """Absolute (byte_offset, size) of every ``00dc`` frame chunk —
    header + idx1 walk only, no frame decode.  The offset points at
    the chunk header; frame bytes are ``payload[off+8 : off+8+size]``.
    Falls back to walking ``movi`` chunk headers when idx1 is absent
    (still O(frames) pointer hops)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    pos = 12
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    movi_fourcc_abs = None
    movi_end = None
    idx1 = None
    while pos + 8 <= end:
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        if pos + 8 + sz > len(payload):
            raise ValueError("truncated chunk")
        if cid == b"LIST" and payload[pos + 8 : pos + 12] == b"movi":
            movi_fourcc_abs = pos + 8
            movi_end = pos + 8 + sz
        elif cid == b"idx1":
            idx1 = payload[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    if movi_fourcc_abs is None:
        raise ValueError("missing movi list")
    frames: list[tuple[int, int]] = []
    if idx1 is not None:
        if len(idx1) % 16:
            raise ValueError("idx1 size not a multiple of 16")
        for i in range(0, len(idx1), 16):
            tag, _flags, off, isz = struct.unpack_from("<4sIII", idx1, i)
            if tag != b"00dc":
                raise ValueError(f"unexpected idx1 tag {tag!r}")
            abs_off = movi_fourcc_abs + off
            if payload[abs_off : abs_off + 4] != b"00dc":
                raise ValueError("idx1 offset does not land on a frame chunk")
            if struct.unpack_from("<I", payload, abs_off + 4)[0] != isz:
                raise ValueError("idx1 size disagrees with chunk header")
            frames.append((abs_off, isz))
    else:
        p = movi_fourcc_abs + 4
        while p + 8 <= movi_end:
            cid, sz = struct.unpack_from("<4sI", payload, p)
            if cid != b"00dc":
                raise ValueError(f"unexpected movi chunk {cid!r}")
            frames.append((p, sz))
            p += 8 + sz + (sz & 1)
    return frames


def split_avi(
    payload: bytes,
    frames_per_split: int | None = None,
    target_split_bytes: int | None = None,
) -> list[dict]:
    """Cut the payload into frame-aligned byte ranges: ``[{split_idx,
    frame_lo, n_frames, chunk}]`` where ``chunk`` is the contiguous
    movi slice covering those frame chunks.  Splits are sized by
    BYTES (``target_split_bytes``, default :data:`DEFAULT_SPLIT_BYTES`)
    unless an exact ``frames_per_split`` is pinned."""
    idx = avi_frame_index(payload)
    span = idx[-1][0] + 8 + idx[-1][1] - idx[0][0] if idx else 0
    frames_per_split = _resolve_fps(
        len(idx), span, frames_per_split, target_split_bytes
    )
    out = []
    for s, lo in enumerate(range(0, len(idx), frames_per_split)):
        part = idx[lo : lo + frames_per_split]
        first_off = part[0][0]
        last_off, last_sz = part[-1]
        out.append({
            "split_idx": s,
            "frame_lo": lo,
            "n_frames": len(part),
            "chunk": payload[first_off : last_off + 8 + last_sz],
        })
    return out


def decode_avi_range(chunk: bytes, n_frames: int) -> list[bytes]:
    """Decode one split's byte range back into its JPEG frame
    payloads by re-walking the ``00dc`` chunk headers."""
    frames = []
    pos = 0
    for _ in range(n_frames):
        if pos + 8 > len(chunk):
            raise ValueError("split range truncated")
        cid, sz = struct.unpack_from("<4sI", chunk, pos)
        if cid != b"00dc":
            raise ValueError(f"unexpected chunk {cid!r} in split range")
        f = chunk[pos + 8 : pos + 8 + sz]
        if len(f) < sz:
            raise ValueError("truncated frame in split range")
        if f[:2] != b"\xff\xd8" or f[-2:] != b"\xff\xd9":
            raise ValueError("frame is not SOI..EOI framed")
        frames.append(f)
        pos += 8 + sz + (sz & 1)
    return frames


# ----------------------------------------------------------- FLAC side


def flac_frame_index(payload: bytes) -> tuple[tuple[int, int, int], list[int]]:
    """``((rate, channels, bps), [absolute frame sync offsets])`` via
    frame-sync scan.  A candidate offset must carry the 14-bit sync
    code, a CRC-8-valid frame header, AND the next expected coded
    frame number — residual bytes that happen to contain 0xFF 0xF8/F9
    fail one of the three.  Header-only work: no subframe decode."""
    rate, channels, bps, _total, _md5, first = parse_streaminfo(payload)
    offsets: list[int] = []
    pos = first
    expect = 0
    n = len(payload)
    while pos < n - 1:
        b0, b1 = payload[pos], payload[pos + 1]
        if b0 == 0xFF and (b1 & 0xFC) == 0xF8:
            if _validate_frame_header(payload, pos, rate, bps, expect):
                offsets.append(pos)
                expect += 1
                # skip the (>= 10 byte) header before rescanning so a
                # frame's own header bytes can't double-match
                pos += 10
                continue
        pos += 1
    if not offsets:
        raise ValueError("flac: no valid frame sync found")
    return (rate, channels, bps), offsets


def _validate_frame_header(
    payload: bytes, pos: int, rate: int, bps: int, expect_fno: int
) -> bool:
    try:
        r = _BitReader(payload, pos)
        if r.read(14) != 0b11111111111110:
            return False
        r.read(2)
        bs_code = r.read(4)
        rate_code = r.read(4)
        r.read(4)                  # channel assignment
        r.read(4)                  # size code + reserved
        from gemmsql.pipeline.flac import _utf8_decode

        fno = _utf8_decode(r)
        if fno != expect_fno:
            return False
        if bs_code == 0b0110:
            r.read(8)
        elif bs_code == 0b0111:
            r.read(16)
        if rate_code in (0b1100, 0b1101, 0b1110):
            r.read(8 if rate_code == 0b1100 else 16)
        crc8_ref = r.read(8)
        return _crc8(payload[pos : r.byte_pos - 1]) == crc8_ref
    except (ValueError, IndexError):
        return False


def split_flac(
    payload: bytes,
    frames_per_split: int | None = None,
    target_split_bytes: int | None = None,
) -> tuple[tuple[int, int, int], list[dict]]:
    """``((rate, channels, bps), [{split_idx, frame_lo, n_frames,
    chunk}])`` — frame-aligned byte ranges cut at sync offsets,
    byte-sized like :func:`split_avi`."""
    info, offsets = flac_frame_index(payload)
    bounds = offsets + [len(payload)]
    frames_per_split = _resolve_fps(
        len(offsets), bounds[-1] - bounds[0], frames_per_split,
        target_split_bytes,
    )
    out = []
    for s, lo in enumerate(range(0, len(offsets), frames_per_split)):
        hi = min(lo + frames_per_split, len(offsets))
        out.append({
            "split_idx": s,
            "frame_lo": lo,
            "n_frames": hi - lo,
            "chunk": payload[bounds[lo] : bounds[hi]],
        })
    return info, out


def decode_flac_range(
    chunk: bytes, rate: int, channels: int, bps: int, frame_lo: int,
    n_frames: int,
) -> np.ndarray:
    """Decode one split's frames with full CRC-8/CRC-16 verification
    and coded-frame-number validation.  Returns the concatenated
    samples — ``(n,)`` mono or ``(n, 2)`` stereo.  (The STREAMINFO
    MD5 is a whole-stream property; the union test covers it.)"""
    r = _BitReader(chunk, 0)
    blocks = []
    for k in range(n_frames):
        block, fno = _decode_one_frame(chunk, r, rate, channels, bps)
        if fno != frame_lo + k:
            raise ValueError("flac: split frame number mismatch")
        blocks.append(block)
    return np.concatenate(blocks)


# ------------------------------------------------------------ MP3 side


def split_mp3(
    payload: bytes,
    frames_per_split: int | None = None,
    target_split_bytes: int | None = None,
) -> tuple[tuple[int, int], list[dict]]:
    """``((sample_rate, channels), [{split_idx, frame_lo, n_frames,
    chunk}])`` — audio-frame-aligned byte ranges of an MP3 stream
    (VERDICT r9 next #4: the long-podcast/audiobook hot case).

    The index IS the full structural walk (``walk_mp3``: ID3v2
    syncsafe skip, structural ID3v1 disambiguation, per-frame header
    validation, CRC-16 on protected frames, Xing/Info cross-check), so
    a stream that would not ingest whole cannot be split either.  The
    Xing/Info metadata frame and both tags stay OUT of the ranges —
    a split owns audio frames only.  Audio frames are back-to-back,
    so each chunk is the contiguous byte run of its frames."""
    from gemmsql.pipeline.mp3 import walk_mp3

    frames: list[tuple[int, int, int, int, int]] = []
    m = walk_mp3(payload, collect=frames)
    span = (
        frames[-1][0] + frames[-1][1] - frames[0][0] if frames else 0
    )
    frames_per_split = _resolve_fps(
        len(frames), span, frames_per_split, target_split_bytes
    )
    out = []
    for s, lo in enumerate(range(0, len(frames), frames_per_split)):
        part = frames[lo : lo + frames_per_split]
        first_off = part[0][0]
        last_off, last_sz = part[-1][0], part[-1][1]
        out.append({
            "split_idx": s,
            "frame_lo": lo,
            "n_frames": len(part),
            "chunk": payload[first_off : last_off + last_sz],
        })
    return (m["sample_rate"], m["channels"]), out


def walk_mp3_range(
    chunk: bytes, sample_rate: int, channels: int, n_frames: int
) -> list[tuple[int, int, int, int, int]]:
    """Metadata walk of ONE split's byte range -> per-frame
    ``(offset, size, kbps, pad, protected)`` with full header and
    CRC-16 validation, pinned to the stream-level (rate, channels)
    the index stage recorded.  ``allow_info=False``: a range never
    contains the Xing/Info frame, so its first frame is audio even if
    payload junk spells the tag."""
    from gemmsql.pipeline.mp3 import _walk_frames

    frames: list[tuple[int, int, int, int, int]] = []
    stats = _walk_frames(
        chunk, 0, len(chunk), collect=frames, allow_info=False
    )
    if stats["sample_rate"] != sample_rate or stats["channels"] != channels:
        raise ValueError("mp3: split stream parameters mismatch")
    if stats["n_frames"] != n_frames:
        raise ValueError("mp3: split frame count mismatch")
    return frames


# ------------------------------------------------------------ Spark op

_SPLIT_SCHEMA = (
    "doc_id long, fmt string, split_idx long, frame_lo long,"
    " n_frames long, rate long, channels long, bps long, chunk binary"
)
_FRAME_SCHEMA = (
    "doc_id long, frame_idx long, n_values long, content_md5 string"
)


def read_media_ranges(
    payloads: DataFrame,
    fmt: str,
    frames_per_split: int | None = None,
    target_split_bytes: int | None = None,
) -> DataFrame:
    """Distributed intra-file media decode: index each payload into
    frame-aligned splits, spread the splits across the cluster, and
    decode every split independently -> one row per frame
    ``(doc_id, frame_idx, n_values, content_md5)``.

    ``fmt`` is ``"avi"`` or ``"flac"``.  ``n_values`` is pixels per
    frame (AVI) or interchannel samples per frame (FLAC);
    ``content_md5`` hashes the decoded pixel/sample bytes, making the
    union test exact.  The repartition on (doc_id, split_idx) is the
    point of the op — it is what turns one 4 GB file into
    ~payload_bytes / target_split_bytes concurrent decode tasks
    (splits are byte-sized by default; ``frames_per_split`` pins an
    exact shape for the parity tests)."""
    if fmt not in ("avi", "flac"):
        raise ValueError("fmt must be 'avi' or 'flac'")

    def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                if fmt == "avi":
                    info = (0, 0, 0)
                    splits = split_avi(p, frames_per_split, target_split_bytes)
                else:
                    info, splits = split_flac(
                        p, frames_per_split, target_split_bytes
                    )
                for s in splits:
                    rows.append((
                        int(doc_id), fmt, s["split_idx"], s["frame_lo"],
                        s["n_frames"], info[0], info[1], info[2],
                        s["chunk"],
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "split_idx", "frame_lo", "n_frames",
                    "rate", "channels", "bps", "chunk",
                ],
            )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fidx, nvals, md5s = [], [], [], []
            for row in pdf.itertuples(index=False):
                chunk = bytes(row.chunk)
                if row.fmt == "avi":
                    for k, jpg in enumerate(
                        decode_avi_range(chunk, int(row.n_frames))
                    ):
                        img = decode_jpeg_gray(jpg).astype(np.int16)
                        ids.append(row.doc_id)
                        fidx.append(row.frame_lo + k)
                        nvals.append(img.size)
                        md5s.append(hashlib.md5(img.tobytes()).hexdigest())
                else:
                    r = _BitReader(chunk, 0)
                    for k in range(int(row.n_frames)):
                        block, fno = _decode_one_frame(
                            chunk, r, int(row.rate), int(row.channels),
                            int(row.bps),
                        )
                        if fno != row.frame_lo + k:
                            raise ValueError(
                                "flac: split frame number mismatch"
                            )
                        samp = block.astype(np.int16)
                        ids.append(row.doc_id)
                        fidx.append(fno)
                        nvals.append(len(block))
                        md5s.append(
                            hashlib.md5(samp.tobytes()).hexdigest()
                        )
            yield pd.DataFrame({
                "doc_id": ids, "frame_idx": fidx, "n_values": nvals,
                "content_md5": md5s,
            })

    splits = payloads.mapInPandas(index, schema=_SPLIT_SCHEMA)
    # EXPLICIT partition count (r17 perf fix): these shuffles are
    # byte-light (KB chunks) but compute-heavy downstream (per-split
    # entropy decode) — without a pinned count, AQE coalesces the
    # whole spread into ONE partition at fixture scale and the
    # decode serializes on a single core (measured 4.6 s -> 1.0 s at
    # sf0.1 on the AVI gate)
    spread = splits.repartition(
        payloads.sparkSession.sparkContext.defaultParallelism,
        F.col("doc_id"), F.col("split_idx"))
    return spread.mapInPandas(decode, schema=_FRAME_SCHEMA)


# ------------------------------------------- oracle-gated corpus query


def flac_frame_stats(
    spark: SparkSession,
    sf_dir: str,
    frames_per_split: int | None = None,
    target_split_bytes: int | None = None,
) -> DataFrame:
    """Per-FRAME stats of the staged FLAC corpus decoded through the
    SPLIT path -> ``(doc_id, frame_idx, n_samples, frame_peak,
    frame_sum)`` — the splittable reader under a value-hash gate.

    Every stage of the reader is load-bearing in the hash: a sync
    scan that misses or double-counts a frame changes frame_idx
    assignment; a range cut through a frame breaks its CRC; a split
    decoded with the wrong warm-up state changes the samples.  The
    DuckDB oracle replays the synthesized signal formula grouped by
    ``idx // FLAC_BLOCK`` — pure SQL, no decoder."""
    from gemmsql.pipeline.flac import with_flac_payload
    from gemmsql.pipeline.staging import stage_payload_table

    b = stage_payload_table(spark, sf_dir, "flac", with_flac_payload)

    def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                info, splits = split_flac(
                    bytes(p), frames_per_split, target_split_bytes
                )
                for s in splits:
                    rows.append((
                        int(doc_id), "flac", s["split_idx"], s["frame_lo"],
                        s["n_frames"], info[0], info[1], info[2],
                        s["chunk"],
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "split_idx", "frame_lo", "n_frames",
                    "rate", "channels", "bps", "chunk",
                ],
            )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fidx, ns, peaks, sums = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                samples = decode_flac_range(
                    bytes(row.chunk), int(row.rate), int(row.channels),
                    int(row.bps), int(row.frame_lo), int(row.n_frames),
                )
                # split back into frames: all but the last full frame
                # in a split are FLAC_BLOCK (=32) samples
                lo = 0
                from gemmsql.pipeline.flac import FLAC_BLOCK

                for k in range(int(row.n_frames)):
                    blk = samples[lo : lo + FLAC_BLOCK]
                    lo += len(blk)
                    v = blk.astype(np.int64)
                    ids.append(row.doc_id)
                    fidx.append(row.frame_lo + k)
                    ns.append(len(v))
                    peaks.append(int(np.abs(v).max()))
                    sums.append(int(v.sum()))
            yield pd.DataFrame({
                "doc_id": ids, "frame_idx": fidx, "n_samples": ns,
                "frame_peak": peaks, "frame_sum": sums,
            })

    splits = b.mapInPandas(index, schema=_SPLIT_SCHEMA)
    # EXPLICIT partition count (r17 perf fix): these shuffles are
    # byte-light (KB chunks) but compute-heavy downstream (per-split
    # entropy decode) — without a pinned count, AQE coalesces the
    # whole spread into ONE partition at fixture scale and the
    # decode serializes on a single core (measured 4.6 s -> 1.0 s at
    # sf0.1 on the AVI gate)
    spread = splits.repartition(
        spark.sparkContext.defaultParallelism,
        F.col("doc_id"), F.col("split_idx"))
    return spread.mapInPandas(
        decode,
        schema=(
            "doc_id long, frame_idx long, n_samples long,"
            " frame_peak long, frame_sum long"
        ),
    )


def flac_frame_stats_sql() -> str:
    """DuckDB twin of :func:`flac_frame_stats`: the md5-chain signal
    formula (flac.FLAC_FEATURES_SQL's derivation) grouped by frame
    index ``idx // FLAC_BLOCK`` — pure SQL, no decoder, so every
    reader stage (sync scan, range cut, split decode, frame-number
    check) is hash-gated against an independent derivation."""
    from gemmsql.pipeline.flac import (
        FLAC_BLOCK,
        FLAC_BLOCKS_BASE,
        FLAC_BLOCKS_MOD,
        _DELTAS_PER_BLOCK,
    )

    return f"""
WITH d AS (
  SELECT doc_id,
         {FLAC_BLOCKS_BASE} + doc_id % {FLAC_BLOCKS_MOD} AS nb
  FROM documents
),
blocks AS (
  SELECT d.doc_id, s.t,
         md5('fl:' || CAST(d.doc_id AS VARCHAR) || ':'
             || CAST(s.t AS VARCHAR)) AS h
  FROM d
  JOIN generate_series(0, {FLAC_BLOCKS_BASE + FLAC_BLOCKS_MOD - 1}) s(t)
    ON s.t < d.nb
),
deltas AS (
  SELECT b.doc_id,
         b.t * {_DELTAS_PER_BLOCK} + g.k AS idx,
         CAST('0x' || substring(b.h, 2 * g.k + 1, 2) AS BIGINT)
         % 32 - 16 AS delta
  FROM blocks b
  JOIN generate_series(0, {_DELTAS_PER_BLOCK - 1}) g(k) ON TRUE
),
samples AS (
  SELECT doc_id, idx,
         SUM(delta) OVER (
           PARTITION BY doc_id ORDER BY idx
           ROWS UNBOUNDED PRECEDING
         ) AS v
  FROM deltas
)
SELECT doc_id,
       CAST(idx // {FLAC_BLOCK} AS BIGINT) AS frame_idx,
       COUNT(*) AS n_samples,
       CAST(MAX(ABS(v)) AS BIGINT) AS frame_peak,
       CAST(SUM(v) AS BIGINT) AS frame_sum
FROM samples GROUP BY doc_id, frame_idx
"""


def avi_frame_stats(
    spark: SparkSession,
    sf_dir: str,
    frames_per_split: int | None = None,
    target_split_bytes: int | None = None,
) -> DataFrame:
    """Per-frame pixel stats of the staged AVI corpus decoded through
    the SPLIT path -> ``(doc_id, frame_idx, n_px, mean, std)`` — the
    AVI twin of :func:`flac_frame_stats`: idx1-driven range cut,
    repartitioned per-split decode, every frame entropy-decoded by the
    in-repo JPEG codec.  Unlike the stride-sampling ``video_features``
    gate this decodes ALL frames (a split owns its whole range), so
    the oracle is the flat-block formula without the stride filter."""
    from gemmsql.pipeline.staging import stage_payload_table
    from gemmsql.pipeline.video import with_video_payload

    b = stage_payload_table(spark, sf_dir, "video", with_video_payload)

    def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                for s in split_avi(
                    bytes(p), frames_per_split, target_split_bytes
                ):
                    rows.append((
                        int(doc_id), "avi", s["split_idx"], s["frame_lo"],
                        s["n_frames"], 0, 0, 0, s["chunk"],
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "split_idx", "frame_lo", "n_frames",
                    "rate", "channels", "bps", "chunk",
                ],
            )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fidx, ns, sums, sqs = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                jpgs = decode_avi_range(bytes(row.chunk), int(row.n_frames))
                for k, jpg in enumerate(jpgs):
                    img = decode_jpeg_gray(jpg).astype(np.int64)
                    ids.append(row.doc_id)
                    fidx.append(row.frame_lo + k)
                    ns.append(img.size)
                    sums.append(int(img.sum()))
                    sqs.append(int((img * img).sum()))
            yield pd.DataFrame({
                "doc_id": ids, "frame_idx": fidx, "n": ns,
                "s": sums, "s2": sqs,
            })

    splits = b.mapInPandas(index, schema=_SPLIT_SCHEMA)
    # EXPLICIT partition count (r17 perf fix): these shuffles are
    # byte-light (KB chunks) but compute-heavy downstream (per-split
    # entropy decode) — without a pinned count, AQE coalesces the
    # whole spread into ONE partition at fixture scale and the
    # decode serializes on a single core (measured 4.6 s -> 1.0 s at
    # sf0.1 on the AVI gate)
    spread = splits.repartition(
        spark.sparkContext.defaultParallelism,
        F.col("doc_id"), F.col("split_idx"))
    part = spread.mapInPandas(
        decode,
        schema="doc_id long, frame_idx long, n long, s long, s2 long",
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    s2 = F.col("s2").cast("double")
    return part.select(
        "doc_id",
        "frame_idx",
        F.col("n").alias("n_px"),
        F.round(s / n, 6).alias("mean"),
        F.round(F.sqrt((s2 - s * s / n) / n), 6).alias("std"),
    )


def avi_frame_stats_sql() -> str:
    """DuckDB twin of :func:`avi_frame_stats`: the flat-block frame
    formula over ALL frames (no stride filter — the split path decodes
    every frame in its range)."""
    from gemmsql.pipeline.video import (
        VIDEO_FRAMES_BASE,
        VIDEO_FRAMES_MOD,
        VIDEO_HB_MOD,
        VIDEO_W,
    )

    return f"""
WITH d AS (
  SELECT doc_id,
         1 + doc_id % {VIDEO_HB_MOD} AS hb,
         {VIDEO_FRAMES_BASE} + doc_id % {VIDEO_FRAMES_MOD} AS nf
  FROM documents
),
fr AS (
  SELECT d.doc_id, d.hb, s.f
  FROM d
  JOIN generate_series(0, {VIDEO_FRAMES_BASE + VIDEO_FRAMES_MOD - 1}) s(f)
    ON s.f < d.nf
),
blk AS (
  SELECT fr.doc_id, fr.hb, fr.f,
         CAST('0x' || substr(
           md5('vf:' || CAST(fr.doc_id AS VARCHAR) || ':'
               || CAST(fr.f AS VARCHAR)),
           2 * s.b + 1, 2) AS BIGINT) AS v
  FROM fr
  JOIN generate_series(0, {2 * VIDEO_HB_MOD - 1}) s(b)
    ON s.b < fr.hb * {VIDEO_W // 8}
),
agg AS (
  SELECT doc_id, f,
         CAST(64 * COUNT(*) AS BIGINT) AS n_px,
         CAST(64 * SUM(v) AS BIGINT) AS s,
         CAST(64 * SUM(v * v) AS BIGINT) AS s2
  FROM blk GROUP BY doc_id, f
)
SELECT doc_id,
  CAST(f AS BIGINT) AS frame_idx,
  n_px,
  ROUND(CAST(s AS DOUBLE) / CAST(n_px AS DOUBLE), 6) AS mean,
  ROUND(SQRT((CAST(s2 AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n_px AS DOUBLE))
             / CAST(n_px AS DOUBLE)), 6) AS std
FROM agg
"""


def mp3_frame_stats(
    spark: SparkSession,
    sf_dir: str,
    frames_per_split: int | None = None,
    target_split_bytes: int | None = None,
) -> DataFrame:
    """Per-FRAME metadata of the staged MP3 corpus walked through the
    SPLIT path -> ``(doc_id, frame_idx, kbps, frame_bytes, padded,
    protected)`` — the MP3 member of the splittable-reader family
    (VERDICT r9 next #4), mirroring :func:`flac_frame_stats`.

    Load-bearing in the hash: the sync walk's frame boundaries (a cut
    through a frame breaks the next header), the per-frame bitrate /
    padding parse, and CRC-16 verification on protected streams (a
    corrupt split raises, not skips).  The DuckDB oracle replays the
    closed-form (doc_id + i) bitrate/padding formulas — no walker."""
    from gemmsql.pipeline.mp3 import with_mp3_payload
    from gemmsql.pipeline.staging import stage_payload_table

    b = stage_payload_table(spark, sf_dir, "mp3", with_mp3_payload)

    def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                (sr, ch), splits = split_mp3(
                    bytes(p), frames_per_split, target_split_bytes
                )
                for s in splits:
                    rows.append((
                        int(doc_id), "mp3", s["split_idx"], s["frame_lo"],
                        s["n_frames"], sr, ch, 0, s["chunk"],
                    ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "split_idx", "frame_lo", "n_frames",
                    "rate", "channels", "bps", "chunk",
                ],
            )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fidx, kbps_l, fb, pads, prots = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                frames = walk_mp3_range(
                    bytes(row.chunk), int(row.rate), int(row.channels),
                    int(row.n_frames),
                )
                for k, (_off, size, kbps, pad, prot) in enumerate(frames):
                    ids.append(row.doc_id)
                    fidx.append(row.frame_lo + k)
                    kbps_l.append(kbps)
                    fb.append(size)
                    pads.append(pad)
                    prots.append(prot)
            yield pd.DataFrame({
                "doc_id": ids, "frame_idx": fidx, "kbps": kbps_l,
                "frame_bytes": fb, "padded": pads, "protected": prots,
            })

    splits = b.mapInPandas(index, schema=_SPLIT_SCHEMA)
    # EXPLICIT partition count (r17 perf fix): these shuffles are
    # byte-light (KB chunks) but compute-heavy downstream (per-split
    # entropy decode) — without a pinned count, AQE coalesces the
    # whole spread into ONE partition at fixture scale and the
    # decode serializes on a single core (measured 4.6 s -> 1.0 s at
    # sf0.1 on the AVI gate)
    spread = splits.repartition(
        spark.sparkContext.defaultParallelism,
        F.col("doc_id"), F.col("split_idx"))
    return spread.mapInPandas(
        walk,
        schema=(
            "doc_id long, frame_idx long, kbps long, frame_bytes long,"
            " padded long, protected long"
        ),
    )


def mp3_frame_stats_sql() -> str:
    """DuckDB twin of :func:`mp3_frame_stats`: the synth corpus's
    closed-form per-frame (doc_id + i) bitrate/padding formulas —
    pure SQL, no walker, so the sync walk, range cut and split walk
    are gated against an independent derivation."""
    from gemmsql.pipeline.mp3 import (
        _BR_CASE,
        MP3_CRC_MOD,
        MP3_FRAMES_BASE,
        MP3_FRAMES_MOD,
    )

    return f"""
WITH d AS (
  SELECT doc_id,
         {MP3_FRAMES_BASE} + doc_id % {MP3_FRAMES_MOD} AS nf,
         CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
              ELSE 32000 END AS sr,
         CASE WHEN doc_id % {MP3_CRC_MOD} = 0 THEN 1 ELSE 0 END AS prot
  FROM documents
),
fr AS (
  SELECT d.doc_id, s.i, d.sr, d.prot,
         {_BR_CASE} AS kbps,
         (doc_id + i) % 2 AS pad
  FROM d
  JOIN generate_series(0, {MP3_FRAMES_BASE + MP3_FRAMES_MOD - 2}) s(i)
    ON s.i < d.nf
)
SELECT doc_id,
  CAST(i AS BIGINT) AS frame_idx,
  CAST(kbps AS BIGINT) AS kbps,
  CAST(FLOOR(144000.0 * kbps / sr) AS BIGINT) + pad AS frame_bytes,
  CAST(pad AS BIGINT) AS padded,
  CAST(prot AS BIGINT) AS protected
FROM fr
"""
