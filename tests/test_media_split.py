"""Splittable media reader (gemmsql/pipeline/media_split.py): the
range-union-equals-whole-file contract, index validation, and the
Spark op end-to-end — for both container formats and for every
frames_per_split shape (1 = max parallelism, mid, and larger than the
file = the old one-task path)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from gemmsql.pipeline.flac import decode_flac, encode_flac, _synth_samples
from gemmsql.pipeline.jpeg import decode_jpeg_gray, encode_jpeg_gray
from gemmsql.pipeline.media_split import (
    avi_frame_index,
    decode_avi_range,
    decode_flac_range,
    flac_frame_index,
    read_media_ranges,
    split_avi,
    split_flac,
)
from gemmsql.pipeline.video import _video_frame, decode_avi_mjpeg, \
    encode_avi_mjpeg


def _avi_payload(doc_id: int = 7, n_frames: int = 9) -> bytes:
    frames = [
        encode_jpeg_gray(_video_frame(doc_id, i, 2)) for i in range(n_frames)
    ]
    return encode_avi_mjpeg(frames, width=16, height=16, fps=10)


def _flac_payloads() -> list[bytes]:
    rng = np.random.default_rng(3)
    mono = _synth_samples(5)
    n = 200
    left = np.cumsum(rng.integers(-16, 16, n)).astype(np.int16)
    right = (left + rng.integers(-3, 4, n)).astype(np.int16)
    stereo = np.stack([left, right], axis=1)
    return [
        encode_flac(mono, 16000),
        encode_flac(mono, 16000, prefer_lpc=True),
        encode_flac(stereo, 44100),
    ]


# ----------------------------------------------------------- AVI units


def test_avi_index_matches_container_walk():
    payload = _avi_payload()
    whole, meta = decode_avi_mjpeg(payload)
    idx = avi_frame_index(payload)
    assert len(idx) == meta["n_frames"] == len(whole)
    for (off, sz), frame in zip(idx, whole):
        assert payload[off + 8 : off + 8 + sz] == frame


@pytest.mark.parametrize("fps_split", [1, 2, 4, 100])
def test_avi_range_union_equals_whole_decode(fps_split):
    payload = _avi_payload()
    whole, _ = decode_avi_mjpeg(payload)
    got: list[bytes] = []
    for s in split_avi(payload, fps_split):
        part = decode_avi_range(s["chunk"], s["n_frames"])
        assert len(part) == s["n_frames"]
        assert s["frame_lo"] == len(got)
        got.extend(part)
    assert got == whole
    if fps_split == 1:
        assert len(split_avi(payload, 1)) == len(whole)  # max parallelism


def test_avi_corrupt_split_is_isolated():
    """A flipped byte inside one split's frame body breaks THAT
    split's decode (JPEG structure/pixels) without touching others."""
    payload = _avi_payload()
    splits = split_avi(payload, 2)
    bad = bytearray(splits[1]["chunk"])
    bad[len(bad) // 2] ^= 0xFF
    whole, _ = decode_avi_mjpeg(payload)
    for i, s in enumerate(splits):
        chunk = bytes(bad) if i == 1 else s["chunk"]
        if i == 1:
            try:
                frames = decode_avi_range(chunk, s["n_frames"])
                # structurally valid corruption must still change data
                assert frames != whole[s["frame_lo"] :
                                       s["frame_lo"] + s["n_frames"]]
            except ValueError:
                pass
        else:
            assert decode_avi_range(chunk, s["n_frames"]) == whole[
                s["frame_lo"] : s["frame_lo"] + s["n_frames"]
            ]


# ---------------------------------------------------------- FLAC units


@pytest.mark.parametrize("pi", [0, 1, 2], ids=["mono", "mono_lpc", "stereo"])
@pytest.mark.parametrize("fps_split", [1, 3, 100])
def test_flac_range_union_equals_whole_decode(pi, fps_split):
    payload = _flac_payloads()[pi]
    whole, _rate = decode_flac(payload)
    info, splits = split_flac(payload, fps_split)
    rate, channels, bps = info
    parts = [
        decode_flac_range(
            s["chunk"], rate, channels, bps, s["frame_lo"], s["n_frames"]
        )
        for s in splits
    ]
    union = np.concatenate(parts)
    assert np.array_equal(union.astype(np.int16), whole)
    if fps_split == 1:
        assert len(splits) == -(-len(whole) // 32)  # one split per frame


def test_flac_sync_index_counts_frames():
    for payload in _flac_payloads():
        whole, _ = decode_flac(payload)
        _info, offsets = flac_frame_index(payload)
        assert len(offsets) == -(-len(whole) // 32)
        # offsets strictly increasing and the first is the first frame
        assert all(a < b for a, b in zip(offsets, offsets[1:]))


def test_flac_corrupt_split_is_isolated():
    payload = _flac_payloads()[1]
    info, splits = split_flac(payload, 2)
    rate, channels, bps = info
    whole, _ = decode_flac(payload)
    bad = bytearray(splits[1]["chunk"])
    bad[len(bad) - 3] ^= 0x41
    with pytest.raises(ValueError):
        decode_flac_range(
            bytes(bad), rate, channels, bps,
            splits[1]["frame_lo"], splits[1]["n_frames"],
        )
    for s in (splits[0], *splits[2:]):
        got = decode_flac_range(
            s["chunk"], rate, channels, bps, s["frame_lo"], s["n_frames"]
        )
        lo = s["frame_lo"] * 32
        assert np.array_equal(
            got.astype(np.int16), whole[lo : lo + len(got)]
        )


# ------------------------------------------------------------ Spark op


def _whole_file_frame_md5s(fmt: str, doc_id: int, payload: bytes):
    rows = []
    if fmt == "avi":
        frames, _ = decode_avi_mjpeg(payload)
        for i, f in enumerate(frames):
            img = decode_jpeg_gray(f).astype(np.int16)
            rows.append((doc_id, i, img.size,
                         hashlib.md5(img.tobytes()).hexdigest()))
    else:
        whole, _ = decode_flac(payload)
        for i in range(0, -(-len(whole) // 32)):
            blk = whole[i * 32 : (i + 1) * 32]
            rows.append((doc_id, i, len(blk),
                         hashlib.md5(blk.tobytes()).hexdigest()))
    return sorted(rows)


@pytest.mark.parametrize("fmt", ["avi", "flac"])
def test_read_media_ranges_spark_end_to_end(spark, fmt):
    if fmt == "avi":
        payloads = {d: _avi_payload(d, 6 + d % 3) for d in (1, 2, 3)}
    else:
        payloads = {
            d: encode_flac(_synth_samples(d), 16000, prefer_lpc=d % 2 == 1)
            for d in (1, 2, 3)
        }
    df = spark.createDataFrame(
        [(d, bytearray(p)) for d, p in payloads.items()],
        "doc_id long, payload binary",
    )
    out = read_media_ranges(df, fmt, frames_per_split=2)
    got = sorted(
        (r.doc_id, r.frame_idx, r.n_values, r.content_md5)
        for r in out.collect()
    )
    expect = []
    for d, p in payloads.items():
        expect.extend(_whole_file_frame_md5s(fmt, d, p))
    assert got == sorted(expect)
    # the op must actually produce >1 split per file (intra-file
    # parallelism), not fall back to one task per payload
    if fmt == "avi":
        assert all(len(split_avi(p, 2)) > 1 for p in payloads.values())
    else:
        assert all(
            len(split_flac(p, 2)[1]) > 1 for p in payloads.values()
        )


# ------------------------------------------------------------- MP3 side


@pytest.mark.parametrize("fps_split", [1, 2, 5, 100])
def test_mp3_range_union_equals_whole_walk(fps_split):
    """Union of per-split walks == the whole-file walk's frame list,
    for every cut granularity (VERDICT r9 next #4)."""
    from gemmsql.pipeline.media_split import split_mp3, walk_mp3_range
    from gemmsql.pipeline.mp3 import synth_mp3_payload, walk_mp3

    for doc_id in (0, 1, 2, 3, 4, 7, 12):
        p = synth_mp3_payload(doc_id)
        whole: list = []
        m = walk_mp3(p, collect=whole)
        (sr, ch), splits = split_mp3(p, fps_split)
        assert (sr, ch) == (m["sample_rate"], m["channels"])
        got = []
        for s in splits:
            fr = walk_mp3_range(s["chunk"], sr, ch, s["n_frames"])
            got += [
                (s["frame_lo"] + k, sz, kb, pad, pr)
                for k, (_off, sz, kb, pad, pr) in enumerate(fr)
            ]
        assert got == [
            (i, sz, kb, pad, pr)
            for i, (_off, sz, kb, pad, pr) in enumerate(whole)
        ]
        # ranges exclude the Info frame and the tags: total range
        # bytes == total audio bytes
        assert sum(len(s["chunk"]) for s in splits) \
            == m["total_audio_bytes"]


def test_mp3_corrupt_split_is_isolated():
    """A flipped structural byte inside ONE split's range must raise
    in that split's walk; sibling splits stay walkable."""
    from gemmsql.pipeline.media_split import split_mp3, walk_mp3_range
    from gemmsql.pipeline.mp3 import synth_mp3_payload

    p = synth_mp3_payload(3)  # doc 3: CRC-protected, 7 audio frames
    (sr, ch), splits = split_mp3(p, 2)
    assert len(splits) >= 3
    bad = bytearray(splits[1]["chunk"])
    bad[5] ^= 0xFF  # inside the protected side info -> CRC mismatch
    with pytest.raises(ValueError):
        walk_mp3_range(bytes(bad), sr, ch, splits[1]["n_frames"])
    for i in (0, 2):
        walk_mp3_range(
            splits[i]["chunk"], sr, ch, splits[i]["n_frames"]
        )
    # truncation is detected too
    with pytest.raises(ValueError):
        walk_mp3_range(
            splits[0]["chunk"][:-1], sr, ch, splits[0]["n_frames"]
        )
    # and a wrong pinned sample rate
    with pytest.raises(ValueError):
        walk_mp3_range(
            splits[0]["chunk"], sr + 1, ch, splits[0]["n_frames"]
        )


# ----------------------------------------- byte-sized splits (r11 #6)


@pytest.mark.parametrize("tgt", [1, 200, 10**9],
                         ids=["one-frame", "mid", "whole-file"])
def test_byte_sized_splits_union_parity(tgt):
    """Splits sized by target BYTES (the production sizing — VERDICT
    r10 next #6) yield the same union as the whole-file decode for
    every format; tgt=1 degenerates to one frame per split, a huge
    target to one split per file."""
    # AVI
    payload = _avi_payload()
    whole, _ = decode_avi_mjpeg(payload)
    splits = split_avi(payload, target_split_bytes=tgt)
    got: list[bytes] = []
    for s in splits:
        assert s["frame_lo"] == len(got)
        got.extend(decode_avi_range(s["chunk"], s["n_frames"]))
    assert got == whole
    if tgt == 1:
        assert len(splits) == len(whole)
    if tgt == 10**9:
        assert len(splits) == 1
    # FLAC (stereo — the hardest decode path)
    fl = _flac_payloads()[2]
    wf, _ = decode_flac(fl)
    info, fsplits = split_flac(fl, target_split_bytes=tgt)
    rate, channels, bps = info
    parts = [
        decode_flac_range(
            s["chunk"], rate, channels, bps, s["frame_lo"], s["n_frames"]
        )
        for s in fsplits
    ]
    assert np.array_equal(np.concatenate(parts).astype(np.int16), wf)
    if tgt == 10**9:
        assert len(fsplits) == 1
    # MP3
    from gemmsql.pipeline.media_split import split_mp3, walk_mp3_range
    from gemmsql.pipeline.mp3 import synth_mp3_payload, walk_mp3

    p = synth_mp3_payload(5)
    mwhole: list = []
    m = walk_mp3(p, collect=mwhole)
    (sr, ch), msplits = split_mp3(p, target_split_bytes=tgt)
    mgot = []
    for s in msplits:
        fr = walk_mp3_range(s["chunk"], sr, ch, s["n_frames"])
        mgot += [
            (s["frame_lo"] + k, sz, kb, pad, pr)
            for k, (_off, sz, kb, pad, pr) in enumerate(fr)
        ]
    assert mgot == [
        (i, sz, kb, pad, pr)
        for i, (_off, sz, kb, pad, pr) in enumerate(mwhole)
    ]
    if tgt == 10**9:
        assert len(msplits) == 1
