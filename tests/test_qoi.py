"""QOI codec (`gemmsql/pipeline/qoi.py`): round-trips, per-op
coverage, strict-parse fuzz.  The corpus-scale Spark-vs-DuckDB hash
gate runs in tests/test_rotation.py (`qoi_features`)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gemmsql.pipeline.qoi import (
    _END,
    _qoi_pixels,
    decode_qoi,
    encode_qoi,
)


def _ops(enc: bytes) -> dict[str, int]:
    ops: dict[str, int] = {}
    pos = 14
    while pos < len(enc) - len(_END):
        b = enc[pos]
        if b == 0xFE:
            ops["rgb"] = ops.get("rgb", 0) + 1
            pos += 4
        elif b == 0xFF:
            ops["rgba"] = ops.get("rgba", 0) + 1
            pos += 5
        else:
            tag = {0x00: "index", 0x40: "diff",
                   0x80: "luma", 0xC0: "run"}[b & 0xC0]
            ops[tag] = ops.get(tag, 0) + 1
            pos += 2 if tag == "luma" else 1
    return ops


def test_roundtrip_random_noise():
    rng = np.random.default_rng(7)
    for shape in ((8, 16, 3), (15, 16, 3), (1, 1, 3), (3, 60, 3)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_qoi(encode_qoi(img)), img)


def test_each_op_roundtrips_and_is_emitted():
    # RUN: a flat image is one long run (plus the first literal)
    flat = np.full((9, 16, 3), 77, dtype=np.uint8)
    enc = encode_qoi(flat)
    assert np.array_equal(decode_qoi(enc), flat)
    assert _ops(enc).get("run", 0) >= 2  # 144 px / 62-cap => >= 2 runs
    # DIFF: +1 per channel per pixel stays in the -2..1 window
    ramp = np.cumsum(np.ones((1, 64, 3), np.uint8), axis=1) % 256
    ramp = ramp.astype(np.uint8)
    enc = encode_qoi(ramp)
    assert np.array_equal(decode_qoi(enc), ramp)
    assert _ops(enc).get("diff", 0) > 50
    # LUMA: +5 green-led steps exceed DIFF but fit the luma window
    g = (np.arange(64, dtype=np.int64) * 5 % 256).astype(np.uint8)
    luma = np.stack([g, g, g], axis=-1)[None, :, :]
    enc = encode_qoi(luma)
    assert np.array_equal(decode_qoi(enc), luma)
    assert _ops(enc).get("luma", 0) > 50
    # INDEX: alternating between two distant colors hits the table
    pal = np.zeros((1, 64, 3), dtype=np.uint8)
    pal[0, ::2] = (200, 10, 40)
    pal[0, 1::2] = (17, 99, 3)
    enc = encode_qoi(pal)
    assert np.array_equal(decode_qoi(enc), pal)
    assert _ops(enc).get("index", 0) > 50
    # RGB literal: big uncorrelated jumps
    rng = np.random.default_rng(0)
    jumps = rng.integers(0, 256, size=(1, 64, 3), dtype=np.uint8)
    enc = encode_qoi(jumps)
    assert np.array_equal(decode_qoi(enc), jumps)
    assert _ops(enc).get("rgb", 0) > 10


def test_run_caps_at_62():
    # 200 identical pixels must split into 62+62+62+14, never touch
    # the 0xFE/0xFF reserved tag values
    flat = np.full((1, 200, 3), 5, dtype=np.uint8)
    enc = encode_qoi(flat)
    runs = [b for b in enc[14:-len(_END)] if (b & 0xC0) == 0xC0
            and b not in (0xFE, 0xFF)]
    assert max((b & 0x3F) + 1 for b in runs) <= 62
    assert np.array_equal(decode_qoi(enc), flat)


def test_corpus_exercises_all_five_ops():
    ops: dict[str, int] = {}
    for d in range(30):
        img = _qoi_pixels(d)
        enc = encode_qoi(img)
        assert np.array_equal(decode_qoi(enc), img), d
        for k, v in _ops(enc).items():
            ops[k] = ops.get(k, 0) + v
    for op in ("rgb", "index", "diff", "luma", "run"):
        assert ops.get(op, 0) > 0, (op, ops)


def test_strict_parse_rejects_corruption():
    img = _qoi_pixels(3)
    enc = encode_qoi(img)
    with pytest.raises(ValueError):
        decode_qoi(b"QOIF" + enc[4:])            # bad magic
    with pytest.raises(ValueError):
        decode_qoi(enc[:len(enc) // 2])          # truncation
    with pytest.raises(ValueError):
        decode_qoi(enc[:-1])                     # clipped end marker
    with pytest.raises(ValueError):
        decode_qoi(enc + b"\x00")                # trailing bytes
    # pixel-count overflow: header claims fewer pixels than the
    # stream encodes
    w, h = struct.unpack(">II", enc[4:12])
    small = enc[:4] + struct.pack(">II", w, h - 1) + enc[12:]
    with pytest.raises(ValueError):
        decode_qoi(small)
    with pytest.raises(ValueError):
        decode_qoi(enc[:12] + bytes([7]) + enc[13:])  # bad channels
    # a multi-byte op whose operands spill into the end-marker region
    # must raise ValueError, never IndexError (ADVICE r12 #5): splice
    # an RGB op as the LAST byte before the end marker
    one_px = encode_qoi(np.array([[[1, 2, 3]]], dtype=np.uint8))
    body_end = len(one_px) - 8           # end marker is 8 bytes
    clipped = one_px[:14] + b"\xfe" + one_px[body_end:]
    with pytest.raises(ValueError, match="underrun"):
        decode_qoi(clipped)
    # same for LUMA's second byte
    clipped = one_px[:14] + b"\x80" + one_px[body_end:]
    with pytest.raises(ValueError, match="underrun"):
        decode_qoi(clipped)


def test_wraparound_deltas():
    # 255 -> 0 is a +1 wraparound DIFF, 0 -> 255 a -1
    img = np.array([[[255, 255, 255], [0, 0, 0], [255, 255, 255]]],
                   dtype=np.uint8)
    enc = encode_qoi(img)
    assert np.array_equal(decode_qoi(enc), img)
    assert _ops(enc).get("diff", 0) >= 1


def test_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.integers(min_value=0, max_value=2**32 - 1),
           st.integers(min_value=1, max_value=24),
           st.integers(min_value=1, max_value=24))
    def check(seed, h, w):
        rng = np.random.default_rng(seed)
        # mix smooth and noisy regions so every op family can fire
        base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        smooth = np.cumsum(
            rng.integers(-1, 3, size=(h, w, 3)), axis=1) % 256
        img = np.where(rng.random((h, w, 1)) < 0.5,
                       base, smooth).astype(np.uint8)
        assert np.array_equal(decode_qoi(encode_qoi(img)), img)

    check()
