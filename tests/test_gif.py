"""GIF89a codec tier: LZW bit-exactness, container round-trips,
interlace/palette semantics, strict-parser corruption fuzz.

GIF has no checksums, so corruption detection is entirely the
parser's structural strictness — the fuzz here pins that every
single-byte flip either raises or changes the decoded output."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gemmsql.pipeline.gif import (
    _GRAY,
    _GRAY_REV,
    _gif_frame_values,
    decode_gif,
    encode_gif,
    interlace_order,
    lzw_decode,
    lzw_encode,
)


# ------------------------------------------------------------------ LZW

def test_lzw_bit_exact_vector():
    """Hand-computed stream for [0,0,0,0] at min code size 2:
    codes clear(4),0,6,0,eoi(5) -> LSB-first packed bytes 84 51
    (the final 0 is emitted at 3 bits, the EOI at 4 — the width
    change after slot 8 is filled is part of the pin)."""
    enc = lzw_encode(b"\x00" * 4, 2)
    assert enc == bytes([0x84, 0x51])
    assert lzw_decode(enc, 2, 4) == b"\x00" * 4


@pytest.mark.parametrize(
    "n", [1, 10, 255, 256, 400, 511, 512, 513, 1000, 5000, 20000]
)
def test_lzw_round_trip_random(n):
    """Random bytes across every width boundary; n=20000 additions
    overflow slot 4095, so the clear-and-reset path round-trips too."""
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data, 8), 8, n) == data


def test_lzw_round_trip_low_code_size():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 4, 1000, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(data, 2), 2, 1000) == data


def test_lzw_round_trip_runs():
    """Long single-value runs exercise the KwKwK chain."""
    data = b"\x07" * 10000
    assert lzw_decode(lzw_encode(data, 8), 8, 10000) == data


def test_lzw_strictness():
    data = bytes(range(64))
    enc = lzw_encode(data, 8)
    with pytest.raises(ValueError):
        lzw_decode(enc[:-2], 8, 64)  # truncated before EOI
    with pytest.raises(ValueError):
        lzw_decode(enc + b"\x00", 8, 64)  # trailing byte after EOI
    with pytest.raises(ValueError):
        lzw_decode(enc, 8, 63)  # pixel overrun
    with pytest.raises(ValueError):
        lzw_encode(data, 1)  # bad code size
    with pytest.raises(ValueError):
        lzw_encode(b"\x05", 2)  # index exceeds the code space
    # a root-space code stream whose first code is not a root
    with pytest.raises(ValueError):
        # width 3 codes: clear(4) then 6 (not yet assigned)
        lzw_decode(bytes([0b00_110_100]), 2, 4)


# ------------------------------------------------------------ interlace

def test_interlace_order_matches_spec():
    """The 8/8/4/2 pass structure from the GIF89a spec, hand-derived —
    pins the map itself, not just its invertibility (an encoder/
    decoder pair sharing a WRONG map would still round-trip)."""
    assert interlace_order(8) == [0, 4, 2, 6, 1, 3, 5, 7]
    assert interlace_order(16) == [
        0, 8, 4, 12, 2, 6, 10, 14, 1, 3, 5, 7, 9, 11, 13, 15
    ]
    assert interlace_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    for h in (1, 2, 3, 5, 24, 32, 37):
        assert sorted(interlace_order(h)) == list(range(h))


# ------------------------------------------------------------ container

def _random_animation(seed: int, h: int = 16, w: int = 16, nf: int = 3):
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, (h, w), dtype=np.uint8) for _ in range(nf)
    ]
    lpals = [
        rng.integers(0, 256, (256, 3), dtype=np.uint8) if i % 2 else None
        for i in range(nf)
    ]
    inter = [bool(i % 2) for i in range(nf)]
    delays = [5 * (i + 1) for i in range(nf)]
    return frames, lpals, inter, delays


def test_gif_round_trip_full_feature():
    frames, lpals, inter, delays = _random_animation(11, h=24)
    pal = np.random.default_rng(1).integers(0, 256, (256, 3), dtype=np.uint8)
    payload = encode_gif(
        frames, palette=pal, delays_cs=delays, local_palettes=lpals,
        interlace=inter, loop=7, bg=3, aspect=49,
    )
    dec, meta = decode_gif(payload)
    assert meta["width"] == 16 and meta["height"] == 24
    assert meta["n_frames"] == 3 and meta["loop"] == 7
    assert meta["bg_index"] == 3 and meta["aspect"] == 49
    assert meta["version"] == "89a"
    for i, fr in enumerate(dec):
        assert np.array_equal(fr["indices"], frames[i])
        assert fr["delay_cs"] == delays[i]
        assert fr["interlaced"] == inter[i]
        assert fr["local_palette"] == (lpals[i] is not None)
        expect = lpals[i] if lpals[i] is not None else pal
        assert np.array_equal(fr["palette"], expect)


def test_gif_round_trip_minimal():
    """No GCEs, no loop, small palette, GIF with one 4-color frame."""
    fr = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    dec, meta = decode_gif(encode_gif([fr], palette=pal))
    assert meta["loop"] is None
    assert dec[0]["delay_cs"] is None
    assert np.array_equal(dec[0]["indices"], fr)
    assert np.array_equal(dec[0]["palette"], pal)


def test_gif_large_frame_deep_codes():
    """128x128 random pixels force 10/11/12-bit codes and a
    mid-stream dictionary reset inside a real container."""
    rng = np.random.default_rng(5)
    fr = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    dec, _ = decode_gif(encode_gif([fr], palette=_GRAY))
    assert np.array_equal(dec[0]["indices"], fr)


def test_hand_built_gif_decodes():
    """A byte-literal GIF (2x2, 4-color table, all-zero pixels) built
    from the spec, embedding the hand-packed LZW stream — pins header
    layout and the decoder independently of our encoder."""
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x80 | (1 << 4) | 0x01, 0, 0)
        + bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        + bytes([2])                      # LZW min code size
        + bytes([2, 0x84, 0x51, 0])       # one sub-block + terminator
        + b"\x3b"
    )
    dec, meta = decode_gif(payload)
    assert meta["width"] == 2 and meta["height"] == 2
    assert meta["color_resolution"] == 2
    assert np.array_equal(dec[0]["indices"], np.zeros((2, 2), np.uint8))
    assert np.array_equal(dec[0]["palette"][0], [10, 20, 30])


def test_gif_structural_strictness():
    fr = np.zeros((4, 4), dtype=np.uint8)
    clean = encode_gif([fr], palette=_GRAY, delays_cs=[3])
    with pytest.raises(ValueError):
        decode_gif(clean[:-1])  # missing trailer
    with pytest.raises(ValueError):
        decode_gif(clean + b"\x00")  # bytes after trailer
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + clean)
    with pytest.raises(ValueError):
        encode_gif([], palette=_GRAY)
    with pytest.raises(ValueError):
        encode_gif([fr], palette=np.zeros((100, 3), np.uint8))  # not 2^n
    with pytest.raises(ValueError):
        # index 3 with a 2-entry palette
        encode_gif(
            [np.full((2, 2), 3, np.uint8)],
            palette=np.zeros((2, 3), np.uint8),
        )


# -------------------------------------------------------- gate fixtures

def _synth_payload(doc_id: int) -> bytes:
    from gemmsql.pipeline.gif import (
        GIF_DELAY_MOD,
        GIF_FRAMES_BASE,
        GIF_FRAMES_MOD,
        GIF_H_BASE,
        GIF_H_MOD,
        GIF_H_STEP,
        GIF_LOOP_MOD,
    )

    h = GIF_H_BASE + GIF_H_STEP * (doc_id % GIF_H_MOD)
    nf = GIF_FRAMES_BASE + doc_id % GIF_FRAMES_MOD
    delay = 1 + doc_id % GIF_DELAY_MOD
    frames, lpals, inter = [], [], []
    for f in range(nf):
        v = _gif_frame_values(doc_id, f, h)
        frames.append(255 - v if f % 2 else v)
        lpals.append(_GRAY_REV if f % 2 else None)
        inter.append(bool(f % 2))
    return encode_gif(
        frames, palette=_GRAY, delays_cs=[delay] * nf,
        local_palettes=lpals, interlace=inter, loop=doc_id % GIF_LOOP_MOD,
    )


def test_local_palette_and_interlace_recover_the_formula():
    """Odd frames store complemented indices under a reversed local
    palette, interlaced — decoded GRAY values must still equal the
    md5 formula (fails if either indirection is skipped)."""
    for doc_id in (2, 5, 7):  # covers h = 32, 24, 16
        frames, _meta = decode_gif(_synth_payload(doc_id))
        for f, fr in enumerate(frames):
            gray = fr["palette"][fr["indices"], 0]
            h = gray.shape[0]
            assert np.array_equal(gray, _gif_frame_values(doc_id, f, h)), (
                doc_id, f,
            )


def _snapshot(payload: bytes):
    frames, meta = decode_gif(payload)
    return (
        tuple(sorted(meta.items())),
        tuple(
            (
                fr["indices"].tobytes(),
                fr["palette"].tobytes(),
                fr["delay_cs"],
                fr["disposal"],
                fr["transparent_idx"],
                fr["left"],
                fr["top"],
                fr["interlaced"],
                fr["local_palette"],
            )
            for fr in frames
        ),
    )


def test_corruption_is_always_visible():
    """GIF carries no CRCs, so the contract is raise-OR-differ: every
    single-byte flip must either fail a structural check or change
    the decoded output (indices/palette/extension fields, all of
    which the decoder exposes).  No silent window."""
    clean = _synth_payload(5)
    base = _snapshot(clean)
    for pos in range(len(clean)):
        corrupt = bytearray(clean)
        corrupt[pos] ^= 0x41
        try:
            snap = _snapshot(bytes(corrupt))
        except (ValueError, struct.error, KeyError):
            continue
        assert snap != base, f"silent corruption at byte {pos}"
