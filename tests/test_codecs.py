"""Unit, differential, and fuzz tests for the round-7 codec tier:
the IMA-ADPCM lossy-audio codec (gemmsql/pipeline/adpcm.py) and the
RIFF/AVI MJPEG video container (gemmsql/pipeline/video.py).  The
gated corpus queries' DuckDB hash parity lives in
tests/test_gate_parity; these tests exercise the codecs themselves —
the vectorized decoder against an independent scalar reference over
the FULL nibble/state space (not just the gate's exactness
subdomain), step-index adaptation and both clamps, container
structural validation under corruption, and the sampling contract.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gemmsql.pipeline.adpcm import (
    ADPCM_SPB,
    INDEX_TABLE,
    STEP_TABLE,
    WAVE_FORMAT_IMA_ADPCM,
    _gate_nibbles,
    _gate_pred,
    decode_adpcm,
    encode_adpcm,
)
from gemmsql.pipeline.jpeg import decode_jpeg_gray, encode_jpeg_gray
from gemmsql.pipeline.video import (
    VIDEO_FRAMES_BASE,
    VIDEO_FRAMES_MOD,
    VIDEO_HB_MOD,
    VIDEO_STRIDE,
    VIDEO_W,
    _video_frame,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    sample_video_frames,
    with_video_payload,
)

# --------------------------------------------------------------- ADPCM


def _scalar_ima_decode(payload: bytes):
    """Independent scalar IMA-ADPCM reference, written straight from
    the public spec — shares no code with the vectorized decoder."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos, rate, ba, spb, nsamp, data = 12, None, None, None, None, None
    while pos + 8 <= len(payload):
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            _t, _ch, rate, _br, ba, _bits, _cb, spb = struct.unpack_from(
                "<HHIIHHHH", body, 0
            )
        elif cid == b"fact":
            nsamp = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    out = []
    for off in range(0, len(data), ba):
        blk = data[off : off + ba]
        pred = struct.unpack_from("<h", blk, 0)[0]
        idx = blk[2]
        out.append(pred)
        nibs = []
        for byte in blk[4:]:
            nibs.append(byte & 0xF)
            nibs.append(byte >> 4)
        for nib in nibs:
            step = int(STEP_TABLE[idx])
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            if nib & 8:
                d = -d
            pred = max(-32768, min(32767, pred + d))
            idx = max(0, min(88, idx + int(INDEX_TABLE[nib & 7])))
            out.append(pred)
    if nsamp is not None:
        out = out[:nsamp]
    return np.array(out, dtype=np.int16), rate


def test_adpcm_vectorized_decoder_matches_scalar_reference():
    # full state space: loud noise drives the step index up to its
    # clamp and the predictor into both int16 clamps
    rng = np.random.RandomState(3)
    for scale in (40, 3000, 30000):
        sig = np.clip(
            np.cumsum(rng.randint(-scale, scale + 1, 700)), -32768, 32767
        ).astype(np.int16)
        p = encode_adpcm(sig, 8000)
        dec, rate = decode_adpcm(p)
        ref, ref_rate = _scalar_ima_decode(p)
        assert rate == ref_rate == 8000
        assert np.array_equal(dec, ref)


def test_adpcm_decoder_accepts_arbitrary_nibbles():
    # hand-built wire bytes with md5-free full-range nibbles,
    # including index-raising magnitudes the gate subdomain avoids
    rng = np.random.RandomState(9)
    nibs = rng.randint(0, 16, 64).astype(np.uint8)
    data = struct.pack("<hBB", 100, 20, 0) + bytes(
        nibs[0::2] | (nibs[1::2] << 4)
    )
    ba = 4 + 32
    spb = 2 * 32 + 1
    fmt = struct.pack(
        "<4sIHHIIHHHH", b"fmt ", 20, WAVE_FORMAT_IMA_ADPCM, 1, 8000,
        (8000 * ba + spb - 1) // spb, ba, 4, 2, spb,
    )
    chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff = b"WAVE" + fmt + chunk
    payload = struct.pack("<4sI", b"RIFF", len(riff)) + riff
    dec, _ = decode_adpcm(payload)
    ref, _ = _scalar_ima_decode(payload)
    assert np.array_equal(dec, ref)
    assert len(dec) == spb  # no fact chunk -> all decoded samples kept


def test_adpcm_roundtrip_error_is_bounded():
    # lossy, but for a gentle signal the reconstruction must track:
    # quantization error per step is bounded by the current step size
    rng = np.random.RandomState(5)
    sig = np.cumsum(rng.randint(-30, 31, 400)).astype(np.int16)
    dec, _ = decode_adpcm(encode_adpcm(sig, 16000))
    err = np.abs(dec.astype(np.int64) - sig.astype(np.int64))
    assert err.max() < 1000
    assert np.sqrt(float((err**2).mean())) < 100


def test_adpcm_compresses_4x():
    sig = np.cumsum(np.random.RandomState(1).randint(-50, 51, 2048))
    p = encode_adpcm(sig.astype(np.int16), 16000)
    # 4 bits/sample vs 16: wire must be well under half of PCM16
    assert len(p) < 2048 * 2 * 0.35


def test_adpcm_fact_truncates_and_validates():
    sig = np.arange(100, dtype=np.int16)
    p = encode_adpcm(sig, 16000)
    dec, _ = decode_adpcm(p)
    assert len(dec) == 100  # fact trims the padded final block
    # fact count beyond decoded length must raise
    i = p.find(b"fact")
    bad = bytearray(p)
    struct.pack_into("<I", bad, i + 8, 10_000)
    with pytest.raises(ValueError):
        decode_adpcm(bytes(bad))


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:40],                                # truncated
        lambda b: b"RIFX" + b[4:],                       # bad magic
        lambda b: b.replace(b"WAVE", b"AVI ", 1),        # wrong form
        lambda b: b.replace(                             # PCM tag
            struct.pack("<H", WAVE_FORMAT_IMA_ADPCM), b"\x01\x00", 1
        ),
        lambda b: b.replace(b"data", b"dat_", 1),        # no data chunk
    ],
    ids=["truncated", "magic", "form", "fmt_tag", "no_data"],
)
def test_adpcm_structural_corruption_raises(mutate):
    p = encode_adpcm(np.arange(80, dtype=np.int16), 16000)
    with pytest.raises(ValueError):
        decode_adpcm(bytes(mutate(p)))


def test_adpcm_gate_subdomain_pins_step_index():
    # the gate synthesis promises: every nibble magnitude <= 3, so a
    # block starting at index 0 keeps step 7 throughout — this is the
    # invariant the DuckDB oracle's pure-cumsum replay relies on
    for doc_id in (0, 17, 999):
        for b in range(3):
            nibs = _gate_nibbles(doc_id, b)
            assert len(nibs) == ADPCM_SPB - 1
            assert all((n & 7) <= 3 for n in nibs)
            assert -1024 <= _gate_pred(doc_id, b) < 1024


# ----------------------------------------------------------- AVI/MJPEG


def _doc_avi(doc_id: int) -> tuple[list[bytes], bytes, int, int]:
    hb = 1 + doc_id % VIDEO_HB_MOD
    nf = VIDEO_FRAMES_BASE + doc_id % VIDEO_FRAMES_MOD
    frames = [
        encode_jpeg_gray(_video_frame(doc_id, f, hb)) for f in range(nf)
    ]
    return frames, encode_avi_mjpeg(frames, VIDEO_W, hb * 8, 10), hb, nf


def test_avi_roundtrip_bitexact():
    for doc_id in (0, 1, 7, 42):
        frames, avi, hb, nf = _doc_avi(doc_id)
        out, meta = decode_avi_mjpeg(avi)
        assert out == frames
        assert meta == {
            "width": VIDEO_W, "height": hb * 8, "fps": 10, "n_frames": nf
        }


def test_avi_sampled_frames_decode_to_synth_pixels():
    # container walk + stride sampling + JPEG decode == synthesized
    # pixels exactly (flat-block exactness subdomain)
    frames, avi, hb, nf = _doc_avi(11)
    sampled = sample_video_frames(avi, stride=VIDEO_STRIDE)
    assert [i for i, _ in sampled] == list(range(0, nf, VIDEO_STRIDE))
    for i, f in sampled:
        assert np.array_equal(
            decode_jpeg_gray(f), _video_frame(11, i, hb)
        )


def test_avi_odd_frame_sizes_stay_word_aligned():
    # JPEG payloads with odd byte counts force the pad-byte path on
    # the wire; chunks must still parse and round-trip
    frames = []
    f = 0
    while len(frames) < 3:
        p = encode_jpeg_gray(_video_frame(500 + f, 0, 1))
        if len(p) & 1:
            frames.append(p)
        f += 1
    avi = encode_avi_mjpeg(frames, VIDEO_W, 8, 10)
    out, meta = decode_avi_mjpeg(avi)
    assert out == frames and meta["n_frames"] == 3


def _mutations():
    def trunc(b):
        return b[:60]

    def wrong_form(b):
        return b.replace(b"AVI ", b"WAVE", 1)

    def bad_handler(b):
        i = b.find(b"MJPG")
        m = bytearray(b)
        m[i] = ord("X")
        return bytes(m)

    def frame_count(b):
        i = b.find(b"avih")
        m = bytearray(b)
        m[i + 8 + 16] ^= 1  # dwTotalFrames
        return bytes(m)

    def idx1_size(b):
        i = b.find(b"idx1")
        m = bytearray(b)
        m[i + 8 + 12] ^= 0xFF  # entry 0 size field
        return bytes(m)

    def idx1_missing(b):
        i = b.find(b"idx1")
        return b[:i - 8] if i >= 8 else b  # drop chunk, keep HASINDEX

    def movi_tag(b):
        i = b.find(b"00dc")
        m = bytearray(b)
        m[i] = ord("9")
        return bytes(m)

    return [trunc, wrong_form, bad_handler, frame_count, idx1_size,
            idx1_missing, movi_tag]


@pytest.mark.parametrize(
    "mutate", _mutations(),
    ids=["trunc", "form", "handler", "frame_count", "idx1_size",
         "idx1_missing", "movi_tag"],
)
def test_avi_structural_corruption_raises(mutate):
    _frames, avi, _hb, _nf = _doc_avi(3)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(mutate(avi))


def test_avi_every_byte_corruption_never_crashes_unvalidated():
    # single-byte flips must either raise ValueError (structural) or
    # decode to SOMETHING — never escape as IndexError/struct.error
    _frames, avi, _hb, _nf = _doc_avi(5)
    rng = np.random.RandomState(2)
    for pos in rng.choice(len(avi), 200, replace=False):
        m = bytearray(avi)
        m[pos] ^= 0x5A
        try:
            decode_avi_mjpeg(bytes(m))
        except ValueError:
            pass


def test_video_payload_plan_is_narrow(spark):
    # synthesis + feature extraction must stay a zero-shuffle chain
    from gemmsql.pipeline.video import video_features
    from tests.conftest import SF_SMOKE

    plan = video_features(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_adpcm_batch_decode_matches_per_payload():
    """decode_adpcm_batch (one vectorized recursion across every
    payload's blocks, round 9) must be sample-identical to mapping
    decode_adpcm — mixed signals, block counts, and fact
    truncations."""
    import numpy as np

    from gemmsql.pipeline.adpcm import decode_adpcm_batch

    rng = np.random.default_rng(23)
    payloads = []
    for k in range(7):
        n = 40 + 37 * k
        sig = np.cumsum(rng.integers(-300, 300, n)).clip(-32768, 32767)
        payloads.append(encode_adpcm(sig.astype(np.int16), 8000 + k))
    batch = decode_adpcm_batch(payloads)
    for p, (got_s, got_r) in zip(payloads, batch):
        want_s, want_r = decode_adpcm(p)
        assert got_r == want_r
        assert np.array_equal(got_s, want_s)


def test_adpcm_stereo_roundtrip_and_channel_equivalence():
    """Stereo IMA-ADPCM (round 9): per-channel 4-byte headers +
    4-byte interleave groups.  The decoded stereo stream must equal
    the per-channel MONO decode of the same signals (channel
    recursions are independent; the container only interleaves), and
    the lossy error stays step-bounded like mono."""
    import numpy as np

    from gemmsql.pipeline.adpcm import decode_adpcm_batch

    rng = np.random.default_rng(29)
    n = 150
    l = np.cumsum(rng.integers(-200, 200, n)).clip(-32768, 32767)
    r = np.cumsum(rng.integers(-200, 200, n)).clip(-32768, 32767)
    st = np.stack([l, r], axis=1).astype(np.int16)
    p = encode_adpcm(st, 16000)
    dec, rate = decode_adpcm(p)
    assert dec.shape == (n, 2) and rate == 16000
    dl, _ = decode_adpcm(encode_adpcm(st[:, 0], 16000))
    dr, _ = decode_adpcm(encode_adpcm(st[:, 1], 16000))
    assert np.array_equal(dec[:, 0], dl)
    assert np.array_equal(dec[:, 1], dr)
    # mixed mono/stereo batch == per-payload decode
    batch = decode_adpcm_batch([p, encode_adpcm(st[:, 0], 16000)])
    assert np.array_equal(batch[0][0], dec)
    assert np.array_equal(batch[1][0], dl)


def test_adpcm_stereo_validation():
    import numpy as np
    import pytest as _pytest

    st = np.zeros((40, 2), np.int16)
    with _pytest.raises(ValueError, match="multiple of 4|% 4"):
        encode_adpcm(st, 8000, data_bytes_per_block=18)
    # wSamplesPerBlock inconsistency detected on decode
    p = bytearray(encode_adpcm(st, 8000))
    # fmt chunk starts at byte 12; wSamplesPerBlock is the last H of
    # the <4sIHHIIHHHH layout = offset 12+8+18 = 38
    import struct as _struct

    (spb,) = _struct.unpack_from("<H", p, 38)
    _struct.pack_into("<H", p, 38, spb + 2)
    with _pytest.raises(ValueError, match="wSamplesPerBlock"):
        decode_adpcm(bytes(p))
