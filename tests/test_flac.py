"""Unit and fuzz tests for the FLAC-subset codec
(gemmsql/pipeline/flac.py).  The gated corpus query's DuckDB hash
parity lives in tests/test_gate_parity; these tests exercise the codec
itself — lossless round-trips over edge-case signals, decoder paths
the encoder never emits (partition orders > 0, 5-bit Rice parameters,
wasted bits), checksum enforcement under corruption, and the
compression claim.
"""

from __future__ import annotations

import numpy as np
import pytest

from gemmsql.pipeline import flac
from gemmsql.pipeline.flac import (
    FLAC_BLOCK,
    _BitReader,
    _BitWriter,
    _read_residuals,
    _read_subframe,
    _synth_samples,
    decode_flac,
    encode_flac,
)


def _rt(samples: np.ndarray, rate: int = 16000) -> None:
    dec, got_rate = decode_flac(encode_flac(samples, rate))
    assert got_rate == rate
    assert np.array_equal(dec, np.asarray(samples, dtype=np.int16))


@pytest.mark.parametrize(
    "samples",
    [
        np.zeros(FLAC_BLOCK, np.int16),                 # constant block
        np.full(2 * FLAC_BLOCK + 7, -123, np.int16),    # const + short tail
        np.array([5], np.int16),                        # single sample
        np.array([-32768, 32767, 0, 1, -1], np.int16),  # int16 extremes
        np.arange(-600, 600, 7, dtype=np.int16),        # linear -> order 2
    ],
    ids=["constant", "constant_tail", "one", "extremes", "linear"],
)
def test_roundtrip_edge_signals(samples):
    _rt(samples)


def test_roundtrip_noise_and_walks():
    rng = np.random.RandomState(11)
    _rt(rng.randint(-32768, 32768, 97).astype(np.int16))   # white noise
    _rt(np.cumsum(rng.randint(-40, 40, 321)).astype(np.int16))
    _rt(_synth_samples(7))
    _rt(_synth_samples(123456))


def test_uncommon_sample_rate_roundtrips():
    # 12345 Hz is not in the 4-bit code table -> 16-bit uncommon path
    _rt(np.arange(50, dtype=np.int16), rate=12345)


def test_synth_corpus_actually_compresses():
    """The gate's payloads must be genuinely COMPRESSED audio, not an
    expanded container — prediction + Rice must beat raw PCM16."""
    raw = enc = 0
    for doc_id in range(0, 200):
        s = _synth_samples(doc_id)
        raw += 2 * len(s)
        enc += len(encode_flac(s))
    assert enc < 0.75 * raw, f"ratio {enc / raw:.3f}"


def test_corruption_is_always_detected():
    """Flipping any single byte of the stream must raise — CRC-8 on
    headers, CRC-16 on frames, MD5 on the decoded stream, and the
    parser's own structure checks leave no silent window."""
    payload = bytearray(encode_flac(_synth_samples(3)))
    clean = bytes(payload)
    assert np.array_equal(decode_flac(clean)[0], _synth_samples(3))
    for pos in range(len(payload)):
        corrupt = bytearray(clean)
        corrupt[pos] ^= 0x41
        try:
            decode_flac(bytes(corrupt))
        except (ValueError, AssertionError):
            continue
        # a flip that decodes cleanly must at least not change data
        # (possible only in ignored STREAMINFO min/max-framesize bits)
        dec, _ = decode_flac(bytes(corrupt))
        assert np.array_equal(dec, _synth_samples(3)), f"byte {pos}"


def test_truncation_raises():
    payload = encode_flac(_synth_samples(9))
    for cut in (2, 20, len(payload) // 2, len(payload) - 1):
        with pytest.raises(ValueError):
            decode_flac(payload[:cut])


def _write_rice(w: _BitWriter, vals, p: int, pbits: int = 4) -> None:
    w.write(p, pbits)
    for v in vals:
        u = 2 * v if v >= 0 else -2 * v - 1
        w.write_unary(u >> p)
        w.write(u, p)


def test_decoder_handles_partition_order_and_rice5():
    """The encoder always writes partition order 0 with 4-bit Rice
    parameters; the decoder must also take order>0 and the 5-bit
    parameter width (residual coding method 1)."""
    vals = [3, -1, 0, 7, -4, 2, 1, -6, 5, 0, -2, 4, -3, 6, -5, 1]
    # method 1 (5-bit params), partition order 1 -> two partitions of 8
    w = _BitWriter()
    w.write(1, 2)
    w.write(1, 4)
    _write_rice(w, vals[:8], 2, pbits=5)
    _write_rice(w, vals[8:], 3, pbits=5)
    w.align()
    got = _read_residuals(_BitReader(w.getvalue()), bs=16, order=0)
    assert got.tolist() == vals


def test_decoder_handles_escape_partition():
    """Escape code (all-ones parameter) -> raw n-bit signed residuals."""
    vals = [100000, -99999, 12345, -1]
    w = _BitWriter()
    w.write(0, 2)      # method 0: 4-bit params
    w.write(0, 4)      # partition order 0
    w.write(0xF, 4)    # escape
    w.write(18, 5)     # 18-bit raw residuals
    for v in vals:
        w.write(v, 18)
    w.align()
    got = _read_residuals(_BitReader(w.getvalue()), bs=4, order=0)
    assert got.tolist() == vals


def test_decoder_applies_wasted_bits():
    """A VERBATIM subframe with k wasted bits stores samples >> k and
    the decoder must shift them back."""
    vals = [8, -16, 24, 0]
    w = _BitWriter()
    w.write(0, 1)        # pad
    w.write(1, 6)        # VERBATIM
    w.write(1, 1)        # wasted-bits flag
    w.write_unary(2)     # wasted = 2 + 1 = 3
    for v in vals:
        w.write(v >> 3, 16 - 3)
    w.align()
    got = _read_subframe(_BitReader(w.getvalue()), bs=4, bps=16)
    assert got.tolist() == vals


def test_lpc_subframe_rejected_not_misparsed():
    w = _BitWriter()
    w.write(0, 1)
    w.write(32, 6)       # LPC order 1 — outside the decoder subset
    w.write(0, 1)
    w.write(0, 24)
    w.align()
    with pytest.raises(ValueError, match="LPC"):
        _read_subframe(_BitReader(w.getvalue()), bs=4, bps=16)


def test_synth_formula_matches_oracle_expression():
    """_synth_samples is the contract the SQL twin replays: cumsum of
    (md5 byte % 32 - 16) deltas, 16 per block, 12 + doc_id % 9 blocks."""
    import hashlib

    doc_id = 77
    nb = 12 + doc_id % 9
    deltas = []
    for t in range(nb):
        h = hashlib.md5(f"fl:{doc_id}:{t}".encode()).hexdigest()
        deltas.extend(
            int(h[2 * k : 2 * k + 2], 16) % 32 - 16 for k in range(16)
        )
    want = np.cumsum(deltas)
    assert np.array_equal(_synth_samples(doc_id), want.astype(np.int16))


def test_cumsum_integration_equals_coefficient_predictor():
    """The decoder reconstructs FIXED subframes as k seeded cumulative
    sums; _FIXED_COEF is the spec's coefficient form.  Pin their
    equivalence (and that the test would catch a wrong order) so the
    vectorized path can never drift from the spec table."""
    import numpy as np

    from gemmsql.pipeline.flac import _FIXED_COEF

    rng = np.random.RandomState(7)
    x = rng.randint(-30000, 30000, 64).astype(np.int64)
    for order, coef in _FIXED_COEF.items():
        res = np.diff(x, n=order)
        warm = x[:order]
        # vectorized integration (the decoder's path)
        cur = res.copy()
        for j in range(order, 0, -1):
            seed = int(np.diff(warm, n=j - 1)[-1]) if order else 0
            cur = seed + np.cumsum(cur)
        got = np.concatenate([warm, cur])
        # coefficient form (the spec table)
        want = np.empty(len(x), dtype=np.int64)
        want[:order] = warm
        for i in range(order, len(x)):
            acc = int(res[i - order])
            for k, c in enumerate(coef):
                acc += c * int(want[i - 1 - k])
            want[i] = acc
        assert (got == want).all(), order
        assert (got == x).all(), order
        if order:
            wrong = np.concatenate(
                [warm, int(np.diff(warm, n=order - 1)[-1]) + 1
                 + np.cumsum(res)]
            )
            assert not (
                np.concatenate([warm, wrong[order:]]) == x
            ).all(), "test has no power"
