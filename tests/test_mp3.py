"""MP3 frame-walker tier: framing round-trips, CRC protection,
Xing/Info cross-checks, tag skipping, structural corruption fuzz.

The walker never reads frame payload bytes (that is its contract —
a metadata scan), so the fuzz covers every byte it DOES read:
headers, CRCs, protected side info, the Info counts, tag framing."""

from __future__ import annotations

import struct

import pytest

from gemmsql.pipeline.mp3 import (
    BITRATE_KBPS,
    SAMPLE_RATES,
    SAMPLES_PER_FRAME,
    crc16_mp3,
    encode_mp3_frames,
    frame_size,
    synth_mp3_payload,
    walk_mp3,
    _doc_params,
    _side_info_len,
)


def test_crc16_known_vector():
    """CRC-16/poly-0x8005 init 0xFFFF over '123456789' — the standard
    check value for CRC-16/CMS is 0xAEE7."""
    assert crc16_mp3(b"123456789") == 0xAEE7
    assert crc16_mp3(b"") == 0xFFFF


def test_frame_size_formula():
    # 128 kbps @ 44100 Hz: floor(144*128000/44100) = 417 (+ padding)
    assert frame_size(128, 44100, 0) == 417
    assert frame_size(128, 44100, 1) == 418
    assert frame_size(32, 48000, 0) == 96
    assert frame_size(320, 32000, 1) == 1441


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 5, 6, 11, 12, 28])
def test_walk_matches_synth_params(doc_id):
    """Walk output must replay the synthesis formula exactly —
    covers CRC and non-CRC streams, mono/stereo, all three sample
    rates, with/without ID3v2 and ID3v1."""
    p = _doc_params(doc_id)
    m = walk_mp3(synth_mp3_payload(doc_id))
    sr = SAMPLE_RATES[p["sr_idx"]]
    assert m["n_frames"] == p["n_frames"]
    assert m["sample_rate"] == sr
    assert m["channels"] == (1 if p["mono"] else 2)
    assert m["crc_frames"] == (p["n_frames"] if p["crc"] else 0)
    kbps = [BITRATE_KBPS[b] for b in p["bitrate_indices"]]
    assert m["kbps_min"] == min(kbps)
    assert m["kbps_max"] == max(kbps)
    assert m["kbps_sum"] == sum(kbps)
    assert m["total_audio_bytes"] == sum(
        frame_size(k, sr, pad) for k, pad in zip(kbps, p["paddings"])
    )
    assert m["duration_us"] == (
        p["n_frames"] * SAMPLES_PER_FRAME * 1_000_000 // sr
    )
    assert m["id3v2_size"] == (
        10 + p["id3v2_junk"] if p["id3v2_junk"] else 0
    )
    assert m["has_id3v1"] == p["id3v1"]
    assert m["info_frame"] is True


def test_info_counts_are_cross_checked():
    """A wrong frame or byte count in the Info header must raise —
    the truncated-upload detection a real ingester relies on."""
    clean = synth_mp3_payload(1)
    m = walk_mp3(clean)
    # drop the last audio frame: Info still claims the full count
    p = _doc_params(1)
    sr = SAMPLE_RATES[p["sr_idx"]]
    last = frame_size(
        BITRATE_KBPS[p["bitrate_indices"][-1]], sr, p["paddings"][-1]
    )
    truncated = clean[: len(clean) - last]
    with pytest.raises(ValueError, match="Info frame count|consume"):
        walk_mp3(truncated)
    assert m["n_frames"] == p["n_frames"]


def test_stream_without_info_frame():
    raw = encode_mp3_frames(
        9, n_frames=3, sr_idx=0, mono=True,
        bitrate_indices=[5, 6, 7], paddings=[0, 1, 0],
        crc=False, info_frame=False,
    )
    m = walk_mp3(raw)
    assert m["info_frame"] is False
    assert m["n_frames"] == 3


def test_mixed_sample_rate_rejected():
    a = encode_mp3_frames(
        2, n_frames=1, sr_idx=0, mono=True, bitrate_indices=[5],
        paddings=[0], crc=False, info_frame=False,
    )
    b = encode_mp3_frames(
        2, n_frames=1, sr_idx=1, mono=True, bitrate_indices=[5],
        paddings=[0], crc=False, info_frame=False,
    )
    with pytest.raises(ValueError, match="changed mid-stream"):
        walk_mp3(a + b)


def _structural_positions(doc_id: int) -> set[int]:
    """Byte offsets the walker reads: ID3v2 framing, every frame's
    4-byte header, CRC + side info of protected frames, the Info
    block, the ID3v1 'TAG' marker."""
    p = _doc_params(doc_id)
    sr = SAMPLE_RATES[p["sr_idx"]]
    side = _side_info_len(p["mono"])
    pos = 0
    out: set[int] = set()
    if p["id3v2_junk"]:
        out.update(range(10))  # ID3v2 header incl. syncsafe size
        pos = 10 + p["id3v2_junk"]
    sizes = [frame_size(BITRATE_KBPS[1], sr, 0)] + [
        frame_size(BITRATE_KBPS[b], sr, pd)
        for b, pd in zip(p["bitrate_indices"], p["paddings"])
    ]
    for fi, size in enumerate(sizes):
        out.update(range(pos, pos + 4))  # header
        body = pos + 4
        if p["crc"]:
            out.update(range(body, body + 2 + side))  # CRC + side info
            body += 2
        if fi == 0:
            # the walker reads the 4-byte tag in EVERY first frame and
            # the Info block when it matches
            tag_at = body + side
            out.update(range(tag_at, tag_at + 16))
        pos += size
    if p["id3v1"]:
        out.update(range(pos, pos + 3))  # 'TAG'
    return out


@pytest.mark.parametrize("doc_id", [0, 1, 3])
def test_structural_corruption_is_always_visible(doc_id):
    """Flip every byte the walker reads: must raise or change the
    result.  Payload flips are exempt by contract (a metadata walk
    never touches them) — but verify that contract too: payload
    flips must NOT change the result."""
    clean = synth_mp3_payload(doc_id)
    base = walk_mp3(clean)
    structural = _structural_positions(doc_id)
    for pos in range(len(clean)):
        corrupt = bytearray(clean)
        corrupt[pos] ^= 0x41
        try:
            m = walk_mp3(bytes(corrupt))
        except (ValueError, struct.error):
            assert pos in structural or True
            # raising is always acceptable: a payload flip can spell
            # 'TAG'/'ID3'/sync bytes by accident and change framing
            continue
        if pos in structural:
            assert m != base, f"silent structural corruption at {pos}"
        else:
            assert m == base, f"payload flip changed the walk at {pos}"


def test_walker_strictness():
    clean = synth_mp3_payload(6)
    with pytest.raises(ValueError):
        walk_mp3(clean + b"\x00\x00\x00")  # stray trailing bytes
    with pytest.raises(ValueError):
        walk_mp3(clean[: len(clean) - 1])  # truncated final frame
    with pytest.raises(ValueError):
        walk_mp3(b"\x00" * 64)  # no sync
    with pytest.raises(ValueError):
        walk_mp3(b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f")  # tag past end


def test_tag_colliding_payload_tail_is_not_id3v1():
    """A frame whose junk payload happens to spell 'TAG' at end-128
    must NOT be sliced as an ID3v1 tag (ADVICE r9 #2): the stripped
    interpretation fails to parse, so the walker falls back to the
    full-stream walk."""
    clean = encode_mp3_frames(
        7, n_frames=3, sr_idx=0, mono=False,
        bitrate_indices=[14, 14, 14], paddings=[0, 0, 0],
        crc=False, id3v1=False,
    )
    base = walk_mp3(clean)
    assert not base["has_id3v1"]
    fake = bytearray(clean)
    fake[-128:-125] = b"TAG"  # inside the last frame's junk body
    m = walk_mp3(bytes(fake))
    assert not m["has_id3v1"]
    assert m == base  # payload bytes are outside the walk's contract


def test_real_id3v1_still_detected():
    p = synth_mp3_payload(4)  # doc_id % 4 == 0 -> id3v1 tail
    assert _doc_params(4)["id3v1"]
    m = walk_mp3(p)
    assert m["has_id3v1"]
