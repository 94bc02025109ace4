"""Perceptual dHash near-dup (`gemmsql/pipeline/phash.py`).

Full Spark-vs-DuckDB hash parity runs in tests/test_rotation.py;
this file pins the hash function's local properties."""

from __future__ import annotations

import numpy as np

from gemmsql.pipeline.phash import (
    MAX_HAMMING,
    _BUMP,
    _BUMP_X,
    _BUMP_Y,
    _GX,
    _GY,
    dhash_bands,
    dhash_bits,
)
from gemmsql.pipeline.qoi import _qoi_pixels


def _hamming(a: list[int], b: list[int]) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def test_dhash_shape_and_determinism():
    img = _qoi_pixels(3)
    bits = dhash_bits(img)
    assert bits.shape == (8, 8) and set(np.unique(bits)) <= {0, 1}
    assert dhash_bands(img) == dhash_bands(img.copy())
    assert all(0 <= v < 65536 for v in dhash_bands(img))


def test_identical_images_hash_equal_distinct_differ():
    a, b = _qoi_pixels(5), _qoi_pixels(6)
    assert _hamming(dhash_bands(a), dhash_bands(a.copy())) == 0
    # different corpus images are far apart (random-walk lumas)
    assert _hamming(dhash_bands(a), dhash_bands(b)) > MAX_HAMMING


def test_single_sampled_pixel_bump_flips_at_most_two_bits():
    for doc_id in (0, 17, 34, 51):
        img = _qoi_pixels(doc_id)
        h, w, _ = img.shape
        var = img.copy()
        sy, sx = _BUMP_Y * h // _GY, _BUMP_X * w // _GX
        var[sy, sx] = var[sy, sx] + np.uint8(_BUMP)
        d = _hamming(dhash_bands(img), dhash_bands(var))
        assert d <= 2
    # an UNSAMPLED pixel change flips nothing (w=16 grid skips col 2)
    img = _qoi_pixels(9)
    var = img.copy()
    var[0, 2] = var[0, 2] + np.uint8(200)
    assert _hamming(dhash_bands(img), dhash_bands(var)) == 0


def test_resize_invariance_row_duplication():
    # dHash's point: a 2x vertical upscale (every row doubled) samples
    # the same 9x8 grid values, so the hash is IDENTICAL
    img = _qoi_pixels(12)
    up = np.repeat(img, 2, axis=0)
    assert dhash_bands(up) == dhash_bands(img)


def test_banding_is_complete_for_radius_three():
    # pigeonhole: <= 3 differing bits cannot touch all 4 bands, so
    # every near pair shares at least one exact band — check on a
    # brute bit-flip sweep
    img = _qoi_pixels(7)
    base = dhash_bands(img)
    rng = np.random.default_rng(0)
    for _ in range(50):
        flips = rng.choice(64, size=3, replace=False)
        mutated = list(base)
        for k in flips:
            mutated[k // 16] ^= 1 << (15 - k % 16)
        assert any(a == b for a, b in zip(base, mutated))


def _band_rows(ids: list[int], hs: list[int]) -> list[tuple]:
    rows = []
    for i in ids:
        for b in range(4):
            rows.append((i, b, hs[b], hs[0], hs[1], hs[2], hs[3]))
    return rows


def test_hot_band_cap_bounds_skew_bucket(spark):
    """A constant-color-style corpus — many IDENTICAL hashes — must
    not go quadratic: over-cap band buckets are dropped from
    candidate generation, so the hot cluster yields ZERO pairs while
    a small cold near-dup pair still surfaces."""
    from gemmsql.pipeline.phash import MAX_BAND_DF, near_dup_pairs

    hot = _band_rows(list(range(3 * MAX_BAND_DF)), [7, 7, 7, 7])
    # a cold pair one bit apart in band 0 (shares bands 1..3 too,
    # but those buckets only hold the pair — far under the cap)
    base = [0x1234, 0x2345, 0x3456, 0x4567]
    near = [0x1235, 0x2345, 0x3456, 0x4567]
    cold = _band_rows([100000], base) + _band_rows([100001], near)
    bands = spark.createDataFrame(
        hot + cold,
        "id long, band_idx int, band_val long, "
        "h0 long, h1 long, h2 long, h3 long",
    )
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in near_dup_pairs(bands).collect()}
    assert got == {(100000, 100001, 1)}, got


def test_cap_keeps_pairs_sharing_any_cold_band(spark):
    """The cap drops a BUCKET, not an image: a pair whose band-0
    bucket is hot still surfaces through its cold bands 1..3."""
    from gemmsql.pipeline.phash import MAX_BAND_DF, near_dup_pairs

    crowd = _band_rows(
        [10 + k for k in range(2 * MAX_BAND_DF)], [9, 100, 200, 300]
    )
    pair_a = [9, 1111, 2222, 3333]     # band 0 collides with the crowd
    pair_b = [9, 1111, 2222, 3334 ^ 1]  # differs in band 3 by 1 bit
    bands = spark.createDataFrame(
        crowd + _band_rows([500000], pair_a) + _band_rows([500001], pair_b),
        "id long, band_idx int, band_val long, "
        "h0 long, h1 long, h2 long, h3 long",
    )
    got = {(r["id_a"], r["id_b"]) for r in near_dup_pairs(bands).collect()}
    assert (500000, 500001) in got, got
    # and nothing from the crowd's hot bucket
    assert all(a >= 500000 for a, _ in got), got
