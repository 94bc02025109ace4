"""Deletion-vector position bitmaps (VERDICT r15 next #3).

A positional merge-on-read delete names (file, row position) pairs.
Storing them as literal rows costs ~20 bytes per deleted row — fine
for a fixture, wrong at 100 TB, where a 10% delete of a billion-row
table would write gigabytes of delete metadata.  Delta Lake and
Iceberg both ship this as a per-file *deletion vector*: one compressed
position bitmap per data file.  This module is a from-scratch
roaring-style encoder (the public RoaringBitmap container design:
positions split into a 48-bit high key and 16-bit low half; each
container stores its lows as a sorted uint16 array when sparse or a
65536-bit bitset when dense), vectorized end-to-end in NumPy so the
encode/decode cost is a memcpy-scale pass, not a Python loop.

Worst-case size: 2 bytes per deleted position (array container) with
an 8 KiB ceiling per 65536-position block (bitset container) — vs the
~20 bytes/row of the legacy (path, pos) row list.  Positions are
int64-safe (parquet ``row_index`` values), so files beyond 2^32 rows
encode fine.

Wire format (little-endian), one blob per data file:

    magic   b"DV01"
    u32     container count
    per container:
        u64  key   (position >> 16)
        u8   mode  (0 = sorted uint16 array, 1 = 8 KiB bitset)
        u32  cardinality
        payload (mode 0: cardinality x u16; mode 1: 8192 bytes)
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"DV01"
#: a container switches to the bitset form above this cardinality —
#: the roaring crossover (4096 x 2 bytes == the 8 KiB bitset)
_ARRAY_MAX = 4096
_BITSET_BYTES = 8192


def encode_positions(positions) -> bytes:
    """Encode an iterable of non-negative int64 row positions into a
    deletion-vector blob.  Duplicates collapse; order is free."""
    pos = np.asarray(positions, dtype=np.int64)
    if pos.size and pos.min() < 0:
        raise ValueError("positions must be non-negative")
    pos = np.unique(pos)  # sorted + deduped
    highs = pos >> 16
    lows = (pos & 0xFFFF).astype(np.uint16)
    keys, starts = np.unique(highs, return_index=True)
    bounds = np.append(starts, pos.size)
    out = [_MAGIC, np.uint32(len(keys)).tobytes()]
    for i, key in enumerate(keys):
        lo = lows[bounds[i]:bounds[i + 1]]
        card = lo.size
        if card <= _ARRAY_MAX:
            out.append(np.uint64(key).tobytes())
            out.append(bytes([0]))
            out.append(np.uint32(card).tobytes())
            out.append(lo.tobytes())
        else:
            bits = np.zeros(_BITSET_BYTES, dtype=np.uint8)
            np.bitwise_or.at(
                bits, lo.astype(np.int64) >> 3,
                np.left_shift(1, (lo & 7).astype(np.uint8)).astype(
                    np.uint8),
            )
            out.append(np.uint64(key).tobytes())
            out.append(bytes([1]))
            out.append(np.uint32(card).tobytes())
            out.append(bits.tobytes())
    return b"".join(out)


def decode_positions(blob: bytes) -> np.ndarray:
    """Decode a deletion-vector blob back to the sorted int64
    position array (the exact inverse of :func:`encode_positions`)."""
    if blob[:4] != _MAGIC:
        raise ValueError(
            f"not a deletion vector (magic {blob[:4]!r})"
        )
    n = int(np.frombuffer(blob, np.uint32, count=1, offset=4)[0])
    off = 8
    parts = []
    for _ in range(n):
        key = int(np.frombuffer(blob, np.uint64, count=1, offset=off)[0])
        mode = blob[off + 8]
        card = int(np.frombuffer(
            blob, np.uint32, count=1, offset=off + 9)[0])
        off += 13
        if mode == 0:
            lo = np.frombuffer(blob, np.uint16, count=card, offset=off)
            off += 2 * card
        elif mode == 1:
            bits = np.frombuffer(
                blob, np.uint8, count=_BITSET_BYTES, offset=off)
            off += _BITSET_BYTES
            lo = np.flatnonzero(
                np.unpackbits(bits, bitorder="little")
            ).astype(np.uint16)
            if lo.size != card:
                raise ValueError(
                    f"corrupt bitset container: {lo.size} set bits, "
                    f"header says {card}"
                )
        else:
            raise ValueError(f"unknown container mode {mode}")
        parts.append((key << 16) | lo.astype(np.int64))
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(parts)


def cardinality(blob: bytes) -> int:
    """Deleted-position count from the container headers alone —
    O(containers), no payload decode."""
    if blob[:4] != _MAGIC:
        raise ValueError(f"not a deletion vector (magic {blob[:4]!r})")
    n = int(np.frombuffer(blob, np.uint32, count=1, offset=4)[0])
    off = 8
    total = 0
    for _ in range(n):
        mode = blob[off + 8]
        card = int(np.frombuffer(
            blob, np.uint32, count=1, offset=off + 9)[0])
        off += 13 + (2 * card if mode == 0 else _BITSET_BYTES)
        total += card
    return total
