"""Vectorized table-driven CRC over NumPy — shared by the TFRecord
(reflected CRC-32C) and Ogg (forward CRC-32) parsers.

Byte-at-a-time CRC is linear over GF(2): one update step is
``c' = A(c) ^ T[b]`` where ``A`` is the zero-byte register advance
(``T[c & 0xFF] ^ (c >> 8)`` reflected, ``(c << 8) ^ T[c >> 24]``
forward) and ``T[b]`` the byte's contribution — table lookups are
linear (``T[x ^ y] == T[x] ^ T[y]``, ``T[0] == 0``), so after ``n``
bytes from init ``I``::

    reg = A^n(I)  ^  XOR_i  A^(n-1-i)(T[m_i])

The per-position contributions ``POS[k][b] = A^k(T[b])`` are a
(positions x 256) uint32 table built lazily one vectorized row at a
time; a whole message then reduces to ONE fancy-index + xor-reduce —
no per-byte Python.  Messages longer than the table chunk: leading
zero bytes contribute nothing (``T[0] == 0``), so the contribution
folds left-to-right in ``_CHUNK``-byte pieces with the carry advanced
by exactly ``A^_CHUNK`` via four per-byte-lane tables (``A^k`` is
linear, so it distributes over the register's four bytes).

Throughput ~100x the pure-Python loop on KB-scale messages; the
scalar loop stays for short inputs (record length headers) where
NumPy call overhead would dominate, and as the differential-test
reference.
"""

from __future__ import annotations

import numpy as np

#: table chunk: bounds the POS table at _CHUNK x 256 x 4 B (4 MB) per
#: process no matter how long a message gets
_CHUNK = 4096

#: below this length the scalar Python loop is faster than the NumPy
#: call overhead (measured crossover ~24-48 bytes)
MIN_VEC_LEN = 32


class VecCRC:
    """One CRC variant (table + bit order + init/xor-out), vectorized."""

    def __init__(self, table, *, reflected: bool, init: int, xor_out: int):
        self.tbl = np.asarray(table, dtype=np.uint32)
        assert self.tbl.shape == (256,)
        self.reflected = reflected
        self.init = np.uint32(init)
        self.xor_out = np.uint32(xor_out)
        self._pos = self.tbl.reshape(1, 256).copy()  # POS[0] = T
        adv = [init]
        self._adv = np.asarray(adv, dtype=np.uint64)  # A^k(init), k<=built
        self._lane = None  # (4, 256) uint32: A^_CHUNK per register byte

    def _advance(self, arr: np.ndarray) -> np.ndarray:
        """One zero-byte register advance, elementwise over uint32."""
        if self.reflected:
            return self.tbl[arr & np.uint32(0xFF)] ^ (arr >> np.uint32(8))
        return (arr << np.uint32(8)) ^ self.tbl[arr >> np.uint32(24)]

    def _ensure(self, n: int) -> None:
        """Grow POS/ADV so exponents < n (and init advances <= n) exist."""
        n = min(n, _CHUNK)
        k0 = self._pos.shape[0]
        if k0 < n:
            rows = np.empty((n, 256), dtype=np.uint32)
            rows[:k0] = self._pos
            for k in range(k0, n):
                rows[k] = self._advance(rows[k - 1])
            self._pos = rows
        a0 = self._adv.shape[0]
        if a0 < n + 1:
            adv = np.empty(n + 1, dtype=np.uint64)
            adv[:a0] = self._adv
            cur = np.asarray([adv[a0 - 1]], dtype=np.uint32)
            for k in range(a0, n + 1):
                cur = self._advance(cur)
                adv[k] = cur[0]
            self._adv = adv

    def _ensure_lane(self) -> None:
        """A^_CHUNK on an arbitrary register via its four byte lanes."""
        if self._lane is not None:
            return
        lane = np.zeros((4, 256), dtype=np.uint32)
        b = np.arange(256, dtype=np.uint32)
        for j in range(4):
            lane[j] = b << np.uint32(8 * j)
        for _ in range(_CHUNK):
            lane = self._advance(lane)
        self._lane = lane

    def _adv_chunk(self, reg: int) -> int:
        """A^_CHUNK(reg) for one scalar register."""
        ln = self._lane
        return int(
            ln[0, reg & 0xFF]
            ^ ln[1, (reg >> 8) & 0xFF]
            ^ ln[2, (reg >> 16) & 0xFF]
            ^ ln[3, (reg >> 24) & 0xFF]
        )

    def crc(self, data: bytes) -> int:
        n = len(data)
        if n == 0:
            return int(self.init ^ self.xor_out)
        arr = np.frombuffer(data, dtype=np.uint8)
        r = n % _CHUNK
        q, first = (n // _CHUNK, r) if r else (n // _CHUNK - 1, _CHUNK)
        self._ensure(first if q == 0 else _CHUNK)
        # first (ragged) chunk: exponents first-1 .. 0
        idx = np.arange(first - 1, -1, -1)
        x = int(np.bitwise_xor.reduce(self._pos[idx, arr[:first]]))
        if q:
            self._ensure_lane()
            full_idx = np.arange(_CHUNK - 1, -1, -1)
            pos = first
            for _ in range(q):
                x = self._adv_chunk(x) ^ int(
                    np.bitwise_xor.reduce(
                        self._pos[full_idx, arr[pos:pos + _CHUNK]]
                    )
                )
                pos += _CHUNK
        # init advanced through all n bytes: A^first, then q chunk hops
        a = int(self._adv[first])
        for _ in range(q):
            a = self._adv_chunk(a)
        return int((np.uint32(a) ^ np.uint32(x)) ^ self.xor_out)
