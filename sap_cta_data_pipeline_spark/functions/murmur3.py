"""MurmurHash3 x86 32-bit — the hash behind Iceberg's ``bucket[N]``
partition transform, implemented from the public algorithm (Austin
Appleby, public domain) because Spark's ``F.hash`` is murmur3 with a
DIFFERENT seed (42) and Spark-specific long mixing, so it cannot
reproduce Iceberg bucket ids.

Iceberg spec (Appendix B "32-bit Hash Requirements"): int and long both
hash as the LITTLE-ENDIAN 8 bytes of the 64-bit value with seed 0, and
``bucket[N](v) = (hash(v) & Integer.MAX_VALUE) % N``. The spec's own
test vector — ``hash(34L) == 2017239379`` — is pinned in tests.

Two implementations with identical outputs:
- ``murmur3_32_long(v)``: scalar Python (driver-side manifest work);
- ``murmur3_32_long_np(arr)``: numpy-vectorized over int64 arrays (the
  executor-side Arrow batch path for routing rows to buckets).
"""

from __future__ import annotations

import numpy as np

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_32_long(v: int, seed: int = 0) -> int:
    """murmur3_x86_32 of the little-endian 8 bytes of ``v`` (signed
    64-bit two's complement), returned as a SIGNED int32 — matching
    Iceberg's Java int semantics."""
    u = v & 0xFFFFFFFFFFFFFFFF
    h = seed & _M32
    for k1 in (u & _M32, (u >> 32) & _M32):  # two LE 4-byte blocks
        k1 = (k1 * _C1) & _M32
        k1 = _rotl32(k1, 15)
        k1 = (k1 * _C2) & _M32
        h ^= k1
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    h ^= 8  # total byte length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h


def murmur3_32_long_np(arr: "np.ndarray", seed: int = 0) -> "np.ndarray":
    """Vectorized twin of :func:`murmur3_32_long` over an int64 array;
    returns int32. All arithmetic in uint32/uint64 with explicit masks —
    bit-identical to the scalar path (property-tested)."""
    u = arr.astype(np.int64).view(np.uint64)
    h = np.full(u.shape, seed, dtype=np.uint32)
    for blk in (u & np.uint64(_M32), (u >> np.uint64(32)) & np.uint64(_M32)):
        k1 = blk.astype(np.uint32)
        k1 = k1 * np.uint32(_C1)
        k1 = (k1 << np.uint32(15)) | (k1 >> np.uint32(17))
        k1 = k1 * np.uint32(_C2)
        h = h ^ k1
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h = h ^ np.uint32(8)
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> np.uint32(16))
    return h.view(np.int32)


def bucket_long(v: int, n: int) -> int:
    """Iceberg ``bucket[N]`` of a long: (hash & Integer.MAX_VALUE) % N."""
    return (murmur3_32_long(v) & 0x7FFFFFFF) % n


def bucket_long_np(arr: "np.ndarray", n: int) -> "np.ndarray":
    h = murmur3_32_long_np(arr).view(np.uint32) & np.uint32(0x7FFFFFFF)
    return (h % np.uint32(n)).astype(np.int32)
