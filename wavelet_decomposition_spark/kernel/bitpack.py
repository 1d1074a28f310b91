"""Vectorized variable-length bit packing (numpy, no per-element Python).

Shared by the Gorilla XOR float codec and the delta-of-delta timestamp codec.
The codecs keep their streams *structure-of-arrays* (a fixed-width control
stream, a fixed-width window stream, and one dense variable-length payload
stream whose per-element lengths are fully determined by the fixed streams) —
the same information layout as the row-interleaved Gorilla paper format, but
reorganized so both encode and decode are single vectorized passes over an
Arrow batch instead of a sequential bit cursor.
"""

from __future__ import annotations

import numpy as np

_U64_ONE = np.uint64(1)


def bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 for 0). Exact — no float log."""
    v = v.astype(np.uint64, copy=True)
    bl = np.zeros(v.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        mask = v >= (_U64_ONE << s)
        bl += np.where(mask, shift, 0)
        v = np.where(mask, v >> s, v)
    return bl + (v > 0)


def clz64(v: np.ndarray) -> np.ndarray:
    """Leading zero count (64 for 0)."""
    return 64 - bit_length_u64(v)


def ctz64(v: np.ndarray) -> np.ndarray:
    """Trailing zero count (64 for 0)."""
    v = v.astype(np.uint64)
    low = v & (~v + _U64_ONE)  # isolate lowest set bit
    return np.where(v == 0, 64, bit_length_u64(low) - 1)


def pack_bits(values: np.ndarray, lengths: np.ndarray) -> bytes:
    """Pack ``values[i]``'s low ``lengths[i]`` bits, MSB-first, into a dense
    byte string. All lengths must be >= 1 (zero-length fields are simply not
    emitted by callers)."""
    values = values.astype(np.uint64)
    lengths = lengths.astype(np.int64)
    n = values.size
    if n == 0:
        return b""
    total = int(lengths.sum())
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offs[1:])
    eid = np.repeat(np.arange(n), lengths)
    j = np.arange(total, dtype=np.int64) - np.repeat(offs, lengths)
    shift = (lengths[eid] - 1 - j).astype(np.uint64)
    bits = ((values[eid] >> shift) & _U64_ONE).astype(np.uint8)
    return np.packbits(bits).tobytes()


def unpack_bits(buf: bytes, lengths: np.ndarray) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array."""
    lengths = lengths.astype(np.int64)
    n = lengths.size
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    total = int(lengths.sum())
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=total)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offs[1:])
    eid = np.repeat(np.arange(n), lengths)
    j = np.arange(total, dtype=np.int64) - np.repeat(offs, lengths)
    shift = (lengths[eid] - 1 - j).astype(np.uint64)
    contrib = bits.astype(np.uint64) << shift
    return np.add.reduceat(contrib, offs).astype(np.uint64)


def pack_fixed(values: np.ndarray, width: int) -> bytes:
    if values.size == 0:
        return b""
    return pack_bits(values, np.full(values.size, width, dtype=np.int64))


def unpack_fixed(buf: bytes, width: int, n: int) -> np.ndarray:
    return unpack_bits(buf, np.full(n, width, dtype=np.int64))


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> _U64_ONE).astype(np.int64)) ^ -(u & _U64_ONE).astype(np.int64)
