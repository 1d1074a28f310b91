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


def _segment_layout(lengths: np.ndarray, seg_bounds: np.ndarray):
    """Shared layout math for the segmented pack/unpack pair: per-element
    global bit positions when every segment's stream is independently
    byte-aligned (so each segment's slice decodes exactly like a standalone
    ``pack_bits`` buffer). Returns (elem_start_bits, seg_byte_offsets)."""
    lengths = lengths.astype(np.int64)
    seg_bounds = np.asarray(seg_bounds, dtype=np.int64)
    cum = np.zeros(lengths.size + 1, dtype=np.int64)
    np.cumsum(lengths, out=cum[1:])
    seg_bits = cum[seg_bounds[1:]] - cum[seg_bounds[:-1]]
    seg_bytes = (seg_bits + 7) // 8
    byte_off = np.zeros(seg_bounds.size, dtype=np.int64)
    np.cumsum(seg_bytes, out=byte_off[1:])
    seg_of = np.repeat(
        np.arange(seg_bits.size, dtype=np.int64), np.diff(seg_bounds)
    )
    elem_start = byte_off[seg_of] * 8 + (cum[:-1] - cum[seg_bounds[seg_of]])
    return elem_start, byte_off


def pack_bits_segmented(
    values: np.ndarray, lengths: np.ndarray, seg_bounds: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Pack many independent ``pack_bits`` streams in ONE vectorized pass.

    ``seg_bounds`` (len n_seg+1) splits elements into segments; each
    segment's bit stream is byte-aligned on its own, so
    ``buf[off[k]:off[k+1]]`` is byte-identical to
    ``pack_bits(values[a:b], lengths[a:b])``. Returns (buffer, off)."""
    values = values.astype(np.uint64)
    lengths = lengths.astype(np.int64)
    elem_start, byte_off = _segment_layout(lengths, seg_bounds)
    n = values.size
    total_bits = int(byte_off[-1]) * 8
    bits = np.zeros(total_bits, dtype=np.uint8)
    if n:
        total = int(lengths.sum())
        offs = np.zeros(n, dtype=np.int64)
        np.cumsum(lengths[:-1], out=offs[1:])
        eid = np.repeat(np.arange(n), lengths)
        j = np.arange(total, dtype=np.int64) - np.repeat(offs, lengths)
        shift = (lengths[eid] - 1 - j).astype(np.uint64)
        pos = np.repeat(elem_start, lengths) + j
        bits[pos] = ((values[eid] >> shift) & _U64_ONE).astype(np.uint8)
    return np.packbits(bits).tobytes(), byte_off


def unpack_bits_segmented(
    buf: bytes, lengths: np.ndarray, seg_bounds: np.ndarray
) -> np.ndarray:
    """Inverse of :func:`pack_bits_segmented` over the concatenated buffer
    (each segment byte-aligned). Returns uint64 element values."""
    lengths = lengths.astype(np.int64)
    elem_start, byte_off = _segment_layout(lengths, seg_bounds)
    n = lengths.size
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8, count=int(byte_off[-1]))
    )
    total = int(lengths.sum())
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offs[1:])
    eid = np.repeat(np.arange(n), lengths)
    j = np.arange(total, dtype=np.int64) - np.repeat(offs, lengths)
    shift = (lengths[eid] - 1 - j).astype(np.uint64)
    pos = np.repeat(elem_start, lengths) + j
    contrib = bits[pos].astype(np.uint64) << shift
    return np.add.reduceat(contrib, offs).astype(np.uint64) if total else (
        np.zeros(n, dtype=np.uint64)
    )


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
