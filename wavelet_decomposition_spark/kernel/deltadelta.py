"""Delta-of-delta timestamp compression — vectorized numpy.

Same scheme as Gorilla's timestamp track (Pelkonen et al., VLDB 2015, §4.1.1):
store the first timestamp and first delta raw, then the second difference
(delta-of-delta) of each subsequent timestamp in one of five size buckets.
Like the float codec, the streams are structure-of-arrays (fixed 3-bit
control stream + dense zigzag payload stream) so encode/decode are single
vectorized numpy passes.

Buckets (control value -> payload bits of zigzag(dod)):
    0 -> 0 (dod == 0)    1 -> 7    2 -> 9    3 -> 12    4 -> 32    5 -> 64

Works on int64 timestamps at any unit (the engine uses epoch seconds for the
1s grid and epoch micros for raw turn timestamps). Exact round-trip.
"""

from __future__ import annotations

import struct

import numpy as np

from .bitpack import (
    bit_length_u64,
    pack_bits,
    pack_fixed,
    unpack_bits,
    unpack_fixed,
    zigzag_decode,
    zigzag_encode,
)

_HEADER = struct.Struct("<Iqq")
_BUCKET_BITS = np.array([0, 7, 9, 12, 32, 64], dtype=np.int64)


def encode(ts: np.ndarray) -> bytes:
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    n = ts.size
    if n == 0:
        return struct.pack("<I", 0)
    if n == 1:
        return _HEADER.pack(1, ts[0], 0)
    delta = np.diff(ts)
    head = _HEADER.pack(n, ts[0], delta[0])
    if n == 2:
        return head

    dod = delta[1:] - delta[:-1]
    zz = zigzag_encode(dod)
    bl = bit_length_u64(zz)
    # smallest bucket whose payload width fits the zigzag value
    ctrl = np.searchsorted(_BUCKET_BITS, bl)
    ctrl[dod == 0] = 0
    control = pack_fixed(ctrl.astype(np.uint64), 3)
    lens = _BUCKET_BITS[ctrl]
    nz = lens > 0
    payload = pack_bits(zz[nz], lens[nz])
    return head + control + payload


def decode(buf: bytes) -> np.ndarray:
    n = struct.unpack_from("<I", buf, 0)[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    _, t0, d0 = _HEADER.unpack_from(buf, 0)
    if n == 1:
        return np.array([t0], dtype=np.int64)
    if n == 2:
        return np.array([t0, t0 + d0], dtype=np.int64)

    off = _HEADER.size
    m = n - 2
    nctrl = (3 * m + 7) // 8
    ctrl = unpack_fixed(buf[off : off + nctrl], 3, m).astype(np.int64)
    off += nctrl
    lens = _BUCKET_BITS[ctrl]
    nz = lens > 0
    zz = np.zeros(m, dtype=np.uint64)
    zz[nz] = unpack_bits(buf[off:], lens[nz])
    dod = zigzag_decode(zz)

    delta = np.empty(n - 1, dtype=np.int64)
    delta[0] = d0
    delta[1:] = dod
    np.cumsum(delta, out=delta)  # first cumsum: dod -> per-step deltas
    np.cumsum(delta, out=delta)  # second cumsum: deltas -> offsets from t0
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    out[1:] = t0 + delta
    return out
