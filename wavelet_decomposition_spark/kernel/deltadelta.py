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
    pack_bits_segmented,
    pack_fixed,
    unpack_bits,
    unpack_bits_segmented,
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


def encode_many(ts: np.ndarray, bounds: np.ndarray) -> list[bytes]:
    """Encode many timestamp blocks in one vectorized pass; byte-identical
    to per-block :func:`encode` (property-tested). ``bounds`` slices ``ts``
    into blocks; per-block Python is header packing + slicing only."""
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    bounds = np.asarray(bounds, dtype=np.int64)
    ns = np.diff(bounds)
    n_blk = ns.size
    if n_blk == 0:
        return []

    # per-block dod elements: block k contributes max(n_k - 2, 0)
    m = np.maximum(ns - 2, 0)
    dod_bounds = np.zeros(n_blk + 1, dtype=np.int64)
    np.cumsum(m, out=dod_bounds[1:])
    # global index of the "current" element of each dod (i >= 2 in-block)
    idx = np.arange(dod_bounds[-1], dtype=np.int64) + np.repeat(
        bounds[:-1] + 2 - dod_bounds[:-1], m
    )
    dod = (ts[idx] - ts[idx - 1]) - (ts[idx - 1] - ts[idx - 2])
    zz = zigzag_encode(dod)
    ctrl = np.searchsorted(_BUCKET_BITS, bit_length_u64(zz))
    ctrl[dod == 0] = 0
    ctrl_buf, ctrl_off = pack_bits_segmented(
        ctrl.astype(np.uint64), np.full(dod.size, 3, dtype=np.int64), dod_bounds
    )

    lens = _BUCKET_BITS[ctrl]
    nz = lens > 0
    csnz = np.zeros(dod.size + 1, dtype=np.int64)
    np.cumsum(nz, out=csnz[1:])
    nz_bounds = csnz[dod_bounds]
    pay_buf, pay_off = pack_bits_segmented(zz[nz], lens[nz], nz_bounds)

    d0 = np.zeros(n_blk, dtype=np.int64)
    two_plus = ns >= 2
    d0[two_plus] = ts[bounds[:-1][two_plus] + 1] - ts[bounds[:-1][two_plus]]

    out: list[bytes] = []
    for b in range(n_blk):
        n = int(ns[b])
        if n == 0:
            out.append(struct.pack("<I", 0))
            continue
        head = _HEADER.pack(n, ts[bounds[b]], int(d0[b]))
        if n <= 2:
            out.append(head)
            continue
        out.append(
            head
            + ctrl_buf[ctrl_off[b]:ctrl_off[b + 1]]
            + pay_buf[pay_off[b]:pay_off[b + 1]]
        )
    return out


def decode_many(bufs) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_many` / per-block :func:`encode` over many
    blocks at once. Returns (concatenated int64 timestamps, bounds)."""
    n_blk = len(bufs)
    ns = np.empty(n_blk, dtype=np.int64)
    t0 = np.zeros(n_blk, dtype=np.int64)
    d0 = np.zeros(n_blk, dtype=np.int64)
    for b, buf in enumerate(bufs):
        n = struct.unpack_from("<I", buf, 0)[0]
        ns[b] = n
        if n:
            _, t0[b], d0[b] = _HEADER.unpack_from(buf, 0)
    bounds = np.zeros(n_blk + 1, dtype=np.int64)
    np.cumsum(ns, out=bounds[1:])
    out = np.empty(int(bounds[-1]), dtype=np.int64)
    if bounds[-1] == 0:
        return out, bounds

    m = np.maximum(ns - 2, 0)
    dod_bounds = np.zeros(n_blk + 1, dtype=np.int64)
    np.cumsum(m, out=dod_bounds[1:])
    total_m = int(dod_bounds[-1])

    dod = np.zeros(total_m, dtype=np.int64)
    if total_m:
        nctrl = (3 * m + 7) // 8
        ctrl_all = b"".join(
            buf[_HEADER.size:_HEADER.size + int(nctrl[b])]
            for b, buf in enumerate(bufs) if m[b]
        )
        pm = m[m > 0]
        pm_bounds = np.zeros(pm.size + 1, dtype=np.int64)
        np.cumsum(pm, out=pm_bounds[1:])
        ctrl = unpack_bits_segmented(
            ctrl_all, np.full(total_m, 3, dtype=np.int64), pm_bounds
        ).astype(np.int64)
        lens = _BUCKET_BITS[ctrl]
        nz = lens > 0
        csnz = np.zeros(total_m + 1, dtype=np.int64)
        np.cumsum(nz, out=csnz[1:])
        k = csnz[dod_bounds[1:]] - csnz[dod_bounds[:-1]]
        pay_all = b"".join(
            buf[_HEADER.size + int(nctrl[b]):]
            for b, buf in enumerate(bufs) if k[b]
        )
        kp = k[k > 0]
        kp_bounds = np.zeros(kp.size + 1, dtype=np.int64)
        np.cumsum(kp, out=kp_bounds[1:])
        zz = np.zeros(total_m, dtype=np.uint64)
        zz[nz] = unpack_bits_segmented(pay_all, lens[nz], kp_bounds)
        dod = zigzag_decode(zz)

    # per-block delta stream: [d0_k, dod_k...] (n_k - 1 entries for n_k >= 1)
    md = np.maximum(ns - 1, 0)
    delta_bounds = np.zeros(n_blk + 1, dtype=np.int64)
    np.cumsum(md, out=delta_bounds[1:])
    delta = np.empty(int(delta_bounds[-1]), dtype=np.int64)
    has_d = ns >= 2
    delta[delta_bounds[:-1][has_d]] = d0[has_d]
    if total_m:
        dpos = np.arange(total_m, dtype=np.int64) + np.repeat(
            delta_bounds[:-1] + 1 - dod_bounds[:-1], m
        )
        delta[dpos] = dod

    # two segmented cumsums (dod -> deltas -> offsets from t0): global
    # cumsum then subtract the gathered value at each block start - 1.
    # int64 wrap-around cancels in the subtraction (mod-2^64 arithmetic),
    # so cross-block accumulation cannot corrupt in-block results.
    def seg_cumsum(x: np.ndarray) -> np.ndarray:
        c = np.cumsum(x)
        prev = np.zeros(n_blk, dtype=np.int64)
        nz_start = delta_bounds[:-1] > 0
        prev[nz_start] = c[delta_bounds[:-1][nz_start] - 1]
        return c - np.repeat(prev, md)

    if delta.size:
        offsets = seg_cumsum(seg_cumsum(delta))
        opos = np.arange(delta.size, dtype=np.int64) + np.repeat(
            bounds[:-1] + 1 - delta_bounds[:-1], md
        )
        out[opos] = np.repeat(t0, md) + offsets
    out[bounds[:-1][ns > 0]] = t0[ns > 0]
    return out, bounds


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
