"""Gorilla-style XOR compression for float64 series — vectorized numpy.

Information layout follows the Gorilla paper (Pelkonen et al., VLDB 2015,
§4.1.2): each value is XORed with its predecessor; a zero XOR costs one
control bit; a nonzero XOR stores (leading-zero count, meaningful-bit length,
meaningful bits). Two deliberate deviations, both in service of fully
vectorized Arrow-batch encode/decode (no sequential bit cursor, no per-row
Python — the engine contract):

1. *Structure-of-arrays streams*: control bits, window descriptors and
   payload bits live in three dense sub-streams instead of being interleaved,
   so per-element payload lengths are computable from the fixed-width streams
   alone and both directions are single numpy passes.
2. *No window reuse* (the paper's '10' control case): every nonzero XOR
   stores its own 6+6-bit window. The reuse decision is inherently a
   sequential scan; dropping it costs <=12 bits per *changing* value and
   keeps the codec stateless per element.

Block format (little-endian):
    [n: uint32][first: float64 raw]
    [control: ceil((n-1)/8) bytes, 1 bit/elt: 0 = repeat, 1 = new window]
    [windows: 12 bits per '1' elt: 6-bit leading-zeros (clamped 63),
              6-bit (meaningful-length - 1)]
    [payload: meaningful bits per '1' elt]

Exact round-trip for all float64 bit patterns including NaN/±Inf/-0.0
(bit-level fidelity — values are compared as uint64 bits).
"""

from __future__ import annotations

import struct

import numpy as np

from .bitpack import clz64, ctz64, pack_bits, pack_fixed, unpack_bits, unpack_fixed

_HEADER = struct.Struct("<Id")


def encode(values: np.ndarray) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.float64)
    n = values.size
    if n == 0:
        return struct.pack("<I", 0)
    u = values.view(np.uint64)
    head = _HEADER.pack(n, values[0])
    if n == 1:
        return head

    xor = u[1:] ^ u[:-1]
    nz = xor != 0
    control = pack_fixed(nz.astype(np.uint64), 1)

    xnz = xor[nz]
    lead = np.minimum(clz64(xnz), 63)
    trail = ctz64(xnz)
    mlen = 64 - lead - trail  # in [1, 64]
    windows = pack_bits(
        (lead.astype(np.uint64) << np.uint64(6))
        | (mlen - 1).astype(np.uint64),
        np.full(xnz.size, 12, dtype=np.int64),
    )
    payload = pack_bits(xnz >> trail.astype(np.uint64), mlen)
    return head + control + windows + payload


def decode(buf: bytes) -> np.ndarray:
    n = struct.unpack_from("<I", buf, 0)[0]
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    first = struct.unpack_from("<d", buf, 4)[0]
    if n == 1:
        return np.array([first])

    off = _HEADER.size
    nctrl = (n - 1 + 7) // 8
    control = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8, count=nctrl, offset=off),
        count=n - 1,
    ).astype(bool)
    off += nctrl
    k = int(control.sum())

    nwin = (12 * k + 7) // 8
    win = unpack_fixed(buf[off : off + nwin], 12, k)
    off += nwin
    lead = (win >> np.uint64(6)).astype(np.int64)
    mlen = (win & np.uint64(0x3F)).astype(np.int64) + 1
    trail = 64 - lead - mlen

    payload = unpack_bits(buf[off:], mlen)
    xor_nz = payload << trail.astype(np.uint64)

    xor = np.zeros(n - 1, dtype=np.uint64)
    xor[control] = xor_nz
    u = np.empty(n, dtype=np.uint64)
    u[0] = np.frombuffer(struct.pack("<d", first), dtype=np.uint64)[0]
    # prefix-XOR scan (vectorized log-step doubling)
    acc = xor.copy()
    shift = 1
    while shift < acc.size:
        acc[shift:] ^= acc[:-shift]
        shift *= 2
    u[1:] = u[0] ^ acc
    return u.view(np.float64).copy()
