"""Wavelet-dictionary construction — CSR-direct, pure numpy.

Reproduces, column-exactly, the dictionaries the reference builds densely and
then sparsifies (/root/reference/wavelet_decomposition.py:17-95 square,
:103-192 sine) — but builds the sparse triplets directly, which needs ~3 MB
instead of the reference's 4.38 GB dense intermediate and runs in <1 s/year.

Dictionary layout (shape ``N x M`` with ``N = dpy*dpd`` rows = time points):
column blocks ``[Phi0 offset (1) | year family 2^vy-1 | week family
52*(2^vw-1) | day family dpy*(2^vd-1)]``. Each wavelet is a dyadic block
pattern (square: +1/-1 halves; sine: one period of sin over its support,
day levels with support <= 4 points falling back to square — reference quirk
at wavelet_decomposition.py:167-175) circularly shifted by the per-year
translation for its family.

Exact-zero entries are dropped (mirroring ``scipy.sparse.csr_matrix(dense)``
canonicalization) so the CSR matches the reference's saved ``.npz`` files
bit-for-bit in structure.
"""

from __future__ import annotations

import numpy as np

from .sparse import CSRMatrix

# Reference pipeline parameters (tutorial.ipynb cell 6).
VY, VW, VD = 6, 3, 6
DPY = 365
DPD_RAW = 48  # samples/day in the input workbook
NDPD = 64  # samples/day after resample
N_POINTS = DPY * NDPD  # 23360
TIME_SCALES_HOURS = [
    0.75, 1.5, 3.0, 6.0, 12.0, 24.0, 42.0, 84.0, 168.0,
    273.75, 547.5, 1095.0, 2190.0, 4380.0, 8760.0,
]


def _sine_period(Dt: int) -> np.ndarray:
    """One sine period sampled on Dt points, endpoint excluded
    (reference's sine_function, wavelet_decomposition.py:98-101)."""
    return np.sin(np.linspace(0.0, 2.0 * np.pi, Dt, endpoint=False))


def _family_specs(vy: int, vw: int, vd: int, dpy: int, dpd: int):
    """Yield (family, level, n_wavelets, support_len) in column order."""
    n = dpy * dpd
    for k in range(vy):
        yield "year", k, 2**k, n >> k
    for k in range(vw):
        yield "week", k, 52 * 2**k, (7 * dpd) >> k
    for k in range(vd):
        yield "day", k, dpy * 2**k, dpd >> k


def generate_dictionary(
    shape: str,
    trans_vec,
    vy: int = VY,
    vw: int = VW,
    vd: int = VD,
    dpy: int = DPY,
    dpd: int = NDPD,
) -> CSRMatrix:
    """Build the full wavelet dictionary for one year.

    ``shape``: 'square' or 'sine'. ``trans_vec`` = [transday, transweek,
    transyear] circular shifts (reference applies ``translate(row, -trans)``,
    i.e. support positions move forward by +trans mod N).
    """
    if shape not in ("square", "sine"):
        raise ValueError("shape must be 'square' or 'sine'")
    transday, transweek, transyear = (int(t) for t in trans_vec)
    n = dpy * dpd
    shift_of = {"year": transyear, "week": transweek, "day": transday}

    rows_parts: list[np.ndarray] = []
    cols_parts: list[np.ndarray] = []
    vals_parts: list[np.ndarray] = []

    # Phi0 offset column: square normalizes to 1/sqrt(N)
    # (wavelet_decomposition.py:42); sine leaves it at 1.0 (:131).
    phi0 = (1.0 / np.sqrt(n)) if shape == "square" else 1.0
    rows_parts.append(np.arange(n, dtype=np.int64))
    cols_parts.append(np.zeros(n, dtype=np.int64))
    vals_parts.append(np.full(n, phi0, dtype=np.float64))

    col = 1
    for family, _level, count, Dt in _family_specs(vy, vw, vd, dpy, dpd):
        shift = shift_of[family]
        # base support pattern for one wavelet of this level
        use_square = shape == "square" or (family == "day" and Dt <= 4)
        if use_square:
            base_vals = np.concatenate(
                [np.ones(Dt // 2), -np.ones(Dt - Dt // 2)]
            )
        else:
            base_vals = _sine_period(Dt)
        keep = base_vals != 0.0  # csr canonicalization drops exact zeros
        base_off = np.arange(Dt, dtype=np.int64)[keep]
        base_vals = base_vals[keep]
        nk = base_vals.size

        starts = np.arange(count, dtype=np.int64) * Dt
        # positions after circular shift by +trans (mod N)
        pos = (starts[:, None] + base_off[None, :] + shift) % n
        rows_parts.append(pos.reshape(-1))
        cols_parts.append(
            np.repeat(np.arange(col, col + count, dtype=np.int64), nk)
        )
        vals_parts.append(np.tile(base_vals, count))
        col += count

    m = col
    return CSRMatrix.from_coo(
        np.concatenate(rows_parts),
        np.concatenate(cols_parts),
        np.concatenate(vals_parts),
        (n, m),
    )


def dictionary_width(vy: int = VY, vw: int = VW, vd: int = VD, dpy: int = DPY) -> int:
    return 1 + (2**vy - 1) + 52 * (2**vw - 1) + dpy * (2**vd - 1)


def mother_dictionary(
    family: str, shape: str, dpy: int = DPY, dpd: int = NDPD
) -> np.ndarray:
    """Dense mother-wavelet set for the translation grid search
    (reference builds these per year at calc_translations.py:62-114).

    Returns a (count, N) dense array — these are tiny (<= 365 rows) and the
    search fits them with LSQR after sparsifying; we keep them dense and wrap
    in CSR at the call site.
    """
    n = dpy * dpd
    if family == "year":
        count, Dt = 1, n
    elif family == "week":
        count, Dt = 52, 7 * dpd
    elif family == "day":
        count, Dt = dpy, dpd
    else:
        raise ValueError(family)
    out = np.zeros((count, n), dtype=np.float64)
    for i in range(count):
        if shape == "square":
            out[i, i * Dt : i * Dt + Dt // 2] = 1.0
            out[i, i * Dt + Dt // 2 : (i + 1) * Dt] = -1.0
        else:
            out[i, i * Dt : (i + 1) * Dt] = _sine_period(Dt)
    return out


# ---------------------------------------------------------------------------
# flat coefficient index -> (scale_idx, pos) mapping
# ---------------------------------------------------------------------------

def flat_to_scale_pos(
    vy: int = VY, vw: int = VW, vd: int = VD, dpy: int = DPY
):
    """Vectorized mapping from the solver's natural flat coefficient order to
    the reference's exported sheet layout.

    Natural flat order: ``[offset | year k=0..vy-1 | week k=0..vw-1 |
    day k=0..vd-1]`` (slicing at wavelet_decomposition.py:271-286). The
    exported sheet reverses the scale list and each scale's entries
    (wavelet_decomposition.py:290), so ``scale_idx`` runs finest -> coarsest:
    0 = 0.75 h (day k=vd-1) ... 14 = 8760 h (year k=0), 15 = offset.

    Returns (scale_idx[M] int32, pos[M] int32).
    """
    sizes = [1]  # offset
    for k in range(vy):
        sizes.append(2**k)
    for k in range(vw):
        sizes.append(52 * 2**k)
    for k in range(vd):
        sizes.append(dpy * 2**k)
    n_scales = len(sizes)  # 16 natural scale lists

    scale_idx_parts = []
    pos_parts = []
    for s, size in enumerate(sizes):
        scale_idx_parts.append(
            np.full(size, n_scales - 1 - s, dtype=np.int32)
        )
        pos_parts.append(np.arange(size - 1, -1, -1, dtype=np.int32))
    return np.concatenate(scale_idx_parts), np.concatenate(pos_parts)


def scale_pos_to_flat(
    vy: int = VY, vw: int = VW, vd: int = VD, dpy: int = DPY
) -> np.ndarray:
    """Inverse permutation: flat index of each (scale_idx, pos), as a lookup
    array indexed by the rank of (scale_idx, pos) in lexicographic order."""
    scale_idx, pos = flat_to_scale_pos(vy, vw, vd, dpy)
    m = scale_idx.size
    order = np.lexsort((pos, scale_idx))
    inv = np.empty(m, dtype=np.int64)
    inv[:] = np.arange(m)[order]
    return inv  # inv[rank] = flat index


def scale_sizes(vy: int = VY, vw: int = VW, vd: int = VD, dpy: int = DPY):
    """Length of each scale list, indexed by scale_idx (finest -> coarsest,
    then offset)."""
    sizes = [1]
    for k in range(vy):
        sizes.append(2**k)
    for k in range(vw):
        sizes.append(52 * 2**k)
    for k in range(vd):
        sizes.append(dpy * 2**k)
    return list(reversed(sizes))
