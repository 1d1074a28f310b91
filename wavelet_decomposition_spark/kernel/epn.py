"""Energy/Power/Cycles/Usage-factor (EPN) analytics — numpy oracle.

Re-implements the per-scale storage-sizing analytics of
/root/reference/calc_EPN.py:3-43: for each time scale, the
``satisfaction``-percent order statistic of |beta| is the discharge-power
threshold; derived energy, cycle count, usage factor and service follow.

This numpy version is the oracle for the distributed DataFrame
implementation in ``operators/epn.py``.

Note: the reference's sine correction uses ``shape is 'sine'``
(calc_EPN.py:36) — an identity comparison that CPython string interning
happens to make work; we implement the intended ``==`` semantics.
"""

from __future__ import annotations

import numpy as np


def calc_epn(
    beta_sheets: list[np.ndarray],
    satisfactions,
    time_scales,
    dpy: int = 365,
    load_factor: float = 1.0,
    shape: str = "square",
) -> dict[str, np.ndarray]:
    """``beta_sheets``: 15 arrays finest->coarsest (+ offset last, used only
    for Nyears). Returns dict of (n_scales, n_satisfactions) arrays."""
    satisfactions = np.asarray(satisfactions, dtype=np.float64)
    n_years = beta_sheets[-1].size  # offset column has one value per year
    n_scales = len(time_scales)
    pmax = np.zeros((n_scales, satisfactions.size))
    emax = np.zeros_like(pmax)
    n = np.zeros_like(pmax)
    uf = np.zeros_like(pmax)
    serv = np.zeros_like(pmax)

    for i in range(n_scales):
        scale_hours = time_scales[i]
        betac = np.abs(np.asarray(beta_sheets[i], dtype=np.float64))
        # number of instants to satisfy (calc_EPN.py:23-24)
        isatis = (np.ceil(satisfactions * betac.size / 100.0) - 1.0).astype(int)
        dech = np.sort(betac)
        thr = dech[isatis]  # per-satisfaction threshold (order statistic)
        with np.errstate(invalid="ignore", divide="ignore"):
            n_satis = (
                np.minimum(dech[:, None], thr[None, :]).sum(axis=0)
                / thr
                / n_years
            )
        pmax[i] = thr * load_factor
        factor = (2.0 / np.pi) if shape == "sine" else 1.0
        emax[i] = pmax[i] * scale_hours / 2.0 * factor
        n[i] = n_satis
        uf[i] = 100.0 * n[i] * scale_hours / (dpy * 24.0)
        serv[i] = emax[i] * n[i]
    return {"pmax": pmax, "emax": emax, "uf": uf, "n": n, "serv": serv}
