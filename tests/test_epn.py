"""EPN DataFrame operator vs the numpy oracle (kernel/epn.py), on golden
betas stacked across all 7 years — the reference's own analysis input."""

import numpy as np

from wavelet_decomposition_spark.io import reference_data as rd
from wavelet_decomposition_spark.kernel.epn import calc_epn
from wavelet_decomposition_spark.kernel.wavelets import TIME_SCALES_HOURS
from wavelet_decomposition_spark.operators.epn import epn

SATIS = [50.0, 90.0, 99.0]


def _stacked_golden(signal):
    sheets = None
    for year in range(2012, 2019):
        g = rd.load_golden_betas(signal, year)
        if sheets is None:
            sheets = [list(col) for col in g]
        else:
            for i, col in enumerate(g):
                sheets[i].extend(col)
    return [np.asarray(c) for c in sheets]


def test_epn_matches_numpy_oracle(spark):
    stacked = _stacked_golden("Consumption")
    oracle = calc_epn(stacked, SATIS, TIME_SCALES_HOURS, dpy=365, load_factor=1.0)

    rows = []
    for scale_idx, col in enumerate(stacked[:15]):
        for pos, b in enumerate(col):
            rows.append(("Consumption", scale_idx, int(pos), float(b)))
    betas = spark.createDataFrame(
        rows, "series_id string, scale_idx int, pos int, beta double"
    )
    result = epn(spark, betas, SATIS, n_years=7).toPandas()

    # rtol 1e-9: Spark's clamped-sum accumulates in partition order, numpy in
    # array order — float reassociation only, thresholds themselves are exact
    for _, r in result.iterrows():
        i = int(r.scale_idx)
        s = SATIS.index(r.satisfaction)
        np.testing.assert_allclose(r.pmax, oracle["pmax"][i, s], rtol=1e-9)
        np.testing.assert_allclose(r.emax, oracle["emax"][i, s], rtol=1e-9)
        np.testing.assert_allclose(r.n, oracle["n"][i, s], rtol=1e-9)
        np.testing.assert_allclose(r.uf, oracle["uf"][i, s], rtol=1e-9)
        np.testing.assert_allclose(r.serv, oracle["serv"][i, s], rtol=1e-9)
    assert len(result) == 15 * len(SATIS)
