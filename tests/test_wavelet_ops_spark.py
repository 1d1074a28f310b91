import numpy as np
from pyspark.sql import functions as F

from wavelet_decomposition_spark.io.transcripts import transcripts_df
from wavelet_decomposition_spark.kernel import dwt as kdwt
from wavelet_decomposition_spark.operators import activity, gapfill, wavelet_ops


def _filled(spark, n=6, seed=2):
    raw = activity.activity_raw(transcripts_df(spark, n, seed=seed))
    return gapfill.gapfill_zero(raw, ["turns", "chars", "tool_calls"])


def test_dwt_windows_match_numpy_kernel(spark):
    filled = _filled(spark)
    coefs = wavelet_ops.dwt_windows(
        filled, "turns", wavelet="haar", levels=3, window_len=64
    )
    pdf = coefs.toPandas()
    src = filled.orderBy("conv_id", "bucket_ts").toPandas()
    for conv, g in src.groupby("conv_id"):
        x = g["turns"].to_numpy(dtype=np.float64)
        n_windows = max(1, -(-x.size // 64))
        padded = np.zeros(n_windows * 64)
        padded[: x.size] = x
        details, approx = kdwt.dwt(padded[:64], "haar", 3)
        mine = pdf[(pdf.conv_id == conv) & (pdf.window_id == 0)]
        d1 = mine[(mine.level == 1) & (mine.coef_type == "detail")].sort_values("k")["coef"].to_numpy()
        np.testing.assert_allclose(d1, details[0], atol=1e-12)
        a = mine[mine.coef_type == "approx"].sort_values("k")["coef"].to_numpy()
        np.testing.assert_allclose(a, approx, atol=1e-12)


def test_energy_spectrum_parseval(spark):
    filled = _filled(spark, n=4, seed=8)
    coefs = wavelet_ops.dwt_windows(
        filled, "turns", wavelet="db4", levels=4, window_len=128
    )
    spec = wavelet_ops.energy_spectrum(coefs)
    total = spec.groupBy("conv_id").agg(F.sum("energy").alias("e")).toPandas()
    # input energy including zero padding == coefficient energy (Parseval)
    src = filled.orderBy("conv_id", "bucket_ts").toPandas()
    for _, row in total.iterrows():
        x = src[src.conv_id == row.conv_id]["turns"].to_numpy(dtype=np.float64)
        np.testing.assert_allclose(row.e, np.square(x).sum(), rtol=1e-9)


def test_modwt_windows_shapes(spark):
    filled = _filled(spark, n=3, seed=4)
    coefs = wavelet_ops.dwt_windows(
        filled, "chars", wavelet="haar", levels=3, window_len=64,
        transform="modwt",
    )
    pdf = coefs.toPandas()
    # MODWT is undecimated: every level has window_len coefficients
    counts = pdf.groupby(["conv_id", "window_id", "level", "coef_type"]).size()
    assert set(counts.unique()) == {64}
