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


def test_energy_windows_matches_relational_spectrum(spark):
    """In-UDF spectrum (scale path) == energy_spectrum over the coefficient
    table (relational path), row for row."""
    filled = _filled(spark, n=5, seed=11)
    kw = dict(wavelet="db4", levels=4, window_len=128)
    want = (
        wavelet_ops.energy_spectrum(
            wavelet_ops.dwt_windows(filled, "turns", **kw)
        )
        .orderBy("conv_id", "window_id", "level", "coef_type")
        .toPandas()
    )
    got = (
        wavelet_ops.energy_windows(filled, "turns", **kw)
        .orderBy("conv_id", "window_id", "level", "coef_type")
        .toPandas()
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in ("conv_id", "window_id", "level", "coef_type", "wavelet"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all()
    np.testing.assert_allclose(
        got["energy"].to_numpy(), want["energy"].to_numpy(), rtol=1e-9
    )


def test_sparse_fill_fusion_matches_explicit_gapfill(spark):
    """dwt over the SPARSE tier with sparse_fill_step == dwt over the
    explicitly gap-filled dense grid (the fusion the flagship relies on)."""
    from wavelet_decomposition_spark.io.transcripts import transcripts_df
    from wavelet_decomposition_spark.operators import rollup

    raw = activity.activity_raw(transcripts_df(spark, 8, seed=5))
    tier = rollup.rollup_once(raw, "1m")
    dense = gapfill.gapfill_zero(
        tier, ["turns", "chars", "tool_calls"], step="1 minute"
    )
    kw = dict(wavelet="db4", levels=3, window_len=64)
    order = ["conv_id", "window_id", "level", "coef_type", "k"]
    want = (
        wavelet_ops.dwt_windows(dense, "turns", **kw)
        .orderBy(*order).toPandas()
    )
    got = (
        wavelet_ops.dwt_windows(tier, "turns", sparse_fill_step="1 minute", **kw)
        .orderBy(*order).toPandas()
    )
    assert len(got) == len(want) and len(got) > 0
    for c in order:
        assert (got[c].to_numpy() == want[c].to_numpy()).all()
    np.testing.assert_allclose(
        got["coef"].to_numpy(), want["coef"].to_numpy(), atol=1e-12
    )
    # energy path too
    e_want = (
        wavelet_ops.energy_windows(dense, "turns", **kw)
        .orderBy("conv_id", "window_id", "level", "coef_type").toPandas()
    )
    e_got = (
        wavelet_ops.energy_windows(
            tier, "turns", sparse_fill_step="1 minute", **kw
        )
        .orderBy("conv_id", "window_id", "level", "coef_type").toPandas()
    )
    np.testing.assert_allclose(
        e_got["energy"].to_numpy(), e_want["energy"].to_numpy(), rtol=1e-9
    )


def test_sparse_fill_rejects_offgrid_timestamps(spark):
    """Sparse mode must ERROR on off-grid input, not silently floor-divide
    rows into the wrong window cell."""
    import pytest

    df = spark.createDataFrame(
        [("c", "2024-01-01 00:00:00", 1.0), ("c", "2024-01-01 00:01:30", 2.0)],
        "conv_id string, bucket_ts string, turns double",
    ).withColumn("bucket_ts", F.col("bucket_ts").cast("timestamp"))
    out = wavelet_ops.dwt_windows(
        df, "turns", wavelet="haar", levels=2, window_len=8,
        sparse_fill_step="1 minute",
    )
    with pytest.raises(Exception, match="not aligned"):
        out.collect()


def test_sparse_fill_rejects_duplicate_grid_rows(spark):
    import pytest

    df = spark.createDataFrame(
        [("c", "2024-01-01 00:00:00", 1.0), ("c", "2024-01-01 00:00:00", 2.0),
         ("c", "2024-01-01 00:01:00", 3.0)],
        "conv_id string, bucket_ts string, turns double",
    ).withColumn("bucket_ts", F.col("bucket_ts").cast("timestamp"))
    out = wavelet_ops.dwt_windows(
        df, "turns", wavelet="haar", levels=2, window_len=8,
        sparse_fill_step="1 minute",
    )
    with pytest.raises(Exception, match="duplicate"):
        out.collect()
