"""haar_dwt_relational == dwt_windows('haar') — two disjoint computation
paths (pure-JVM closed form vs applyInPandas numpy pyramid) must agree on
every coefficient, including zero-padded tail windows."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wavelet_decomposition_spark.operators import wavelet_ops


@pytest.fixture(scope="module")
def dense_series(spark):
    rng = np.random.default_rng(7)
    rows = []
    # conv a: two full windows; conv b: one full + a partial (zero-padded)
    for conv, n in (("a", 32), ("b", 21)):
        ts = pd.date_range("2026-01-01", periods=n, freq="1min")
        v = rng.integers(0, 50, size=n)
        rows.append(
            pd.DataFrame({"conv_id": conv, "bucket_ts": ts, "turns": v})
        )
    return spark.createDataFrame(pd.concat(rows))


def test_relational_matches_kernel(dense_series):
    levels, window_len = 3, 16
    kern = wavelet_ops.dwt_windows(
        dense_series, "turns", "haar", levels=levels, window_len=window_len
    )
    rel = wavelet_ops.haar_dwt_relational(
        dense_series, "turns", levels=levels, window_len=window_len
    )
    keys = ["conv_id", "window_id", "level", "k", "coef_type"]
    j = (
        kern.join(rel.withColumnRenamed("coef", "rel_coef"), keys, "left")
        .withColumn(
            "err", F.abs(F.col("coef") - F.coalesce("rel_coef", F.lit(0.0)))
        )
        .toPandas()
    )
    # every kernel coefficient covered: 32/16 + ceil(21/16) windows
    n_win = 2 + 2
    assert len(j) == n_win * window_len
    assert j["err"].max() <= 1e-10
    # zero-padded tail really exercised: conv b window 1 has absent blocks
    tail = j[(j.conv_id == "b") & (j.window_id == 1)]
    assert tail["rel_coef"].isna().any()
    # and no relational row falls outside the kernel's coefficient grid
    assert (
        wavelet_ops.haar_dwt_relational(
            dense_series, "turns", levels=levels, window_len=window_len
        )
        .join(kern, keys, "left_anti")
        .count()
        == 0
    )


def test_closed_form_vs_numpy(dense_series):
    """The relational closed form independently matches kernel.dwt on a
    hand-extracted full window (no Spark kernel in the loop)."""
    from wavelet_decomposition_spark.kernel import dwt as kdwt

    pdf = (
        dense_series.filter("conv_id = 'a'")
        .orderBy("bucket_ts")
        .toPandas()
    )
    x = pdf["turns"].to_numpy(dtype=float)[:16]
    details, approx = kdwt.dwt(x, "haar", levels=3)
    rel = (
        wavelet_ops.haar_dwt_relational(
            dense_series.filter("conv_id = 'a'"), "turns", 3, 16
        )
        .filter("window_id = 0")
        .toPandas()
        .set_index(["level", "coef_type", "k"])["coef"]
    )
    for lvl, d in enumerate(details, start=1):
        for k, v in enumerate(d):
            assert abs(rel.loc[(lvl, "detail", k)] - v) <= 1e-10
    for k, v in enumerate(approx):
        assert abs(rel.loc[(3, "approx", k)] - v) <= 1e-10
