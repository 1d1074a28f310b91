"""DWT / MODWT pyramids over gap-filled activity-series windows
(north star: per-scale detail/approximation coefficients and energy spectra
as vectorized Arrow pandas UDFs).

Each (conv_id) group's gap-filled series is cut into fixed dyadic windows of
``2**levels_cap * k`` points; one ``applyInPandas`` call computes the whole
pyramid for all of a group's windows vectorized (numpy kernel,
kernel/dwt.py). Group size is bounded by the window length x windows per
conversation, so Arrow batches stay small and skew is capped.

Output (long format, one row per coefficient):
    (conv_id, window_id, wavelet, level, k, coef_type, coef)
level 1..J are details (finest first), level J approx rows carry
coef_type='approx'. Energy spectra are a relational groupBy over this table
— sum(coef*coef) per (conv_id, window_id, level, coef_type) — mirroring the
reference's per-scale energy analytics (SURVEY.md A7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel import dwt as kdwt

COEF_SCHEMA = (
    "conv_id string, window_id int, wavelet string, level int, k int, "
    "coef_type string, coef double"
)


def dwt_windows(
    filled: DataFrame,
    value_col: str,
    wavelet: str = "haar",
    levels: int = 5,
    window_len: int | None = None,
    transform: str = "dwt",
    group_col: str = "conv_id",
    ts_col: str = "bucket_ts",
    n_partitions: int | None = None,
) -> DataFrame:
    """Pyramid-transform a gap-filled series per conversation.

    ``window_len`` defaults to ``2**levels * 8``; tail windows are zero-padded
    to the dyadic length (zero turns = genuinely zero activity, so padding is
    semantically the zero-fill continued).
    """
    if window_len is None:
        window_len = (2**levels) * 8
    if transform not in ("dwt", "modwt"):
        raise ValueError(transform)

    def _pyramid(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        x = pdf[value_col].to_numpy(dtype=np.float64)
        conv = pdf[group_col].iloc[0]
        n_windows = max(1, -(-x.size // window_len))
        padded = np.zeros(n_windows * window_len, dtype=np.float64)
        padded[: x.size] = x
        out_conv, out_win, out_level, out_k, out_type, out_coef = (
            [], [], [], [], [], []
        )
        for w in range(n_windows):
            seg = padded[w * window_len : (w + 1) * window_len]
            if transform == "dwt":
                details, approx = kdwt.dwt(seg, wavelet, levels)
            else:
                details, approx = kdwt.modwt(seg, wavelet, levels)
            for lvl, d in enumerate(details, start=1):
                out_conv.append(np.full(d.size, conv, dtype=object))
                out_win.append(np.full(d.size, w, dtype=np.int32))
                out_level.append(np.full(d.size, lvl, dtype=np.int32))
                out_k.append(np.arange(d.size, dtype=np.int32))
                out_type.append(np.full(d.size, "detail", dtype=object))
                out_coef.append(d)
            out_conv.append(np.full(approx.size, conv, dtype=object))
            out_win.append(np.full(approx.size, w, dtype=np.int32))
            out_level.append(np.full(approx.size, levels, dtype=np.int32))
            out_k.append(np.arange(approx.size, dtype=np.int32))
            out_type.append(np.full(approx.size, "approx", dtype=object))
            out_coef.append(approx)
        return pd.DataFrame(
            {
                "conv_id": np.concatenate(out_conv),
                "window_id": np.concatenate(out_win),
                "wavelet": wavelet,
                "level": np.concatenate(out_level),
                "k": np.concatenate(out_k),
                "coef_type": np.concatenate(out_type),
                "coef": np.concatenate(out_coef),
            }
        )

    # explicit co-partitioning: the pyramid stage is Python-CPU-bound, and
    # AQE's size-based coalescing would pack thousands of groups into a
    # handful of tasks (its cost model only sees the small shuffle bytes).
    # repartition(P, key) satisfies the groupBy's required clustering, so no
    # second shuffle is added and the task count stays P.
    if n_partitions is None:
        n_partitions = filled.sparkSession.sparkContext.defaultParallelism * 2
    return (
        filled.repartition(n_partitions, group_col)
        .groupBy(group_col)
        .applyInPandas(_pyramid, schema=COEF_SCHEMA)
    )


def energy_spectrum(coefs: DataFrame) -> DataFrame:
    """Per-scale energy — relational aggregation over the coefficient table
    (sum of squares; Parseval ties the total to the input energy)."""
    return (
        coefs.groupBy("conv_id", "window_id", "wavelet", "level", "coef_type")
        .agg(F.sum(F.col("coef") * F.col("coef")).alias("energy"))
    )
