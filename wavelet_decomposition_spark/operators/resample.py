"""P4 — per-group linear resample onto a denser regular grid.

The reference interpolates each year from 48 to 64 samples/day with
``np.interp`` on grids ``arange(0,dpy,1/dpd) -> arange(0,dpy,1/ndpd)``
(/root/reference/import_excel.py:47-54). Bit-for-bit parity with that
requires the same np.interp evaluation, so the kernel is a grouped
vectorized Arrow UDF (`applyInPandas`) — one group = one (series_id, year),
a bounded 17,520-row batch. The surrounding plan stays relational: the
shuffle is on the same (series_id, year) key the solve stage needs, so
Catalyst reuses a single exchange for normalize -> resample -> solve.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

RESAMPLE_SCHEMA = "series_id string, year int, idx int, value double"


def resample_per_year(
    df: DataFrame, dpd: int, ndpd: int, dpy: int = 365
) -> DataFrame:
    """(series_id, year, idx, value)@dpd -> same schema @ndpd per day."""
    oldx = np.arange(0, dpy, 1.0 / dpd)
    newx = np.arange(0, dpy, 1.0 / ndpd)

    def _interp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("idx")
        y = pdf["value"].to_numpy(dtype=np.float64)
        newy = np.interp(newx, oldx[: y.size], y)
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"].iloc[0],
                "year": pdf["year"].iloc[0],
                "idx": np.arange(newx.size, dtype=np.int32),
                "value": newy,
            }
        )

    return df.groupBy("series_id", "year").applyInPandas(
        _interp, schema=RESAMPLE_SCHEMA
    )
