"""S4/A5 — coefficient sinks and cross-year stacking.

The reference exports betas to xlsx workbooks (one file per signal, one
sheet per year, one column per scale; wavelet_decomposition.py:294-321).
The engine's canonical sink is partitioned parquet in long format; the
"sheet" and "stacked" layouts are derived views:

- stacking across years (A5) is a no-op in long format (year is a column);
- the sheet layout is an ordered collect per (scale) — export-time only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def write_betas(betas: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Canonical coefficient sink: parquet partitioned by (series_id, year)
    — partition pruning for per-signal / per-year reads."""
    (
        betas.repartition("series_id", "year")
        .write.mode(mode)
        .partitionBy("series_id", "year")
        .parquet(path)
    )


def stacked_betas(betas: DataFrame) -> DataFrame:
    """A5 — all years stacked per scale, ordered (year, pos) like the
    reference's stacked workbook (wavelet_decomposition.py:302-319):
    (series_id, scale_idx, stack_pos, beta)."""
    w = Window.partitionBy("series_id", "scale_idx").orderBy("year", "pos")
    return betas.select(
        "series_id",
        "scale_idx",
        (F.row_number().over(w) - 1).alias("stack_pos"),
        "beta",
    )


def sheet_layout(betas: DataFrame) -> DataFrame:
    """Export view mirroring one xlsx sheet: per (series_id, year,
    scale_idx) the ordered coefficient list (one 'column' per scale)."""
    return (
        betas.groupBy("series_id", "year", "scale_idx")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "beta"))
            ).alias("_cells")
        )
        .select(
            "series_id",
            "year",
            "scale_idx",
            F.transform("_cells", lambda c: c["beta"]).alias("column"),
        )
    )
