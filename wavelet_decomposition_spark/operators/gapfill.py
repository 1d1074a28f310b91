"""Gap-fill to a regular grid (SURVEY.md §2.8; the generalization of the
reference's positional-grid assumption — its signals are already dense, our
activity series are sparse in time).

Pure relational: per-group grid via sequence() + explode, left join back,
then either zero-fill (counts — a second with no turns IS zero turns) or
last-observation-carried-forward (gauges) with
``last(value, ignorenulls).over(rowsBetween(unboundedPreceding, 0))``
— the as-of-style fill named in SURVEY.md §2.3.

Scale note: the exploded grid is bounded by group time-span / step; the
wavelet path caps it further by fixed dyadic window lengths. The join is on
(conv_id, bucket_ts) — co-partitioned with the grid by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_grid(series: DataFrame, step: str = "1 second",
              group_col: str = "conv_id", ts_col: str = "bucket_ts") -> DataFrame:
    """One row per (group, grid timestamp) spanning each group's [min, max]."""
    bounds = series.groupBy(group_col).agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")
    )
    return bounds.select(
        group_col,
        F.explode(
            F.sequence("_t0", "_t1", F.expr(f"interval {step}"))
        ).alias(ts_col),
    )


def gapfill_zero(series: DataFrame, value_cols, step: str = "1 second",
                 group_col: str = "conv_id", ts_col: str = "bucket_ts") -> DataFrame:
    """Counts: missing buckets become 0."""
    grid = time_grid(series, step, group_col, ts_col)
    filled = grid.join(series, [group_col, ts_col], "left")
    return filled.fillna(0, subset=list(value_cols))


def gapfill_locf(series: DataFrame, value_cols, step: str = "1 second",
                 group_col: str = "conv_id", ts_col: str = "bucket_ts") -> DataFrame:
    """Gauges: missing buckets carry the last observed value forward."""
    grid = time_grid(series, step, group_col, ts_col)
    filled = grid.join(series, [group_col, ts_col], "left")
    w = (
        Window.partitionBy(group_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled
