"""Single-pass column profiling (the ANALYZE/ingest-profiling primitive).

A training-data pipeline profiles every landed table before it enters the
mix: null rates, cardinalities, domains. The naive form runs one scan per
column, or one aggregate with k exact countDistincts — which Catalyst
plans as an Expand (k-way row multiplication feeding a single wide
aggregate). This instead UNPIVOTS the requested columns into
(col_name, val) long form — same k-way multiplication but feeding a
GROUPED aggregate, so the per-group distinct runs as a standard two-stage
partial aggregation keyed by (col_name, val): map-side partials shrink
each column to its distinct values before anything shuffles, and adding
columns never adds scans.

For 100 TB profiling where exact distinct is not required, pass
exact=False: approx_count_distinct replaces the distinct pre-aggregation
with per-partition HLL sketches (one exchange of sketch rows, independent
of cardinality).

Values are profiled as strings (min/max lexicographic) so one output
schema covers heterogeneous columns; callers cast non-string columns
explicitly in ``cols`` expressions when a different collation matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, cols: list[str], exact: bool = True
) -> DataFrame:
    """Long-format per-column profile: one row per column with
    (n_rows, n_nulls, n_distinct, min_val, max_val).

    ``cols`` entries are column names or SQL expressions yielding strings;
    each profiled as-is. Distinct counts ignore NULLs (SQL semantics).
    """
    pairs = ", ".join(f"'{c}', cast(({c}) as string)" for c in cols)
    long = df.select(
        F.expr(f"stack({len(cols)}, {pairs}) as (col_name, val)")
    )
    n_distinct = (
        F.count_distinct("val") if exact else F.approx_count_distinct("val")
    )
    return long.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("val")).alias("n_nulls"),
        n_distinct.alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
