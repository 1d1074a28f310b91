"""Electricity-series fixture: the reference's input workbook as a Spark
long-format table (series_id, year, idx, value) at the raw 48 samples/day.

Driver-side build (the workbook is ~370k values); real deployments read the
same schema from parquet/Iceberg — `write_parquet_fixture` materializes it
so Spark tests exercise a genuine scan with pushdown/pruning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .reference_data import load_input_series

SCHEMA = "series_id string, year int, idx int, value double"


def electricity_pandas(signals=None, years=None) -> pd.DataFrame:
    data, all_years = load_input_series()
    signals = list(signals or data.keys())
    years = list(years or all_years)
    frames = []
    for sig in signals:
        for year in years:
            vals = data[sig][year]
            frames.append(
                pd.DataFrame(
                    {
                        "series_id": sig,
                        "year": np.int32(year),
                        "idx": np.arange(vals.size, dtype=np.int32),
                        "value": vals,
                    }
                )
            )
    return pd.concat(frames, ignore_index=True)


def electricity_df(spark: SparkSession, signals=None, years=None) -> DataFrame:
    return spark.createDataFrame(electricity_pandas(signals, years), schema=SCHEMA)


def write_parquet_fixture(spark: SparkSession, path: str, **kw) -> None:
    (
        electricity_df(spark, **kw)
        .repartition("series_id", "year")
        .write.mode("overwrite")
        .partitionBy("series_id", "year")
        .parquet(path)
    )
