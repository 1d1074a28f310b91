"""Clustered parquet layout: the writer's promises are verified from the
written files' own metadata (pyarrow, no scan) — bounded file sizes, file
key-ranges that actually prune, in-file row-group ordering — plus the
unclustered control showing pruning factor ~1.0 without the writer."""

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wavelet_decomposition_spark.operators.layout import (
    layout_stats,
    pruning_factor,
    write_clustered,
)


@pytest.fixture(scope="module")
def table_pdf():
    rng = np.random.default_rng(7)
    n = 200_000
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 10_000, n).astype(np.int64),
            "ts": pd.to_datetime(
                1_700_000_000 + rng.integers(0, 10**6, n), unit="s"
            ),
            "v": rng.random(n),
        }
    )


@pytest.fixture(scope="module")
def clustered_path(spark, table_pdf):
    path = tempfile.mkdtemp(prefix="wds_layout_")
    shutil.rmtree(path)
    write_clustered(
        spark.createDataFrame(table_pdf).repartition(16),
        path,
        cluster_cols=["user_id"],
        target_rows_per_file=30_000,
    )
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_files_bounded_and_ordered(clustered_path):
    stats = layout_stats(clustered_path, "user_id")
    assert stats, "no parquet files written"
    by_file: dict = {}
    for s in stats:
        assert s["rows"] <= 30_000
        by_file.setdefault(s["file"], []).append(s)
    # row groups inside a file are sorted: non-overlapping ascending ranges
    for rgs in by_file.values():
        rgs = sorted(rgs, key=lambda r: r["row_group"])
        for a, b in zip(rgs, rgs[1:]):
            assert a["max"] <= b["min"]


def test_point_scan_prunes(spark, clustered_path, table_pdf):
    stats = layout_stats(clustered_path, "user_id")
    n_files = len({s["file"] for s in stats})
    assert n_files >= 4
    probes = [17, 2500, 5000, 7500, 9990]
    pf = pruning_factor(stats, probes)
    # a point predicate must touch only a small fraction of files; the
    # range writer guarantees near-disjoint envelopes (allow boundary
    # overlap between adjacent ranges)
    assert pf <= 2.0 / n_files + 0.05, (pf, n_files)


def test_unclustered_control_does_not_prune(spark, table_pdf):
    path = tempfile.mkdtemp(prefix="wds_layout_ctrl_")
    shutil.rmtree(path)
    try:
        (
            spark.createDataFrame(table_pdf)
            .repartition(8)  # hash/random spread: every file sees all keys
            .write.mode("overwrite")
            .parquet(path)
        )
        stats = layout_stats(path, "user_id")
        pf = pruning_factor(stats, [17, 2500, 5000, 7500, 9990])
        assert pf > 0.9  # every probe hits essentially every file
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_spark_scan_respects_layout(spark, clustered_path):
    """End to end through Spark: a point filter on the cluster key reads
    the clustered table correctly (values intact after the range+sort
    rewrite) and the scan's pushed filter appears in the plan."""
    df = spark.read.parquet(clustered_path).where(F.col("user_id") == 2500)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,2500)" in plan
    assert df.count() > 0
