"""Iceberg-first table seam: in this sandbox only the parquet fallback is
exercisable (no Iceberg runtime jar); these tests pin the resolution
logic — identifiers vs paths, forced formats, the loud failure when
iceberg is requested without a runtime, and parquet round-trip."""

import shutil
import tempfile

import pandas as pd
import pytest

from wavelet_decomposition_spark.io.tables import (
    iceberg_available,
    read_table,
    write_table,
)


def test_iceberg_not_available_here(spark):
    # the sandbox has no catalog conf and no runtime jar
    assert iceberg_available(spark) is False


def test_parquet_roundtrip_by_path(spark):
    path = tempfile.mkdtemp(prefix="wds_tables_")
    shutil.rmtree(path)
    try:
        pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
        write_table(spark.createDataFrame(pdf), path)
        got = read_table(spark, path).toPandas().sort_values("a")
        assert list(got.a) == [1, 2, 3]
        assert list(got.b) == ["x", "y", "z"]
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_identifier_without_runtime_falls_back_loudly(spark):
    # auto-detect: an identifier with no runtime resolves to parquet and
    # fails on read only because no such file exists (never silently
    # treated as iceberg)...
    with pytest.raises(Exception):
        read_table(spark, "db.some_table").collect()
    # ...but FORCING iceberg raises the explicit runtime error
    with pytest.raises(RuntimeError, match="Iceberg"):
        read_table(spark, "db.some_table", format="iceberg")
    with pytest.raises(RuntimeError, match="Iceberg"):
        write_table(
            spark.createDataFrame(pd.DataFrame({"a": [1]})),
            "db.some_table",
            format="iceberg",
        )


def test_bad_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported"):
        read_table(spark, "/tmp/x", format="orc")


def test_runtime_conf_catalog_scanned_without_runtime(spark):
    """A catalog registered via spark.conf.set after session start is
    seen by the conf scan, but with no Iceberg jar on the classpath the
    availability check still (correctly) returns False — and forcing
    iceberg still raises rather than misreading."""
    spark.conf.set("spark.sql.catalog.rt_test", "whatever.Class")
    try:
        assert iceberg_available(spark) is False  # class load fails
        with pytest.raises(RuntimeError, match="Iceberg"):
            read_table(spark, "rt_test.db.t", format="iceberg")
    finally:
        spark.conf.unset("spark.sql.catalog.rt_test")
