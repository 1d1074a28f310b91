"""Expectation checker: planted violations are counted exactly, null
rule results count as violations (conservative ingest gate), everything
happens in one scan (single aggregate, no per-rule jobs)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from wavelet_decomposition_spark.operators.expect import check_expectations


def test_planted_violation_counts(spark):
    pdf = pd.DataFrame(
        {
            "v": [1.0, -2.0, 3.0, None, 5.0],
            "k": ["a", "b", "zz", "a", "b"],
        }
    )
    out = (
        check_expectations(
            spark.createDataFrame(pdf),
            {
                "v_nonneg": F.col("v") >= 0,
                "k_known": F.col("k").isin("a", "b"),
            },
        )
        .toPandas()
        .set_index("rule")
    )
    # v >= 0: -2 violates, None is unevaluable -> violation
    assert out.loc["v_nonneg", "n_violations"] == 2
    assert out.loc["v_nonneg", "n_rows"] == 5
    assert out.loc["v_nonneg", "pass_rate"] == 0.6
    assert out.loc["k_known", "n_violations"] == 1
    # long format, sorted by rule name
    assert list(out.index) == ["k_known", "v_nonneg"]


def test_single_scan_plan(spark):
    pdf = pd.DataFrame({"v": [1.0, 2.0]})
    df = spark.createDataFrame(pdf)
    out = check_expectations(
        df, {f"r{i}": F.col("v") > i for i in range(20)}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # 20 rules, ONE aggregate over one scan: no joins, no extra scans
    assert plan.count("Scan") == 1
    assert "Join" not in plan


def test_empty_rules_rejected(spark):
    with pytest.raises(ValueError, match="no rules"):
        check_expectations(spark.range(1), {})


def test_bad_rule_name_rejected(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="rule name"):
        check_expectations(df, {"has-nulls": F.col("id") >= 0})
    with pytest.raises(ValueError, match="rule name"):
        check_expectations(df, {"o'clock": F.col("id") >= 0})


def test_empty_input_pass_rate_vacuous(spark):
    out = (
        check_expectations(
            spark.range(5).where(F.col("id") < 0),
            {"nonneg": F.col("id") >= 0},
        )
        .toPandas()
    )
    assert out.n_rows.iloc[0] == 0
    assert out.pass_rate.iloc[0] == 1.0  # vacuous, never NaN


def test_foreign_keys_orphans_and_nulls(spark):
    from wavelet_decomposition_spark.operators.expect import (
        check_foreign_keys,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None), (5, 20)],
        "id long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
    out = check_foreign_keys(
        [("c_fk", child, "fk", parent, "pk")]
    ).collect()
    assert len(out) == 1
    r = out[0]
    # 5 children, 1 NULL fk (unknown, not orphan), 1 orphan (99)
    assert (r.n_child, r.n_null_fk, r.n_orphans, r.ok) == (5, 1, 1, False)


def test_foreign_keys_clean_and_dup_parent_keys(spark):
    from wavelet_decomposition_spark.operators.expect import (
        check_foreign_keys,
    )
    import pytest

    child = spark.createDataFrame([(1, 10), (2, 20)], "id long, fk long")
    # duplicate parent keys must not double-count children
    parent = spark.createDataFrame(
        [(10,), (10,), (20,)], "pk long"
    )
    out = check_foreign_keys(
        [("a", child, "fk", parent, "pk"),
         ("b", child, "fk", parent, "pk")]
    ).orderBy("fk").collect()
    assert [(r.fk, r.n_child, r.n_orphans, r.ok) for r in out] == [
        ("a", 2, 0, True), ("b", 2, 0, True)
    ]
    with pytest.raises(ValueError):
        check_foreign_keys([])
