"""MERGE INTO semantics (operators/merge.py)."""

import pytest

from wavelet_decomposition_spark.operators.merge import merge_upsert


def test_all_five_classifications(spark):
    target = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "k long, v long"
    )
    source = spark.createDataFrame(
        [
            (2, 99, False),   # update
            (3, None, True),  # delete
            (5, 50, False),   # insert
            (6, None, True),  # delete of absent row: no-op
        ],
        "k long, v long, del boolean",
    )
    out = {
        r.k: (r.v, r.action)
        for r in merge_upsert(
            target, source, ["k"], delete_col="del"
        ).collect()
    }
    assert out == {
        1: (10, "keep"),
        2: (99, "update"),
        4: (40, "keep"),
        5: (50, "insert"),
    }


def test_update_overwrites_with_null(spark):
    # MERGE overwrites, it does not coalesce
    target = spark.createDataFrame([(1, 10)], "k long, v long")
    source = spark.createDataFrame(
        [(1, None, False)], "k long, v long, del boolean"
    )
    out = merge_upsert(target, source, ["k"], delete_col="del").collect()
    assert out[0].v is None and out[0].action == "update"


def test_no_delete_col_means_pure_upsert(spark):
    target = spark.createDataFrame([(1, 10)], "k long, v long")
    source = spark.createDataFrame([(1, 11), (2, 22)], "k long, v long")
    out = {
        r.k: (r.v, r.action)
        for r in merge_upsert(target, source, ["k"]).collect()
    }
    assert out == {1: (11, "update"), 2: (22, "insert")}


def test_null_key_raises_at_runtime(spark):
    target = spark.createDataFrame([(None, 10)], "k long, v long")
    source = spark.createDataFrame([(1, 11)], "k long, v long")
    with pytest.raises(Exception, match="NULL target key"):
        merge_upsert(target, source, ["k"]).collect()


def test_missing_source_column_rejected(spark):
    target = spark.createDataFrame([(1, 10)], "k long, v long")
    source = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="missing columns"):
        merge_upsert(target, source, ["k"])
    with pytest.raises(ValueError, match="keys"):
        merge_upsert(target, target, [])


def test_single_shuffle_plan(spark):
    target = spark.range(1000).selectExpr("id AS k", "id AS v")
    source = spark.range(500).selectExpr(
        "id * 2 AS k", "id AS v", "false AS del"
    )
    plan = merge_upsert(
        target, source, ["k"], delete_col="del"
    )._jdf.queryExecution().executedPlan().toString()
    import re

    # one exchange per side of the single join, nothing downstream
    assert len(re.findall(r"Exchange", plan)) <= 2
