"""Winsorization (operators/featureprep.py) vs a direct numpy order-
statistic re-implementation."""

import numpy as np
import pytest

from wavelet_decomposition_spark.operators.featureprep import winsorize


def _df(spark, vals, group="g"):
    rows = [(group, i, int(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "g string, id long, v long")


def _np_bounds(vals, lo_pct=5, hi_pct=95):
    s = np.sort(np.asarray(vals, dtype=np.int64), kind="stable")
    n = len(s)
    lo = s[int(np.ceil(lo_pct * n / 100)) - 1]
    hi = s[int(np.ceil(hi_pct * n / 100)) - 1]
    return int(lo), int(hi)


def test_matches_numpy_order_statistics(spark):
    rng = np.random.default_rng(17)
    vals = rng.integers(-10_000, 10_000, size=400)
    out = winsorize(
        _df(spark, vals), value_col="v", group_col="g", id_col="id"
    ).collect()
    lo, hi = _np_bounds(vals)
    assert len(out) == 400
    for r in out:
        assert (r["lo_bound"], r["hi_bound"]) == (lo, hi)
        assert r["v_w"] == min(max(r["v"], lo), hi)
        assert r["clamped"] == (
            -1 if r["v"] < lo else (1 if r["v"] > hi else 0)
        )
    # clamp rates: <= lo_pct% below, <= (100-hi_pct)% above
    n_lo = sum(1 for r in out if r["clamped"] == -1)
    n_hi = sum(1 for r in out if r["clamped"] == 1)
    assert n_lo <= 0.05 * 400 and n_hi <= 0.05 * 400


def test_groups_are_independent(spark):
    a = _df(spark, range(100), "a")
    b = _df(spark, range(1000, 1100), "b")
    out = winsorize(
        a.unionByName(b), value_col="v", group_col="g", id_col="id"
    ).collect()
    bounds = {(r["g"], r["lo_bound"], r["hi_bound"]) for r in out}
    assert bounds == {("a", 4, 94), ("b", 1004, 1094)}


def test_tiny_groups_and_ties(spark):
    # n=1: both ranks are 1 -> bounds equal the single value, no clamps
    out = winsorize(
        _df(spark, [7]), value_col="v", group_col="g", id_col="id"
    ).collect()
    assert [(r["lo_bound"], r["hi_bound"], r["clamped"]) for r in out] == [
        (7, 7, 0)
    ]
    # all-ties: bounds equal the tied value, nothing clamps
    out = winsorize(
        _df(spark, [5] * 40), value_col="v", group_col="g", id_col="id"
    ).collect()
    assert all(
        r["lo_bound"] == r["hi_bound"] == 5 and r["clamped"] == 0
        for r in out
    )


def test_row_count_preserved_and_bounds_broadcast(spark):
    df = _df(spark, range(250))
    out = winsorize(df, value_col="v", group_col="g", id_col="id")
    assert out.count() == 250
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan
