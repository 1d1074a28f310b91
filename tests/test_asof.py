"""As-of join: parity vs pandas ``merge_asof`` (the de-facto reference
semantics) on adversarial fixtures — timestamp ties on both sides, unmatched
probes, multi-key, tolerance — plus a physical-plan shape check (ONE shuffle,
no join node, no Python stage)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wavelet_decomposition_spark.operators.asof import asof_join


def _fixture(seed=7, n_left=500, n_right=300, n_keys=9):
    rng = np.random.default_rng(seed)
    # coarse second grid -> plenty of exact ts collisions within and
    # across the two sides
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left).astype(np.int64),
            "ts": pd.to_datetime(
                1_700_000_000 + rng.integers(0, 2000, n_left), unit="s"
            ),
            "probe_id": np.arange(n_left, dtype=np.int64),
            "payload": rng.random(n_left).round(6),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys + 2, n_right).astype(np.int64),
            "ts": pd.to_datetime(
                1_700_000_000 + rng.integers(0, 2000, n_right), unit="s"
            ),
            "quote": rng.random(n_right).round(6),
            "rid": np.arange(n_right, dtype=np.int64),
        }
    )
    return left, right


def _pandas_asof(left, right, tolerance=None):
    # dedupe right ts ties with the same max_by(quote, rid) rule the
    # operator uses, then classic merge_asof per key
    r = (
        right.sort_values(["k", "ts", "rid"])
        .groupby(["k", "ts"], as_index=False)
        .last()
    )
    out = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        r.sort_values("ts", kind="stable")[["k", "ts", "quote"]].rename(
            columns={"ts": "ts_q", "quote": "quote_asof"}
        ),
        left_on="ts",
        right_on="ts_q",
        by="k",
        direction="backward",
        tolerance=pd.Timedelta(tolerance) if tolerance else None,
    )
    return out.sort_values("probe_id").reset_index(drop=True)


@pytest.mark.parametrize("tolerance", [None, "5 minutes"])
def test_asof_matches_pandas(spark, tolerance):
    left, right = _fixture()
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            right_cols=["quote"],
            tie_break="rid",
            tolerance=tolerance,
        )
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    exp = _pandas_asof(left, right, tolerance)
    assert len(out) == len(left)
    pd.testing.assert_series_equal(
        out["quote_asof"], exp["quote_asof"], check_names=False
    )
    pd.testing.assert_series_equal(
        out["ts_asof"], exp["ts_q"], check_names=False
    )
    # left payload survives untouched
    pd.testing.assert_series_equal(
        out["payload"], exp["payload"], check_names=False
    )


def test_asof_inclusive_tie_and_unmatched(spark):
    left = pd.DataFrame(
        {
            "k": np.int64([1, 1, 2]),
            "ts": pd.to_datetime([100, 50, 100], unit="s"),
            "probe_id": np.int64([0, 1, 2]),
        }
    )
    right = pd.DataFrame(
        {
            "k": np.int64([1, 1, 1]),
            "ts": pd.to_datetime([100, 100, 60], unit="s"),
            "quote": [1.0, 9.0, 5.0],
            "rid": np.int64([0, 1, 2]),
        }
    )
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            right_cols=["quote"],
            tie_break="rid",
        )
        .toPandas()
        .set_index("probe_id")
    )
    # equal timestamps match (inclusive <=), ties resolved by max rid
    assert out.loc[0, "quote_asof"] == 9.0
    # probe before every quote -> null
    assert pd.isna(out.loc[1, "quote_asof"])
    # key absent from right -> null
    assert pd.isna(out.loc[2, "quote_asof"])


def test_asof_multi_key(spark):
    left, right = _fixture(seed=13)
    left["k2"] = (left["probe_id"] % 2).astype(np.int64)
    right["k2"] = (right["rid"] % 2).astype(np.int64)
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k", "k2"],
            right_cols=["quote"],
            tie_break="rid",
        )
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    r = (
        right.sort_values(["k", "k2", "ts", "rid"])
        .groupby(["k", "k2", "ts"], as_index=False)
        .last()
    )
    exp = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        r.sort_values("ts", kind="stable")[["k", "k2", "ts", "quote"]].rename(
            columns={"quote": "quote_asof"}
        ),
        on="ts",
        by=["k", "k2"],
        direction="backward",
    ).sort_values("probe_id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        out["quote_asof"], exp["quote_asof"], check_names=False
    )


def test_asof_plan_shape(spark):
    """One exchange, no join operator, no Python stage: the whole point of
    the union-window form at 100 TB."""
    left, right = _fixture()
    plan = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            right_cols=["quote"],
            tie_break="rid",
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the tie-break pre-aggregate hashes on (k, ts) and the window reuses
    # nothing from it, so two exchanges total; without tie_break it is one
    assert plan.count("Exchange") <= 2
    for bad in ("Join", "CartesianProduct", "Python", "FlatMapGroups"):
        assert bad not in plan, f"unexpected {bad} in plan:\n{plan}"


def test_asof_plan_shape_no_tiebreak(spark):
    left, right = _fixture()
    right = right.groupby(["k", "ts"], as_index=False).last()
    plan = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            right_cols=["quote"],
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_null_timestamps_never_match(spark):
    # a null-ts RIGHT row can never be "at or before" any probe: pre-fix,
    # ASC NULLS FIRST sorted it ahead of everything and last(ignorenulls)
    # carried its payload onto every probe as a phantom match (round-4
    # advisory). Null-ts LEFT rows come out unmatched, payload intact.
    left = pd.DataFrame(
        {
            "k": np.int64([1, 1]),
            "ts": pd.to_datetime([100, None], unit="s"),
            "probe_id": np.int64([0, 1]),
        }
    )
    right = pd.DataFrame(
        {
            "k": np.int64([1, 1]),
            "ts": pd.to_datetime([None, 60], unit="s"),
            "quote": [666.0, 5.0],
        }
    )
    out = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            right_cols=["quote"],
        )
        .toPandas()
        .set_index("probe_id")
    )
    # the valid quote (ts=60) matches; the null-ts quote never appears
    assert out.loc[0, "quote_asof"] == 5.0
    assert not (out.quote_asof == 666.0).any()
    # null-ts probe: kept, unmatched
    assert pd.isna(out.loc[1, "quote_asof"])
    assert pd.isna(out.loc[1, "ts_asof"])
