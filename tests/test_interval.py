"""Point-in-interval join: parity vs a brute-force pandas cross-filter on
adversarial fixtures — overlapping intervals, boundary timestamps (inclusive
both ends), unmatched points, duplicate point rows, zero-length intervals,
granularity invariance — plus a physical-plan check (equi-join on
(key, bucket), never a nested-loop join)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wavelet_decomposition_spark.operators.interval import interval_join


def _fixture(seed=11, n_points=400, n_intervals=120, n_keys=7):
    rng = np.random.default_rng(seed)
    base = 1_700_000_000
    points = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_points).astype(np.int64),
            "ts": pd.to_datetime(
                base + rng.integers(0, 50_000, n_points), unit="s"
            ),
            "point_id": np.arange(n_points, dtype=np.int64),
        }
    )
    start = base + rng.integers(0, 50_000, n_intervals)
    # lengths 0..3h: zero-length intervals exercise the single-bucket
    # explode; 3h vs 1h granularity exercises multi-bucket fan-out
    length = rng.integers(0, 10_800, n_intervals)
    intervals = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys + 2, n_intervals).astype(np.int64),
            "start_ts": pd.to_datetime(start, unit="s"),
            "end_ts": pd.to_datetime(start + length, unit="s"),
            "iv_id": np.arange(n_intervals, dtype=np.int64),
        }
    )
    return points, intervals


def _brute(points, intervals, how="inner"):
    m = points.merge(intervals, on="k")
    m = m[(m.ts >= m.start_ts) & (m.ts <= m.end_ts)]
    if how == "inner":
        return m
    matched_ids = set(m.point_id)
    un = points[~points.point_id.isin(matched_ids)].copy()
    for c in ("start_ts", "end_ts"):
        un[c] = pd.NaT
    un["iv_id"] = pd.array([pd.NA] * len(un), dtype="Int64")
    return pd.concat([m, un], ignore_index=True)


def _canon(pdf):
    out = pdf.copy()
    out["iv_id"] = out["iv_id"].astype("float64").fillna(-1.0)
    cols = ["k", "ts", "point_id", "start_ts", "end_ts", "iv_id"]
    return (
        out[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("granularity", ["15 minutes", "1 hour", "6 hours"])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_parity_vs_brute_force(spark, granularity, how):
    points, intervals = _fixture()
    got = interval_join(
        spark.createDataFrame(points),
        spark.createDataFrame(intervals),
        on="k",
        granularity=granularity,
        how=how,
    ).toPandas()
    want = _brute(points, intervals, how=how)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_boundary_inclusive_both_ends(spark):
    points = pd.DataFrame(
        {
            "k": np.int64([1, 1, 1, 1]),
            "ts": pd.to_datetime(
                [1_700_000_000, 1_700_003_600, 1_699_999_999, 1_700_003_601],
                unit="s",
            ),
            "point_id": np.int64([0, 1, 2, 3]),
        }
    )
    intervals = pd.DataFrame(
        {
            "k": np.int64([1]),
            "start_ts": pd.to_datetime([1_700_000_000], unit="s"),
            "end_ts": pd.to_datetime([1_700_003_600], unit="s"),
            "iv_id": np.int64([0]),
        }
    )
    got = interval_join(
        spark.createDataFrame(points),
        spark.createDataFrame(intervals),
        on="k",
    ).toPandas()
    assert sorted(got.point_id) == [0, 1]  # start and end inclusive


def test_duplicate_point_rows_preserved(spark):
    # two byte-identical point rows: inner emits each against the matching
    # interval; left keeps both unmatched duplicates (value semantics)
    points = pd.DataFrame(
        {
            "k": np.int64([1, 1, 2, 2]),
            "ts": pd.to_datetime([1_700_000_100] * 4, unit="s"),
            "point_id": np.int64([5, 5, 6, 6]),
        }
    )
    intervals = pd.DataFrame(
        {
            "k": np.int64([1]),
            "start_ts": pd.to_datetime([1_700_000_000], unit="s"),
            "end_ts": pd.to_datetime([1_700_000_200], unit="s"),
            "iv_id": np.int64([0]),
        }
    )
    got = interval_join(
        spark.createDataFrame(points),
        spark.createDataFrame(intervals),
        on="k",
        how="left",
    ).toPandas()
    assert len(got) == 4
    assert (got[got.k == 1].iv_id == 0).all()
    assert got[got.k == 2].iv_id.isna().all()


def test_overlapping_intervals_emit_k_rows(spark):
    points = pd.DataFrame(
        {
            "k": np.int64([3]),
            "ts": pd.to_datetime([1_700_001_000], unit="s"),
            "point_id": np.int64([0]),
        }
    )
    intervals = pd.DataFrame(
        {
            "k": np.int64([3, 3, 3]),
            "start_ts": pd.to_datetime(
                [1_700_000_000, 1_700_000_500, 1_700_002_000], unit="s"
            ),
            "end_ts": pd.to_datetime(
                [1_700_002_000, 1_700_001_500, 1_700_003_000], unit="s"
            ),
            "iv_id": np.int64([0, 1, 2]),
        }
    )
    got = interval_join(
        spark.createDataFrame(points),
        spark.createDataFrame(intervals),
        on="k",
    ).toPandas()
    assert sorted(got.iv_id) == [0, 1]


def test_collision_and_how_validation(spark):
    points, intervals = _fixture()
    pdf = spark.createDataFrame(points)
    idf = spark.createDataFrame(intervals)
    with pytest.raises(ValueError, match="how"):
        interval_join(pdf, idf, on="k", how="full")
    with pytest.raises(ValueError, match="collision"):
        interval_join(pdf, idf.withColumnRenamed("iv_id", "point_id"), on="k")


def test_plan_is_equi_join(spark):
    """The whole point of bucketization: the physical plan must be a hash /
    sort-merge equi-join on (key, bucket) — if Catalyst ever planned the
    raw range predicate it would show BroadcastNestedLoopJoin."""
    points, intervals = _fixture()
    out = interval_join(
        spark.createDataFrame(points),
        spark.createDataFrame(intervals),
        on="k",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_left_join_null_payload_not_duplicated(spark):
    # a MATCHED point row carrying a NULL in a payload column must not be
    # re-emitted as unmatched: plain column-equality anti joins never match
    # NULLs, so the pre-fix code emitted it twice (round-4 advisory). The
    # null-safe (<=>) anti join keeps value semantics for duplicates while
    # treating NULL as equal to NULL.
    points = pd.DataFrame(
        {
            "k": np.int64([1, 1, 2]),
            "ts": pd.to_datetime(
                [1_700_000_100, 1_700_000_100, 1_700_000_100], unit="s"
            ),
            "payload": [None, 7.5, None],
        }
    )
    intervals = pd.DataFrame(
        {
            "k": np.int64([1]),
            "start_ts": pd.to_datetime([1_700_000_000], unit="s"),
            "end_ts": pd.to_datetime([1_700_000_200], unit="s"),
            "iv_id": np.int64([0]),
        }
    )
    got = interval_join(
        spark.createDataFrame(points),
        spark.createDataFrame(intervals),
        on="k",
        how="left",
    ).toPandas()
    # k=1 rows (one with null payload) matched exactly once each;
    # k=2 (null payload, no interval) exactly once, unmatched
    assert len(got) == 3
    k1 = got[got.k == 1]
    assert len(k1) == 2 and (k1.iv_id == 0).all()
    k2 = got[got.k == 2]
    assert len(k2) == 1 and k2.iv_id.isna().all()
