"""Column profiling: exact stats, null handling, approx path, plan shape."""

from pyspark.sql import functions as F

from wavelet_decomposition_spark.operators.profile import profile_columns


def _df(spark):
    rows = [
        ("a", 1, None),
        ("b", 1, 2.5),
        ("a", None, 2.5),
        (None, 3, 7.0),
        ("c", 3, 7.0),
    ]
    return spark.createDataFrame(rows, "s string, i int, d double")


def test_profile_exact(spark):
    out = {r.col_name: r for r in profile_columns(_df(spark), ["s", "i"]).collect()}
    assert set(out) == {"s", "i"}
    s = out["s"]
    assert (s.n_rows, s.n_nulls, s.n_distinct) == (5, 1, 3)
    assert (s.min_val, s.max_val) == ("a", "c")
    i = out["i"]
    assert (i.n_rows, i.n_nulls, i.n_distinct) == (5, 1, 2)
    assert (i.min_val, i.max_val) == ("1", "3")


def test_profile_expression_column(spark):
    out = profile_columns(_df(spark), ["upper(s)"]).collect()[0]
    assert out.col_name == "upper(s)"
    assert (out.min_val, out.max_val) == ("A", "C")


def test_profile_approx_matches_exact_at_small_cardinality(spark):
    exact = {r.col_name: r.n_distinct
             for r in profile_columns(_df(spark), ["s", "i"]).collect()}
    approx = {r.col_name: r.n_distinct
              for r in profile_columns(_df(spark), ["s", "i"], exact=False).collect()}
    # HLL++ is exact at tiny cardinalities
    assert approx == exact


def test_profile_single_scan(spark):
    """Adding profiled columns must not add scans: one leaf regardless of k."""
    df = _df(spark)
    out = profile_columns(df, ["s", "i", "d"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") <= 1
