import os

from pyspark.sql import functions as F

from wavelet_decomposition_spark.io import checkpoint as ckpt
from wavelet_decomposition_spark.io.transcripts import transcripts_df
from wavelet_decomposition_spark.operators import activity, rollup


def _input_with_day(spark, n=30, seed=21):
    raw = activity.activity_raw(transcripts_df(spark, n, seed=seed))
    return rollup.with_day(raw)


def _compute(day_slice):
    return rollup.rollup_once(day_slice.drop("day"), "1h")


def test_refresh_is_incremental_and_resumable(spark, tmp_path):
    base = str(tmp_path / "tiers")
    os.makedirs(base, exist_ok=True)
    inp = _input_with_day(spark)

    built1 = ckpt.refresh_tier(spark, inp, _compute, base, "1h")
    assert built1  # something was built
    # second run: nothing to do (same fingerprints)
    built2 = ckpt.refresh_tier(spark, inp, _compute, base, "1h")
    assert built2 == []

    # simulate a crash: drop the last manifest line (partition written,
    # manifest append lost) -> resume rebuilds exactly that day, output equal
    mpath = base + "/_manifest_1h.jsonl"
    lines = open(mpath).read().strip().split("\n")
    open(mpath, "w").write("\n".join(lines[:-1]) + "\n")
    before = ckpt.read_tier(spark, base, "1h").orderBy(
        "conv_id", "bucket_ts"
    ).toPandas()
    built3 = ckpt.refresh_tier(spark, inp, _compute, base, "1h")
    assert len(built3) == 1
    after = ckpt.read_tier(spark, base, "1h").orderBy(
        "conv_id", "bucket_ts"
    ).toPandas()
    assert before.equals(after)


def test_changed_input_invalidates_partition(spark, tmp_path):
    base = str(tmp_path / "tiers2")
    os.makedirs(base, exist_ok=True)
    inp = _input_with_day(spark, n=20, seed=3)
    ckpt.refresh_tier(spark, inp, _compute, base, "1h")
    # late data: bump one day's counts
    some_day = inp.select("day").distinct().orderBy("day").collect()[0].day
    changed = inp.withColumn(
        "turns",
        F.when(F.col("day") == F.lit(some_day), F.col("turns") + 1).otherwise(
            F.col("turns")
        ),
    )
    rebuilt = ckpt.refresh_tier(spark, changed, _compute, base, "1h")
    assert rebuilt == [str(some_day)]
