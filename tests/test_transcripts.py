import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from wavelet_decomposition_spark.io.transcripts import (
    transcripts_df,
    transcripts_pandas,
)


def test_generator_deterministic_across_partitioning(spark):
    a = transcripts_df(spark, 50, seed=7, partitions=2).orderBy(
        "conv_id", "turn_idx"
    ).toPandas()
    b = transcripts_df(spark, 50, seed=7, partitions=13).orderBy(
        "conv_id", "turn_idx"
    ).toPandas()
    pd.testing.assert_frame_equal(a, b)
    # and matches the driver-side oracle generator
    c = transcripts_pandas(50, seed=7).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(a["text"]) == list(c["text"])
    assert list(a["ts"]) == list(c["ts"])


def test_schema_and_invariants(spark):
    df = transcripts_df(spark, 100, seed=42)
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    stats = df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("turn_idx").alias("nd"),
        F.min("turn_idx").alias("lo"),
        F.max("turn_idx").alias("hi"),
    ).collect()
    for r in stats:
        # turn_idx dense 0..n-1 within each conversation
        assert (r.n, r.nd, r.lo, r.hi) == (r.n, r.n, 0, r.n - 1)
    # timestamps strictly ordered within a conversation (per turn_idx)
    bad = (
        df.withColumn(
            "prev_ts",
            F.lag("ts").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("conv_id").orderBy("turn_idx")
            ),
        )
        .filter(F.col("prev_ts") > F.col("ts"))
        .count()
    )
    assert bad == 0


def test_heavy_tail_present(spark):
    lens = (
        transcripts_df(spark, 400, seed=42)
        .groupBy("conv_id").count().select("count").toPandas()["count"]
    )
    # heavy tail: max conversation much longer than the median
    assert lens.max() > 10 * lens.median()


def test_text_is_content_addressable(spark):
    df = transcripts_df(spark, 20, seed=1)
    # regenerating yields per-turn identical text (hash join on key + text)
    df2 = transcripts_df(spark, 20, seed=1)
    joined = df.select(
        "conv_id", "turn_idx", F.sha2("text", 256).alias("h1")
    ).join(
        df2.select("conv_id", "turn_idx", F.sha2("text", 256).alias("h2")),
        ["conv_id", "turn_idx"],
    )
    assert joined.filter(F.col("h1") != F.col("h2")).count() == 0
