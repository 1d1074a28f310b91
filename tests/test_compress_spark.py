from pyspark.sql import functions as F

from wavelet_decomposition_spark.io.transcripts import transcripts_df
from wavelet_decomposition_spark.operators import activity, compress, rollup

COLS = ["turns", "chars", "tool_calls"]


def test_block_roundtrip_exact(spark):
    raw = activity.activity_raw(transcripts_df(spark, 25, seed=6))
    tier = rollup.rollup_once(raw, "1m")
    blocks = compress.encode_blocks(tier, COLS)
    decoded = compress.decode_blocks(blocks, COLS)
    # exact round trip: same (conv, ts, values) multiset
    orig = tier.select(
        "conv_id", "bucket_ts", *[F.col(c).cast("double").alias(c) for c in COLS]
    )
    assert decoded.exceptAll(orig).count() == 0
    assert orig.exceptAll(decoded).count() == 0


def test_compression_wins_on_1m_tier(spark):
    raw = activity.activity_raw(transcripts_df(spark, 60, seed=13))
    tier = rollup.rollup_once(raw, "1m")
    blocks = compress.encode_blocks(tier, COLS)
    report = compress.compression_report(blocks, COLS).agg(
        F.sum("compressed_bytes").alias("c"), F.sum("raw_bytes").alias("r")
    ).collect()[0]
    assert report.c < report.r  # strictly smaller than raw 8B/point streams


def test_per_turn_text_equality_invariant(spark):
    """North-star invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering between the raw snapshot and derived
    lineage (here: a regenerated snapshot standing in for a lineage copy)."""
    snap1 = transcripts_df(spark, 40, seed=42)
    snap2 = transcripts_df(spark, 40, seed=42)  # derived lineage replica
    h1 = snap1.select("conv_id", "turn_idx", F.sha2("text", 256).alias("h"))
    h2 = snap2.select("conv_id", "turn_idx", F.sha2("text", 256).alias("h"))
    mismatches = h1.join(h2, ["conv_id", "turn_idx"]).filter(
        h1["h"] != h2["h"]
    )
    assert mismatches.count() == 0
    assert h1.count() == h2.count()
