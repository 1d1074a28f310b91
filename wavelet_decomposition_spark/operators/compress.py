"""Retention-tier block compression: Gorilla XOR floats + delta-of-delta
timestamps per (conv_id, day) block, stored as BinaryType columns.

The reference's analogue is its memo-cache layer (S2/S3 in SURVEY.md §2.1);
the north star requires the compressed representation per retention tier.
Encode/decode are vectorized numpy codecs (kernel/gorilla.py,
kernel/deltadelta.py) inside ``applyInPandas`` — one block per group, no
per-row Python. Round-trips are bit-exact, so a tier can be stored
compressed and re-expanded losslessly (test invariant).

Block schema:
    (conv_id, day, n_points, ts_blob binary, <col>_blob binary ...)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel import deltadelta, gorilla


def encode_blocks(
    tier_df: DataFrame,
    value_cols,
    group_col: str = "conv_id",
    ts_col: str = "bucket_ts",
    block_col: str = "day",
) -> DataFrame:
    """Compress one tier into per-(conv, day) blocks."""
    value_cols = list(value_cols)
    schema = (
        f"{group_col} string, {block_col} date, n_points int, ts_blob binary, "
        + ", ".join(f"{c}_blob binary" for c in value_cols)
    )

    def _enc(pdf: pd.DataFrame) -> pd.DataFrame:
        # one Spark group = one conversation; the (usually few) day blocks
        # are segmented here so Spark pays one Python call per conversation,
        # not one per (conv, day). Each block encode is vectorized numpy.
        pdf = pdf.sort_values(ts_col)
        ts_all = pdf[ts_col].astype("datetime64[us]").to_numpy().view(np.int64)
        out = {group_col: [], block_col: [], "n_points": [], "ts_blob": []}
        for c in value_cols:
            out[f"{c}_blob"] = []
        days = pdf[block_col].to_numpy()
        bounds = np.flatnonzero(np.r_[True, days[1:] != days[:-1], True])
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            out[group_col].append(pdf[group_col].iloc[lo])
            out[block_col].append(days[lo])
            out["n_points"].append(hi - lo)
            out["ts_blob"].append(deltadelta.encode(ts_all[lo:hi]))
            for c in value_cols:
                out[f"{c}_blob"].append(
                    gorilla.encode(
                        pdf[c].iloc[lo:hi].to_numpy(dtype=np.float64)
                    )
                )
        return pd.DataFrame(out)

    with_day = tier_df.withColumn(block_col, F.to_date(ts_col))
    # Python-CPU-bound group stage: pin the task count (see wavelet_ops)
    p = with_day.sparkSession.sparkContext.defaultParallelism * 2
    return (
        with_day.repartition(p, group_col)
        .groupBy(group_col)
        .applyInPandas(_enc, schema=schema)
    )


def decode_blocks(
    blocks: DataFrame,
    value_cols,
    group_col: str = "conv_id",
    ts_col: str = "bucket_ts",
    block_col: str = "day",
) -> DataFrame:
    """Expand blocks back to one row per point (exact inverse of
    :func:`encode_blocks` up to float64 bits)."""
    value_cols = list(value_cols)
    schema = f"{group_col} string, {ts_col} timestamp, " + ", ".join(
        f"{c} double" for c in value_cols
    )

    def _dec(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, r in pdf.iterrows():
            ts = deltadelta.decode(r["ts_blob"])
            data = {
                group_col: np.full(ts.size, r[group_col], dtype=object),
                ts_col: pd.to_datetime(ts, unit="us"),
            }
            for c in value_cols:
                data[c] = gorilla.decode(r[f"{c}_blob"])
            frames.append(pd.DataFrame(data))
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(columns=[group_col, ts_col, *value_cols])
        )

    return blocks.groupBy(group_col).applyInPandas(_dec, schema=schema)


def compression_report(blocks: DataFrame, value_cols) -> DataFrame:
    """Bytes per block vs raw 8-byte-per-point baseline — the measurable
    retention win."""
    value_cols = list(value_cols)
    n_streams = 1 + len(value_cols)
    blob_bytes = F.length("ts_blob")
    for c in value_cols:
        blob_bytes = blob_bytes + F.length(f"{c}_blob")
    return blocks.select(
        "conv_id",
        "day",
        "n_points",
        blob_bytes.alias("compressed_bytes"),
        (F.col("n_points") * 8 * n_streams).alias("raw_bytes"),
    )
