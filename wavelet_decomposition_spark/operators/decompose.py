"""A1/A4 — the flagship operator: per-(series, year) damped-LSQR wavelet
decomposition against a broadcast sparse dictionary, emitting a long-format
coefficient table.

Reference: the year loop at /root/reference/wavelet_decomposition.py:232-250
(one ``lsqr(A_year, signal_slice)`` per year) and the sheet reshape at
:260-298. Here every (series_id, year) group is one Spark task: the
dictionaries (~4.5 MB CSR per year) and the flat->(scale,pos) mapping are
broadcast once; the solve runs as sequential numpy inside an Arrow pandas
UDF (deterministic — a solve is never split across partitions), and the
reshape is a vectorized gather, so the group's 23,360 input rows map to
23,423 coefficient rows with no per-row Python.

Scale note: groups are fixed-size (points_per_year rows) so groupBy skew is
bounded by design; parallelism = #series x #years, embarrassingly parallel
on a large cluster. The only wide dependency is the single exchange on
(series_id, year).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernel import wavelets as wl
from ..kernel.lsqr import beta_decomposition
from ..kernel.sparse import CSRMatrix

BETA_SCHEMA = (
    "series_id string, year int, scale_idx int, pos int, beta double"
)


def broadcast_dictionaries(
    spark: SparkSession,
    shape: str,
    translations_by_year: dict[int, list[int]],
    vy: int = wl.VY,
    vw: int = wl.VW,
    vd: int = wl.VD,
    dpy: int = wl.DPY,
    dpd: int = wl.NDPD,
):
    """Generate one CSR dictionary per year on the driver (<1 s/year,
    CSR-direct — the reference's dense path needs 4.38 GB) and broadcast the
    raw arrays plus the scale map. Returns the broadcast handle."""
    payload = {}
    for year, trans in translations_by_year.items():
        A = wl.generate_dictionary(shape, trans, vy, vw, vd, dpy, dpd)
        payload[int(year)] = (A.data, A.indices, A.indptr, A.shape)
    scale_idx, pos = wl.flat_to_scale_pos(vy, vw, vd, dpy)
    return spark.sparkContext.broadcast(
        {"matrices": payload, "scale_idx": scale_idx, "pos": pos}
    )


def decompose(
    df: DataFrame,
    bc,
    damp: float = 0.001,
    solve_partitions: int | None = 0,
) -> DataFrame:
    """(series_id, year, idx, value) -> (series_id, year, scale_idx, pos, beta).

    ``bc`` is the broadcast from :func:`broadcast_dictionaries`.

    ``solve_partitions`` pins the solve stage's shuffle width: a solve
    group is ~700 KB of rows but ~2 s of CPU (700 LSQR iterations), a
    byte-to-compute ratio AQE cannot see — with the session's 8 MB
    advisory size, AQE's partition coalescing packed the full E1's 21
    solves into THREE tasks (4/4/6 groups each, serialized: measured 11.7 s
    for a wave that runs in ~2.5 s when spread). An explicit
    ``repartition(n, keys)`` is exempt from AQE coalescing
    (REPARTITION_BY_NUM shuffle origin) and the groupBy reuses its hash
    partitioning, so no second exchange appears. Default 0 = auto:
    ``defaultParallelism * 8`` — scales with the CLUSTER, not the data
    (birthday-collision-free for the reference's O(cores) group counts;
    for corpora with millions of groups each partition simply carries many
    groups, which is the normal compute-dense shuffle shape). Pass None to
    keep the plain groupBy exchange."""

    def _solve(pdf: pd.DataFrame) -> pd.DataFrame:
        state = bc.value
        year = int(pdf["year"].iloc[0])
        data, indices, indptr, shape = state["matrices"][year]
        A = CSRMatrix(data, indices, indptr, shape)
        pdf = pdf.sort_values("idx")
        signal = pdf["value"].to_numpy(dtype=np.float64)
        if signal.size != A.shape[0]:
            raise ValueError(
                f"group ({pdf['series_id'].iloc[0]}, {year}) has "
                f"{signal.size} points, dictionary expects {A.shape[0]}"
            )
        beta = beta_decomposition(A, signal, damp=damp)
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"].iloc[0],
                "year": year,
                "scale_idx": state["scale_idx"],
                "pos": state["pos"],
                "beta": beta,
            }
        )

    if solve_partitions == 0:
        solve_partitions = df.sparkSession.sparkContext.defaultParallelism * 8
    if solve_partitions:
        df = df.repartition(int(solve_partitions), "series_id", "year")
    return df.groupBy("series_id", "year").applyInPandas(
        _solve, schema=BETA_SCHEMA
    )


def reconstruct(
    betas: DataFrame,
    bc,
    keep_scales=None,
    add_offset: bool = True,
) -> DataFrame:
    """A8 — inverse transform: signal[t] = (A @ beta_natural)[t], optionally
    band-passed to ``keep_scales`` and with the offset dropped
    (wavelet_decomposition.py:385-434). Per-group vectorized matvec against
    the broadcast CSR. Returns (series_id, year, idx, value)."""
    scales = set(int(s) for s in keep_scales) if keep_scales is not None else None

    def _recon(pdf: pd.DataFrame) -> pd.DataFrame:
        state = bc.value
        year = int(pdf["year"].iloc[0])
        data, indices, indptr, shape = state["matrices"][year]
        A = CSRMatrix(data, indices, indptr, shape)
        flat = np.zeros(shape[1], dtype=np.float64)
        scale_idx = pdf["scale_idx"].to_numpy()
        keep = np.ones(len(pdf), dtype=bool)
        if scales is not None:
            keep &= np.isin(scale_idx, list(scales))
        if not add_offset:
            keep &= scale_idx != 15
        # invert the sheet mapping: position in natural flat order
        sel = pdf[keep]
        lut_scale = state["scale_idx"]
        lut_pos = state["pos"]
        # build (scale_idx, pos) -> flat index lookup once per group
        key_lut = lut_scale.astype(np.int64) * 100000 + lut_pos
        order = np.argsort(key_lut)
        want = sel["scale_idx"].to_numpy().astype(np.int64) * 100000 + sel[
            "pos"
        ].to_numpy()
        flat_idx = order[np.searchsorted(key_lut[order], want)]
        flat[flat_idx] = sel["beta"].to_numpy(dtype=np.float64)
        signal = A.matvec(flat)
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"].iloc[0],
                "year": year,
                "idx": np.arange(signal.size, dtype=np.int32),
                "value": signal,
            }
        )

    return betas.groupBy("series_id", "year").applyInPandas(
        _recon, schema="series_id string, year int, idx int, value double"
    )


def support_table(spark: SparkSession, bc, years=None) -> DataFrame:
    """J3 — the wavelet dictionary as a long relational table
    ``(year, scale_idx, pos, idx, weight)``: one row per CSR nonzero
    (~373k/year, a few MB — broadcast-able). Built driver-side from the
    same broadcast payload the UDF path uses, so both reconstruction forms
    share one dictionary source of truth."""
    state = bc.value
    lut_scale, lut_pos = state["scale_idx"], state["pos"]
    frames = []
    for year, (data, indices, indptr, shape) in state["matrices"].items():
        if years is not None and int(year) not in set(int(y) for y in years):
            continue
        frames.append(
            pd.DataFrame(
                {
                    "year": np.int32(year),
                    "scale_idx": lut_scale[indices],
                    "pos": lut_pos[indices],
                    "idx": np.repeat(
                        np.arange(shape[0], dtype=np.int32), np.diff(indptr)
                    ),
                    "weight": data,
                }
            )
        )
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


def reconstruct_relational(
    betas: DataFrame,
    support: DataFrame,
    keep_scales=None,
    add_offset: bool = True,
) -> DataFrame:
    """A8 in its relational form (SURVEY.md J3): ``signal[idx] =
    sum(beta * weight)`` as a broadcast equi-join on (year, scale_idx, pos)
    + hash aggregation on (series_id, year, idx) — no Python at all.

    Equivalent to :func:`reconstruct` (float64 tolerance — summation order
    differs; pinned by tests/test_decompose_spark.py). Prefer this form when
    betas already live in a table and only a band-passed slice is needed:
    the scale filter prunes the join input, whereas the UDF form always
    ships whole coefficient groups. Reference: the np.dot at
    /root/reference/wavelet_decomposition.py:427.

    Relational semantics caveat: grid positions whose band-passed support is
    empty produce NO row (the matvec form emits explicit zeros there). With
    the offset or any year-family scale kept, every position is covered."""
    b = betas
    sup = support
    if keep_scales is not None:
        sel = [int(s) for s in keep_scales]
        b = b.filter(F.col("scale_idx").isin(sel))
        sup = sup.filter(F.col("scale_idx").isin(sel))
    if not add_offset:
        b = b.filter(F.col("scale_idx") != 15)
    return (
        b.join(F.broadcast(sup), ["year", "scale_idx", "pos"])
        .groupBy("series_id", "year", "idx")
        .agg(F.sum(F.col("beta") * F.col("weight")).alias("value"))
    )
