"""Matrix profile: the blocked-GEMM kernel must match a brute-force
per-pair reference, find planted motifs/discords, and follow the
flat-window conventions."""

import numpy as np
import pandas as pd
import pytest

from wavelet_decomposition_spark.operators import motif


def _brute(x, m):
    """O(p^2 m) literal reference: z-normalize each window pairwise."""
    n = len(x)
    p = n - m + 1
    excl = int(np.ceil(m / 2))
    def z(w):
        sd = w.std()
        return np.zeros(m) if sd == 0 else (w - w.mean()) / sd
    mp = np.full(p, np.inf)
    nn = np.full(p, -1)
    for i in range(p):
        zi = x[i:i + m]
        flat_i = zi.std() == 0
        for j in range(p):
            if abs(i - j) < excl:
                continue
            zj = x[j:j + m]
            flat_j = zj.std() == 0
            if flat_i and flat_j:
                d = 0.0
            elif flat_i or flat_j:
                d = np.sqrt(2.0 * m)
            else:
                d = np.sqrt(max(0.0, 2 * (m - z(zi) @ z(zj))))
            if d < mp[i]:
                mp[i], nn[i] = d, j
    return mp, nn


def test_kernel_matches_bruteforce():
    rng = np.random.default_rng(3)
    x = rng.normal(size=120)
    x[40:48] = 5.0  # a flat (zero-variance) stretch
    mp, nn = motif._profile_one(x, m=8)
    bmp, bnn = _brute(x, 8)
    assert np.allclose(mp, bmp, atol=1e-8)
    # nn may differ only on exact ties; distances must agree rowwise
    for i, (j, bj) in enumerate(zip(nn, bnn)):
        assert abs(mp[i] - bmp[i]) <= 1e-8, i


def test_planted_motif_and_discord():
    rng = np.random.default_rng(11)
    m = 24
    day = 10.0 + 3.0 * np.sin(np.arange(m) * 2 * np.pi / m)
    x = np.tile(day, 20) + 0.05 * rng.normal(size=20 * m)
    seg = rng.normal(size=m) * 2 + 30  # an uncommon shape
    x[72:96] = seg
    x[336:360] = seg  # identical plant -> motif dist exactly 0
    x[240:264] = np.linspace(0, 80, m)  # unique ramp -> discord
    mp, nn = motif._profile_one(x, m)
    motif_i = int(np.argmin(mp))
    assert {motif_i, int(nn[motif_i])} == {72, 336}
    assert mp[motif_i] <= 1e-9
    discord_i = int(np.argmax(mp))
    assert 240 - (m - 1) <= discord_i <= 263


def test_spark_profile_and_topk(spark):
    rng = np.random.default_rng(5)
    frames = []
    for sid in ("a", "b"):
        n = 96
        ts = pd.date_range("2026-02-01", periods=n, freq="1h")
        frames.append(pd.DataFrame({
            "series_id": sid, "bucket_ts": ts,
            "v": rng.normal(size=n),
        }))
    df = spark.createDataFrame(pd.concat(frames))
    prof = motif.matrix_profile(df, m=12)
    pdf = prof.toPandas().sort_values(["series_id", "idx"])
    for sid, g in pdf.groupby("series_id"):
        x = (
            df.filter(f"series_id = '{sid}'").orderBy("bucket_ts")
            .toPandas()["v"].to_numpy()
        )
        bmp, _ = _brute(x, 12)
        assert np.allclose(g["mp_dist"].to_numpy(), bmp, atol=1e-8)
    top = motif.top_motif_discord(prof).toPandas()
    assert len(top) == 4  # 2 series x (motif, discord)
    for sid, g in top.groupby("series_id"):
        sub = pdf[pdf.series_id == sid]
        km = g[g.kind == "motif"].iloc[0]
        kd = g[g.kind == "discord"].iloc[0]
        assert km.mp_dist == sub.mp_dist.min()
        assert kd.mp_dist == sub.mp_dist.max()
