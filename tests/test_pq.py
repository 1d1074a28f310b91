"""Product quantization: codebook determinism, encode parity vs a numpy
reference, decode dual-path equality, ADC score parity, and two-stage
refine recall on clustered data."""

import numpy as np
import pytest


def _clustered(n=400, dim=32, n_clusters=8, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 3.0
    labels = rng.integers(0, n_clusters, size=n)
    X = centers[labels] + rng.normal(size=(n, dim)) * 0.4
    return X


def _emb_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def fixture(spark):
    X = _clustered()
    return X, _emb_df(spark, X)


def test_codebooks_shape_and_determinism(spark, fixture):
    from wavelet_decomposition_spark.operators.pq import train_pq_codebooks

    X, df = fixture
    b1 = train_pq_codebooks(df, m=4, k=16, train_sample=256, seed=3)
    b2 = train_pq_codebooks(
        df.repartition(7), m=4, k=16, train_sample=256, seed=3
    )
    assert b1.shape == (4, 16, 8)
    assert np.array_equal(b1, b2)  # partitioning-independent training


def test_dim_must_divide(spark):
    from wavelet_decomposition_spark.operators.pq import train_pq_codebooks

    df = _emb_df(spark, np.ones((8, 30)))
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(df, m=4, k=4, train_sample=8)


def test_encode_matches_numpy_reference(spark, fixture):
    from wavelet_decomposition_spark.operators.pq import (
        pq_encode,
        train_pq_codebooks,
    )

    X, df = fixture
    books = train_pq_codebooks(df, m=4, k=16, train_sample=256)
    got = {
        r.vec_id: (list(r.codes), r.qerr_micro)
        for r in pq_encode(df, books).collect()
    }
    m, k, dsub = books.shape
    for i in range(0, len(X), 37):
        err = 0.0
        for j in range(m):
            s = X[i, j * dsub:(j + 1) * dsub]
            d = ((s - books[j]) ** 2).sum(axis=1)
            c = int(np.argmin(d))
            assert got[i][0][j] == c
            err += d[c]
        assert got[i][1] == int(np.floor(err * 1e6))


def test_encode_deterministic_under_repartition(spark, fixture):
    from wavelet_decomposition_spark.operators.pq import (
        pq_encode,
        train_pq_codebooks,
    )

    X, df = fixture
    books = train_pq_codebooks(df, m=8, k=8, train_sample=256)
    a = {r.vec_id: tuple(r.codes) for r in pq_encode(df, books).collect()}
    b = {
        r.vec_id: tuple(r.codes)
        for r in pq_encode(df.repartition(11), books).collect()
    }
    assert a == b


def test_decode_dual_path_equality(spark, fixture):
    from wavelet_decomposition_spark.operators.pq import (
        pq_decode_errors,
        pq_encode,
        train_pq_codebooks,
    )

    X, df = fixture
    books = train_pq_codebooks(df, m=4, k=16, train_sample=256)
    codes = pq_encode(df, books)
    chk = pq_decode_errors(df, codes, books).collect()
    assert len(chk) == len(X)
    # floor-micro of the same float arithmetic: allow 1 ulp-of-micro slack
    assert all(
        abs(r.qerr_micro - r.qerr_decode_micro) <= 1 for r in chk
    )


def test_adc_scores_match_numpy(spark, fixture):
    from wavelet_decomposition_spark.operators.pq import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    X, df = fixture
    books = train_pq_codebooks(df, m=4, k=16, train_sample=256)
    codes = pq_encode(df, books).cache()
    q = _emb_df(spark, X[:3]).withColumnRenamed("vec_id", "query_id")
    out = pq_topk(codes, books, q, k=5)
    rows = out.collect()
    m, k_, dsub = books.shape
    # reference ADC for query 0
    lut = np.stack(
        [
            ((X[0, j * dsub:(j + 1) * dsub] - books[j]) ** 2).sum(axis=1)
            for j in range(m)
        ]
    )
    all_codes = {
        r.vec_id: list(r.codes) for r in codes.collect()
    }
    ref = {
        vid: sum(lut[j, c] for j, c in enumerate(cs))
        for vid, cs in all_codes.items()
    }
    got0 = [r for r in rows if r.query_id == 0]
    assert len(got0) == 5
    ref_order = sorted(ref, key=lambda v: (ref[v], v))[:5]
    assert [r.vec_id for r in sorted(got0, key=lambda r: r.rank)] == ref_order
    for r in got0:
        assert abs(r.adist - ref[r.vec_id]) < 1e-9


def test_refined_recall_beats_bound_and_self_hit(spark, fixture):
    from wavelet_decomposition_spark.operators.pq import (
        l2_brute_topk,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    X, df = fixture
    books = train_pq_codebooks(df, m=4, k=16, train_sample=256)
    codes = pq_encode(df, books).cache()
    qX = X[::40]
    q = spark.createDataFrame(
        [(i * 40, [float(v) for v in row]) for i, row in enumerate(qX)],
        "query_id long, embedding array<double>",
    )
    exact = l2_brute_topk(df, q, k=10)
    approx = pq_topk(codes, books, q, k=10, shortlist=50, corpus=df)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, recall
    # queries drawn from the corpus: exact re-rank must place self at rank 1
    top1 = {
        r.query_id: r.vec_id
        for r in approx.collect()
        if r.rank == 1
    }
    assert all(top1[qid] == qid for qid in top1)


def test_compression_ratio_structural(spark, fixture):
    from wavelet_decomposition_spark.operators.pq import (
        pq_encode,
        train_pq_codebooks,
    )

    X, df = fixture
    books = train_pq_codebooks(df, m=4, k=16, train_sample=128)
    row = pq_encode(df, books).first()
    # 32 float32 dims -> 4 single-byte codes = 32:1 payload compression
    assert len(row.codes) == 4
    assert max(row.codes) < 16  # fits 4 bits; stored as int for Arrow
