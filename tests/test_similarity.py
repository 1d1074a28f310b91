

def test_rrf_fuse_hand_computed(spark):
    from wavelet_decomposition_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "vec_id long, rank int"
    )
    b = spark.createDataFrame(
        [(20, 1), (40, 2)], "vec_id long, rank int"
    )
    out = {r.vec_id: r for r in rrf_fuse(a, b, k=10).collect()}
    assert set(out) == {10, 20, 30, 40}
    # doc 20 in both rankings: 1/62 + 1/61
    assert abs(out[20].rrf - (1 / 62 + 1 / 61)) < 1e-15
    assert out[20].rank_a == 2 and out[20].rank_b == 1
    # absent side contributes 0
    assert abs(out[10].rrf - 1 / 61) < 1e-15
    assert out[10].rank_b is None
    # both-rankings doc outranks any single-ranking doc here
    order = [r.vec_id for r in rrf_fuse(a, b, k=10).collect()]
    assert order[0] == 20


def test_rrf_fuse_ties_break_on_id_and_k_limits(spark):
    import pytest

    from wavelet_decomposition_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([(5, 1), (9, 2)], "vec_id long, rank int")
    b = spark.createDataFrame([(7, 1), (3, 2)], "vec_id long, rank int")
    # 5 and 7 tie exactly (both rank 1, single ranking); 3 and 9 tie too
    out = rrf_fuse(a, b, k=3).collect()
    assert [r.vec_id for r in out] == [5, 7, 3]
    with pytest.raises(ValueError):
        rrf_fuse(a, b, k=0)
