"""Blocked inverted index (operators/invindex.py)."""

import pytest
from pyspark.sql import functions as F

from wavelet_decomposition_spark.operators.invindex import (
    inverted_index,
    tokenize,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tokenize_splits_and_drops_empties(spark):
    out = tokenize(
        _docs(spark, [(1, "A b, C!! b"), (2, "--x--")])
    ).collect()
    got = sorted((r.doc_id, r.term) for r in out)
    assert got == [(1, "a"), (1, "b"), (1, "b"), (1, "c"), (2, "x")]


def test_small_index_exact(spark):
    out = inverted_index(
        _docs(
            spark,
            [(3, "cat dog cat"), (7, "dog"), (10, "cat fish")],
        ),
        block_size=128,
    ).collect()
    by = {r.term: r for r in out}
    assert set(by) == {"cat", "dog", "fish"}
    # cat in docs 3,10 with tfs 2,1 -> gaps 3,7 (first gap from doc 0)
    assert (by["cat"].df, by["cat"].cf) == (2, 3)
    assert by["cat"].gaps == "3,7" and by["cat"].tfs == "2,1"
    assert by["cat"].first_doc == 3 and by["cat"].n_postings == 2
    # dog in docs 3,7 -> gaps 3,4
    assert by["dog"].gaps == "3,4" and by["dog"].tfs == "1,1"
    assert by["fish"].gaps == "10" and by["fish"].df == 1


def test_blocks_bound_row_size_and_roundtrip(spark):
    # one term in 10 docs with irregular id spacing, block_size 4
    ids = [2, 3, 5, 11, 12, 20, 31, 32, 40, 55]
    out = (
        inverted_index(
            _docs(spark, [(i, "w") for i in ids]), block_size=4
        )
        .orderBy("block_id")
        .collect()
    )
    assert [r.block_id for r in out] == [0, 1, 2]
    assert [r.n_postings for r in out] == [4, 4, 2]
    assert all(r.df == 10 and r.cf == 10 for r in out)
    # prefix-summing the concatenated gap stream reconstructs the ids
    gaps = [int(g) for r in out for g in r.gaps.split(",")]
    acc, rebuilt = 0, []
    for g in gaps:
        acc += g
        rebuilt.append(acc)
    assert rebuilt == ids
    # each block's absolute anchor is its first doc id
    assert [r.first_doc for r in out] == [2, 12, 40]


def test_bad_block_size_raises(spark):
    with pytest.raises(ValueError):
        inverted_index(_docs(spark, [(1, "a")]), block_size=0)


def test_df_cf_consistency_on_fixture(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = inverted_index(docs, block_size=16)
    # df equals the number of postings across the term's blocks; cf is
    # the sum of its tfs; every block but the last is exactly full
    chk = (
        idx.groupBy("term")
        .agg(
            F.min("df").alias("df"),
            F.min("cf").alias("cf"),
            F.sum("n_postings").alias("np"),
            F.sum(
                F.aggregate(
                    F.split("tfs", ","),
                    F.lit(0).cast("long"),
                    lambda a, x: a + x.cast("long"),
                )
            ).alias("tfsum"),
            F.max("block_id").alias("maxb"),
            F.sum(F.when(F.col("n_postings") == 16, 1).otherwise(0)).alias(
                "full"
            ),
        )
        .where(
            (F.col("df") != F.col("np"))
            | (F.col("cf") != F.col("tfsum"))
            | (F.col("full") < F.col("maxb"))
        )
    )
    assert chk.count() == 0


def _bm25_expected(corpus, query, k1=1.2, b=0.75):
    """Scalar Python recompute of bm25_topk's exact formula."""
    import math

    toks = {d: t.lower().split() for d, t in corpus}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(corpus)
    avgdl = sum(dl.values()) / n
    scores = {}
    for term in query:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log1p((n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if tf:
                scores[d] = scores.get(d, 0.0) + idf * (
                    tf * (k1 + 1.0)
                ) / (tf + k1 * (1.0 - b + b * dl[d] / avgdl))
    return scores


def test_bm25_scores_match_scalar_recompute(spark):
    from wavelet_decomposition_spark.operators.invindex import bm25_topk

    corpus = [
        (1, "cat dog"),
        (2, "cat cat mouse"),
        (3, "bird"),
        (4, "dog dog dog"),
    ]
    exp = _bm25_expected(corpus, ["cat", "bird"])
    out = bm25_topk(
        spark.createDataFrame(corpus, "doc_id long, text string"),
        ["cat", "bird"],
        k=10,
    ).collect()
    got = {r.doc_id: r.score for r in out}
    assert set(got) == set(exp)  # doc 4 has no query term
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-12
    # rare term (bird, df=1) outscores common term hits
    assert out[0].doc_id == 3


def test_bm25_k_limit_and_deterministic_ties(spark):
    from wavelet_decomposition_spark.operators.invindex import bm25_topk

    # 5 identical docs tie exactly -> doc_id ascending breaks the tie
    corpus = [(i, "same text here") for i in range(5)]
    out = bm25_topk(
        spark.createDataFrame(corpus, "doc_id long, text string"),
        ["same"],
        k=3,
    ).collect()
    assert [r.doc_id for r in out] == [0, 1, 2]


def test_bm25_empty_query_raises(spark):
    import pytest

    from wavelet_decomposition_spark.operators.invindex import bm25_topk

    with pytest.raises(ValueError):
        bm25_topk(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            [],
        )
