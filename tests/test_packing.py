"""chunk_documents + pack_sequences (training-data prep operators):
boundary exactness vs a Python reference, packing contract, determinism
under repartitioning, and edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wavelet_decomposition_spark.operators.sampling import pack_sequences
from wavelet_decomposition_spark.operators.textclean import chunk_documents

SF = "/root/testdata/sf0.001"


def test_chunks_match_python_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = chunk_documents(docs, chunk_len=400, stride=350).toPandas()
    pdf = docs.select("doc_id", "text").toPandas()
    want = []
    for _, r in pdf.iterrows():
        t = r["text"]
        for i, s in enumerate(range(0, max(len(t), 1), 350)):
            if s >= len(t):
                break
            want.append((r["doc_id"], i, s, t[s : s + 400]))
    want_df = (
        pd.DataFrame(want, columns=["doc_id", "chunk_idx", "chunk_start",
                                    "chunk_text"])
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    got = got.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert len(got) == len(want_df)
    assert (got["chunk_text"] == want_df["chunk_text"]).all()
    assert (got["chunk_start"] == want_df["chunk_start"]).all()


def test_chunks_cover_every_char_and_overlap(spark):
    df = spark.createDataFrame(
        [(1, "a" * 1000), (2, "b" * 350), (3, "c"), (4, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_len=400, stride=350).toPandas()
    # doc 1: starts 0,350,700 — last chunk short (300 chars)
    d1 = out[out.doc_id == 1].sort_values("chunk_idx")
    assert list(d1["chunk_start"]) == [0, 350, 700]
    assert [len(t) for t in d1["chunk_text"]] == [400, 400, 300]
    # exact-stride doc: one chunk; single char: one chunk; empty: none
    assert len(out[out.doc_id == 2]) == 1
    assert len(out[out.doc_id == 3]) == 1
    assert len(out[out.doc_id == 4]) == 0
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_len=100, stride=200)


def _packing_frame(spark, seed=3, n=400):
    rng = np.random.RandomState(seed)
    toks = rng.randint(5, 200, size=n)
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                      "n_tok": toks}),
        "doc_id long, n_tok int",
    )


def test_packing_contract(spark):
    df = _packing_frame(spark)
    out = pack_sequences(df, budget=256, token_col="n_tok", n_parts=8)
    pdf = out.toPandas()
    # every doc exactly once, tokens conserved
    assert sorted(pdf["doc_id"]) == list(range(400))
    assert pdf["n_tokens"].sum() == df.agg(F.sum("n_tok")).collect()[0][0]
    # every bin within budget (no oversize docs in this fixture)
    assert (pdf.groupby("bin_id")["n_tokens"].sum() <= 256).all()
    # FFD actually packs: way fewer bins than docs
    ideal = int(np.ceil(pdf["n_tokens"].sum() / 256))
    assert pdf["bin_id"].nunique() <= 1.5 * ideal + 8  # <=1 partial bin/group


def test_packing_deterministic_under_partitioning(spark):
    df = _packing_frame(spark, seed=11)
    a = pack_sequences(df.repartition(1), budget=256, token_col="n_tok",
                       n_parts=8).toPandas()
    b = pack_sequences(df.repartition(17), budget=256, token_col="n_tok",
                       n_parts=8).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["bin_id"] == b["bin_id"]).all()


def test_oversize_doc_sits_alone_untruncated(spark):
    df = spark.createDataFrame(
        [(1, 1000), (2, 10), (3, 20)], "doc_id long, n_tok int"
    )
    pdf = pack_sequences(df, budget=256, token_col="n_tok",
                         n_parts=1).toPandas()
    big_bin = pdf[pdf.doc_id == 1]["bin_id"].iloc[0]
    assert (pdf["bin_id"] == big_bin).sum() == 1  # alone
    assert pdf[pdf.doc_id == 1]["n_tokens"].iloc[0] == 1000  # untruncated
