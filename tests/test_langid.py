"""Trigram language ID (operators/langid.py): held-out accuracy bound,
degenerate inputs, determinism, and the Spark Arrow-kernel path."""

import numpy as np
import pandas as pd
import pytest

from wavelet_decomposition_spark.operators import langid


def test_held_out_accuracy_bound():
    # the driver query gates >= 0.9; the suite pins the measured headroom
    rows = langid.held_out_fixture()
    out = langid.classify_texts(pd.Series([t for _, _, t in rows]))
    truth = np.array([lang for _, lang, _ in rows])
    acc = (out["lang"].to_numpy() == truth).mean()
    assert acc >= 0.9
    assert len(rows) == 5 * len(langid.LANGS)


def test_seed_sentences_self_classify():
    rows = [(lang, s) for lang in langid.LANGS for s in langid._SEEDS[lang]]
    out = langid.classify_texts(pd.Series([s for _, s in rows]))
    assert (out["lang"].to_numpy() == [lang for lang, _ in rows]).all()


def test_degenerate_inputs():
    out = langid.classify_texts(pd.Series(["", None, "ab", "   "]))
    # no trigrams at all -> 'und' with zero margin (normalization pads one
    # space each side, so a 2-letter token still yields trigrams — only
    # truly empty inputs are undetermined)
    assert out.loc[0, "lang"] == "und" and out.loc[0, "margin"] == 0.0
    assert out.loc[1, "lang"] == "und"
    assert out.loc[3, "lang"] == "und"
    empty = langid.classify_texts(pd.Series([], dtype=object))
    assert len(empty) == 0


def test_batch_invariance_and_determinism():
    # classification must not depend on batch composition (the kernel
    # shares one buffer across the batch) nor on repetition
    texts = [t for _, _, t in langid.held_out_fixture()[:10]]
    joint = langid.classify_texts(pd.Series(texts))
    solo = pd.concat(
        [langid.classify_texts(pd.Series([t])) for t in texts],
        ignore_index=True,
    )
    assert (joint["lang"] == solo["lang"]).all()
    assert np.allclose(joint["margin"], solo["margin"])


def test_margin_is_per_trigram_and_positive_on_clear_text():
    out = langid.classify_texts(
        pd.Series(["The quick brown fox jumps over the lazy dog near the river bank."])
    )
    assert out.loc[0, "lang"] == "en"
    assert 0 < out.loc[0, "margin"] < 5  # normalized per trigram


def test_spark_operator(spark):
    rows = langid.held_out_fixture()
    df = spark.createDataFrame(
        rows, "row_id int, true_lang string, text string"
    )
    got = (
        langid.lang_id_ngram(df, id_col="row_id")
        .join(df.select("row_id", "true_lang"), "row_id")
        .toPandas()
    )
    acc = (got["lang"] == got["true_lang"]).mean()
    assert acc >= 0.9
    # map-side only: no exchange in the plan
    plan = langid.lang_id_ngram(df, id_col="row_id")._jdf.queryExecution()
    assert "Exchange" not in plan.executedPlan().toString()
