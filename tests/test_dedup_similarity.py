import numpy as np
import pytest
from pyspark.sql import functions as F

from wavelet_decomposition_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # inject exact dups and near-dups deterministically
    dup = base.limit(20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    near = base.limit(20).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xyzzy")).alias("text"),
        "lang", "source", "n_chars",
    )
    return base.unionByName(dup).unionByName(near).cache()


def test_exact_dedup(spark, docs):
    n = docs.count()
    deduped = dedup.exact_dedup(docs)
    assert deduped.count() == n - 20
    groups = dedup.exact_dup_groups(docs)
    assert groups.count() == 20
    assert groups.filter(F.col("n_dups") != 2).count() == 0
    # keeper is always the original (lowest id)
    assert groups.filter(F.col("keeper_id") >= 100000).count() == 0


def test_ngram_jaccard_finds_near_dups(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8).toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    # exact dups have jaccard 1.0
    for i in range(20):
        assert (i, i + 100000) in found
    # all reported pairs respect the threshold
    assert (pairs.jaccard >= 0.8).all()


def test_minhash_lsh_recall_vs_exact(spark, docs):
    sigs = dedup.minhash_signatures(docs).cache()
    cand = dedup.minhash_lsh_pairs(sigs)
    est = dedup.minhash_jaccard_estimate(sigs, cand).filter(
        F.col("jaccard_est") >= 0.7
    )
    got = set(map(tuple, est.select("id_a", "id_b").toPandas().to_numpy()))
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.9).toPandas()
    want = set(zip(exact.id_a, exact.id_b))
    assert want, "fixture should contain high-jaccard pairs"
    recall = len(want & got) / len(want)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_bounded_jaccard_matches_exact(spark, docs):
    """The LSH-candidate-bounded scale path must reproduce the exact
    self-join's pairs AND values at the operating threshold (0.8): LSH only
    affects recall, and 16x4 banding recall at j>=0.8 is ~1 - (1-0.8^4)^16
    ~ 0.9996 — any miss on this tiny fixture is a bug, not noise."""
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.8).toPandas()
    bounded = dedup.ngram_jaccard_pairs_bounded(docs, threshold=0.8).toPandas()
    want = {(a, b): round(j, 9) for a, b, j in exact.itertuples(index=False)}
    got = {(a, b): round(j, 9) for a, b, j in bounded.itertuples(index=False)}
    assert want, "fixture should contain high-jaccard pairs"
    assert got == want


def test_bounded_jaccard_auto_banding_low_threshold(spark, docs):
    """The banding is derived from the threshold (round-2 advisory: a fixed
    16x4 banding has ~0.2% candidate recall at j=0.1, silently dropping most
    low-similarity pairs). At threshold 0.1 _auto_banding picks 64x1
    (per-pair recall ~0.9988); precision stays exact."""
    assert dedup._auto_banding(0.1, 64) == (64, 1)
    assert dedup._auto_banding(0.5, 64) == (32, 2)
    assert dedup._auto_banding(0.8, 64) == (16, 4)
    exact = dedup.ngram_jaccard_pairs(docs, threshold=0.1).toPandas()
    bounded = dedup.ngram_jaccard_pairs_bounded(docs, threshold=0.1).toPandas()
    want = set(zip(exact.id_a, exact.id_b))
    got = set(zip(bounded.id_a, bounded.id_b))
    assert want, "fixture should contain j>=0.1 pairs"
    assert got <= want, "bounded reported a pair the exact join rejects"
    recall = len(want & got) / len(want)
    assert recall >= 0.95, f"auto-banded recall too low: {recall}"


def test_auto_banding_recall_property():
    """Property sweep (round-3 verdict #8): for every threshold in (0,1)
    and n_perm in {16, 64, 128}, the derived (bands, rows) must (a) tile
    the signature exactly, (b) meet the 0.95 candidate-recall target at the
    requested threshold — unless NO banding can, in which case the most
    permissive one (n_perm x 1) is returned — and (c) be the MAXIMAL
    rows-per-band meeting the target (hardest candidate pruning, i.e. the
    cheapest verification join, among all valid bandings)."""
    target = 0.95

    def recall(t, b, r):
        return 1.0 - (1.0 - t**r) ** b

    for n_perm in (16, 64, 128):
        for t in np.linspace(0.02, 0.98, 49):
            t = float(t)
            b, r = dedup._auto_banding(t, n_perm)
            assert b * r == n_perm
            if recall(t, b, r) < target:
                # impossible target: must have fallen back to max recall
                assert (b, r) == (n_perm, 1)
                continue
            for r2 in range(r + 1, n_perm + 1):
                if n_perm % r2 == 0:
                    assert recall(t, n_perm // r2, r2) < target, (
                        f"t={t} n_perm={n_perm}: rows={r2} also meets the "
                        f"target but rows={r} was returned"
                    )


def test_simhash_near_pairs(spark, docs):
    sh = dedup.simhash(docs).cache()
    assert sh.count() == docs.count()
    pairs = dedup.simhash_near_pairs(sh, max_hamming=3).toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    # exact dups have identical simhash (hamming 0)
    hits = sum((i, i + 100000) in found for i in range(20))
    assert hits == 20


def test_embedding_near_dup(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # plant a near-duplicate of vec 0
    v0 = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    noisy = [float(x) + 1e-4 for x in v0]
    extra = spark.createDataFrame(
        [(990001, noisy, 0)], "vec_id long, embedding array<float>, label int"
    )
    pairs = dedup.embedding_near_dup_pairs(
        emb.unionByName(extra), threshold=0.999
    ).toPandas()
    assert ((pairs.id_a == 0) & (pairs.id_b == 990001)).any()


def test_brute_force_topk_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = similarity.brute_force_topk(emb, queries, k=5).toPandas()
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    mnorm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in topk["query_id"].unique():
        qv = mnorm[ids == qid][0]
        scores = mnorm @ qv
        order = np.lexsort((ids, -scores))[:5]
        want = list(ids[order])
        got = list(
            topk[topk.query_id == qid].sort_values("rank")["vec_id"]
        )
        assert got == want


def test_lsh_topk_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.brute_force_topk(emb, queries, k=5).toPandas()
    # uniform random embeddings are LSH's worst case (neighbors barely
    # correlate with buckets) — use wide buckets to test the mechanism
    approx = similarity.lsh_topk(emb, queries, k=5, n_planes=2).toPandas()
    total, hit = 0, 0
    for qid in exact["query_id"].unique():
        want = set(exact[exact.query_id == qid]["vec_id"])
        got = set(approx[approx.query_id == qid]["vec_id"])
        total += len(want)
        hit += len(want & got)
    assert hit / total >= 0.6, f"recall {hit}/{total}"
    # the query vector itself always lands in its own probe set
    assert (approx[approx["rank"] == 1]["score"] > 0.999).all()


def test_ivf_topk_full_probe_equals_brute_force(spark):
    """Probing every cell removes the approximation entirely: IVF with
    n_probe == n_cells must reproduce brute force EXACTLY (each corpus row
    lives in exactly one cell, so the union of all probes is one full scan)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    queries = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = (
        similarity.brute_force_topk(emb, queries, k=5)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    full = (
        similarity.ivf_topk(emb, queries, k=5, n_cells=8, n_probe=8)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert list(full["vec_id"]) == list(exact["vec_id"])
    np.testing.assert_allclose(full["score"], exact["score"], rtol=1e-12)


def test_ivf_topk_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.brute_force_topk(emb, queries, k=5).toPandas()
    approx = similarity.ivf_topk(
        emb, queries, k=5, n_cells=8, n_probe=4
    ).toPandas()
    total, hit = 0, 0
    for qid in exact["query_id"].unique():
        want = set(exact[exact.query_id == qid]["vec_id"])
        got = set(approx[approx.query_id == qid]["vec_id"])
        total += len(want)
        hit += len(want & got)
    assert hit / total >= 0.6, f"recall {hit}/{total}"
    # a query's own vector lands in its top probe cell
    assert (approx[approx["rank"] == 1]["score"] > 0.999).all()


def test_auto_banding_recall_guarantee_property():
    """VERDICT r3 #8 hardening: for every threshold in (0,1) and n_perm in
    {16, 64, 128}, the chosen banding must (a) tile the signature exactly,
    (b) meet the S-curve recall target AT the threshold, and (c) be the
    hardest-pruning (largest rows-per-band) divisor that does — any
    harder banding must fall below target."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wavelet_decomposition_spark.operators import dedup

    @settings(max_examples=300, deadline=None)
    @given(
        t=st.floats(min_value=0.01, max_value=0.99),
        n_perm=st.sampled_from([16, 64, 128]),
    )
    def check(t, n_perm):
        b, r = dedup._auto_banding(t, n_perm)
        assert b * r == n_perm
        recall = 1.0 - (1.0 - t**r) ** b
        if r > 1:
            assert recall >= 0.95
            # maximality: no harder (larger-r) divisor also meets target
            for r2 in range(r + 1, n_perm + 1):
                if n_perm % r2:
                    continue
                b2 = n_perm // r2
                assert 1.0 - (1.0 - t**r2) ** b2 < 0.95
        else:
            # r == 1 is the fallback: every band is a single hash — recall
            # is the best achievable for this n_perm even if below target
            pass

    check()


def test_cosine_allpairs_exact_matches_numpy_and_never_collects(spark, monkeypatch):
    """The exact all-pairs GEMM oracle must (a) agree with a numpy brute
    force, (b) run with NO driver-side collect anywhere in its lineage —
    through round 4 it toPandas()'d one full side, which dies at 10^8+
    rows before any tile runs. toPandas is poisoned for the whole build +
    execute; tiles stream executor-side from scratch parquet."""
    from pyspark.sql import DataFrame

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pdf = emb.select("vec_id", "embedding").toPandas()  # test-side oracle only

    def _poisoned(self, *a, **k):
        raise AssertionError("driver-side toPandas() in operator lineage")

    monkeypatch.setattr(DataFrame, "toPandas", _poisoned)
    got = (
        similarity.cosine_allpairs_exact(emb, threshold=0.8, tile_rows=40)
        .collect()
    )
    monkeypatch.undo()
    ids = pdf["vec_id"].to_numpy()
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    S = M @ M.T
    ia, ib = np.nonzero(S >= 0.8)
    want = {
        (int(ids[a]), int(ids[b]))
        for a, b in zip(ia, ib)
        if ids[a] < ids[b]
    }
    have = {(r.id_a, r.id_b) for r in got}
    assert have == want
    for r in got:
        a = int(np.nonzero(ids == r.id_a)[0][0])
        b = int(np.nonzero(ids == r.id_b)[0][0])
        assert abs(r.cosine - S[a, b]) < 1e-12


def test_cosine_allpairs_exact_empty_input(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").where(F.lit(False))
    out = similarity.cosine_allpairs_exact(emb, threshold=0.5)
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "cosine"]


def test_spread_non_file_backed_fallback(spark):
    """Pin the last `.rdd` touch in the repo (r5 VERDICT #7): a NON-file-
    backed input (zero inputFiles) falls back to the plan's actual
    partition count — an already-well-partitioned frame is returned
    untouched, an under-split one is repartitioned to the floor."""
    target = spark.sparkContext.defaultParallelism * 2

    wide = spark.range(100).repartition(target + 4)
    assert wide.inputFiles() == []
    assert dedup._spread(wide) is wide  # respected, no extra shuffle

    narrow = spark.range(100).coalesce(1)
    assert narrow.inputFiles() == []
    out = dedup._spread(narrow)
    assert out is not narrow
    assert out.rdd.getNumPartitions() == target

    # file-backed single-split fixture still hits the repartition floor
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert 0 < len(docs.inputFiles()) < target
    assert dedup._spread(docs).rdd.getNumPartitions() == target
