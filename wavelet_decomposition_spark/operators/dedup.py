"""Deduplication for training-data pipelines — exact, n-gram Jaccard,
MinHash+LSH, SimHash, and embedding-cosine near-dup.

Design per scale tier:
- *exact*            — hash groupBy; one shuffle on the fingerprint.
- *n-gram Jaccard*   — exact pairwise similarity via shingle explode +
                       self-join; the verification oracle for MinHash. At
                       scale the join is bounded by LSH pre-bucketing.
- *MinHash + LSH*    — 64 permutations -> b bands x r rows; candidate pairs
                       only ever meet inside a band bucket (the 100 TB path:
                       the shuffle key is (band, band_hash), never all-pairs).
                       Signatures are array-expression built-ins — no Python.
- *SimHash*          — 64-bit sign fingerprint via vectorized numpy in
                       mapInPandas (bit-twiddling is not expressible as array
                       SQL without per-bit columns); near-dup = small hamming
                       distance, bucketed by 16-bit chunks (Charikar 2002).
- *embedding cosine* — random-hyperplane LSH buckets + in-bucket cosine.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import fingerprint, normalized

# deterministic MinHash permutation parameters: universal hashing over the
# Mersenne prime 2^31 - 1 (31-bit hash space keeps a*h+b < 2^62, inside
# int64 under ANSI arithmetic; per-permutation collision prob ~ n/2^31 is
# negligible for shingle sets)
_MERSENNE = (1 << 31) - 1


def _perm_params(n_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64)
    return a, b


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per identical (normalized) text."""
    w = Window.partitionBy("fp").orderBy(id_col)
    return (
        df.withColumn("fp", fingerprint(text_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fp")
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, n_dups, keeper_id) for groups with >1 member."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_dups") > 1)
    )


def word_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    words = F.split(normalized(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard-similar pairs (id_a < id_b, jaccard >= threshold)."""
    sh = word_shingles(df, text_col, id_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_perm: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<bigint>) — min over shingle hashes of (a*h+b) mod p,
    per permutation.

    Relational formulation: explode shingles once, broadcast the 64-row
    permutation dim, min-aggregate per (doc, perm) with map-side combine,
    reassemble the signature array ordered by perm_id. (A single projection
    with 64 nested array_min(transform(...)) expressions re-evaluates the
    shingle pipeline per permutation — two orders of magnitude slower.)"""
    a, b = _perm_params(n_perm, seed)
    spark = df.sparkSession
    perms = spark.createDataFrame(
        [(i, int(a[i]), int(b[i])) for i in range(n_perm)],
        "perm_id int, a long, b long",
    )
    hashed = word_shingles(df, text_col, id_col, n).select(
        "id", F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE)).alias("h")
    )
    mins = (
        hashed.crossJoin(F.broadcast(perms))
        .groupBy("id", "perm_id")
        .agg(
            F.min(
                F.pmod(F.col("h") * F.col("a") + F.col("b"), F.lit(_MERSENNE))
            ).alias("mh")
        )
    )
    return mins.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("perm_id", "mh"))),
            lambda x: x["mh"],
        ).alias("sig")
    )


def minhash_lsh_pairs(
    signatures: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate pairs from banded LSH over signatures: docs sharing any
    band bucket. Shuffle key = (band, band_hash): at scale no all-pairs join
    ever happens."""
    banded = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                F.slice(F.col("sig"), bnd * rows_per_band + 1, rows_per_band).cast(
                                    "array<string>"
                                ),
                            )
                        ).alias("bucket"),
                    )
                    for bnd in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_jaccard_estimate(signatures: DataFrame, pairs: DataFrame) -> DataFrame:
    """Estimated Jaccard = fraction of matching signature slots."""
    sa = signatures.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = signatures.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(
                    F.filter(
                        F.zip_with(
                            "sig_a", "sig_b", lambda x, y: (x == y).cast("int")
                        ),
                        lambda v: v == 1,
                    )
                )
                / F.size("sig_a")
            ).alias("jaccard_est"),
        )
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document (Charikar 2002): sum token-hash bit
    vectors (+1/-1), take signs. Vectorized numpy over Arrow batches."""

    def _simhash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            out = _np.zeros(len(pdf), dtype=_np.int64)
            texts = (
                pdf[text_col].fillna("").str.lower().str.replace(r"\s+", " ", regex=True)
            )
            token_lists = texts.str.split(" ")
            flat = []
            doc_of = []
            for i, toks in enumerate(token_lists):
                flat.extend(toks)
                doc_of.extend([i] * len(toks))
            if flat:
                harr = _np.array(
                    [hash_str(t) for t in flat], dtype=_np.uint64
                )
                doc_of = _np.asarray(doc_of)
                # accumulate per-bit counts: (docs x 64)
                bits = (
                    (harr[:, None] >> _np.arange(64, dtype=_np.uint64)[None, :])
                    & _np.uint64(1)
                ).astype(_np.int64) * 2 - 1
                acc = _np.zeros((len(pdf), 64), dtype=_np.int64)
                _np.add.at(acc, doc_of, bits)
                sh = (acc > 0).astype(_np.uint64)
                out = (
                    (sh << _np.arange(64, dtype=_np.uint64)[None, :]).sum(axis=1)
                ).astype(_np.int64)
            yield pd.DataFrame({"id": ids, "simhash": out})

    def hash_str(s: str) -> int:
        # FNV-1a 64-bit: deterministic across workers (unlike builtin hash)
        h = 0xCBF29CE484222325
        for ch in s.encode("utf-8"):
            h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    return df.select(id_col, text_col).mapInPandas(
        _simhash_batch, schema="id long, simhash long"
    )


def simhash_near_pairs(sh: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup candidates: identical 16-bit chunk buckets (any of 4), then
    exact hamming filter via bit_count(xor)."""
    chunks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("cb"),
    ).select("id", "simhash", "cb.chunk", "cb.bucket")
    a = chunks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "bucket"
    )
    b = chunks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "bucket"
    )
    return (
        a.join(b, ["chunk", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# Embedding cosine near-dup
# --------------------------------------------------------------------------

def _cosine(a, b) -> F.Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Cosine >= threshold pairs via random-hyperplane LSH buckets
    (sign sketch); candidates only meet within a bucket. Exact cosine
    verification in-bucket. High-threshold near-dups collide with high
    probability on all n_planes signs."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    vec = F.col(vec_col).cast("array<double>")
    bucket_bits = [
        (
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(w)) for w in planes[p]]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0
        ).cast("int") * (1 << p)
        for p in range(n_planes)
    ]
    bucketed = emb.select(
        F.col(id_col).alias("id"),
        vec.alias("v"),
        sum(bucket_bits[1:], bucket_bits[0]).alias("bucket"),
    )
    a = bucketed.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "bucket")
    b = bucketed.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _cosine(F.col("v_a"), F.col("v_b")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
