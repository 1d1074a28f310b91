"""Deterministic sampling, split assignment, and domain mixing — the
"compose the training set" operators that sit downstream of dedup /
decontamination / quality scoring in an LLM data pipeline. The reference
engine has no sampling surface; these are engine-native additions.

Everything here is a pure map-side column expression — ZERO shuffles for
sampling and split assignment, one small aggregate for mix rates — and
deterministic by construction: membership depends only on (key, seed),
never on partitioning, executor count, or row order. That is the property
``DataFrame.sample`` does NOT give you (it is per-partition pseudo-random:
recompute the input with different parallelism and the sample changes),
and why hash-gating is the standard at scale — reruns, backfills, and
incremental loads all select the same rows.

Two hash families:

- ``method="xxhash64"`` (default): Spark's built-in 64-bit hash; best
  dispersion, JVM-side, the production path.
- ``method="lcg"``: a 31-bit linear congruential step on the key —
  expressible in ANY SQL dialect with plain BIGINT arithmetic (the
  driver's DuckDB oracle runs the identical formula), and overflow-safe
  under ANSI mode because the key is reduced mod 2^31 before the
  multiply. Dispersion is weaker than xxhash64 but unbiased across a
  uniform key space; use it when the gate, not throughput, matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from wavelet_decomposition_spark.operators.textstats import token_count

_LCG_A = 1103515245
_LCG_C = 12345
_MOD = 2_147_483_648  # 2^31


def hash_bucket(
    key, seed: int = 0, method: str = "xxhash64"
) -> Column:
    """Uniform double in [0, 1) as a pure function of (key, seed)."""
    key = F.col(key) if isinstance(key, str) else key
    if method == "xxhash64":
        h = F.xxhash64(key, F.lit(seed))
        return (F.pmod(h, F.lit(_MOD))) / F.lit(float(_MOD))
    if method == "lcg":
        k = F.pmod(key.cast("bigint") + F.lit(seed), F.lit(_MOD))
        return (
            F.pmod(k * F.lit(_LCG_A) + F.lit(_LCG_C), F.lit(_MOD))
            / F.lit(float(_MOD))
        )
    raise ValueError(f"unknown hash method {method!r}")


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    seed: int = 0,
    method: str = "xxhash64",
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(hash_bucket(key_col, seed, method) < F.lit(rate))


def assign_splits(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
    method: str = "xxhash64",
    out_col: str = "split",
) -> DataFrame:
    """Disjoint, exhaustive split labels (e.g. train/val/test 0.8/0.1/0.1)
    by hash-bucket thresholds. Weights must sum to 1 (±1e-9); every row
    gets exactly one label, and the assignment is stable under reruns,
    repartitioning, and incremental appends."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(key_col, seed, method)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = b < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def domain_mix(
    docs: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Per-source sampling rates that hit a token budget under target mix
    weights: rate(s) = min(1, budget * w(s) / tokens(s)). With
    ``weights=None`` the target mix is uniform over the observed sources.
    One small aggregate (n_sources rows); the rates are then applied with
    :func:`hash_sample` per source — still shuffle-free over the corpus.

    Undersupplied sources (rate capped at 1) deliver fewer tokens than
    their target share — ``expected_tokens`` makes the shortfall explicit
    rather than silently renormalizing."""
    per = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
    )
    if weights is None:
        w = 1.0 / F.count(F.lit(1)).over(Window.partitionBy())
    else:
        total = sum(weights.values())
        if abs(total - 1.0) > 1e-9:
            raise ValueError(f"mix weights must sum to 1, got {total}")
        mapping = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv]
        )
        w = mapping[F.col(source_col)]
    rate = F.least(
        F.lit(1.0), F.lit(float(budget_tokens)) * w / F.col("n_tokens")
    )
    return per.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(w, 6).alias("target_weight"),
        F.round(rate, 6).alias("sample_rate"),
        F.round(rate * F.col("n_tokens"), 2).alias("expected_tokens"),
    )
