"""Deterministically scale the driver's sf tables by an integer factor K —
the input for the sf1.0 robustness bench (BENCH.md): the same headline
queries, 10x the rows, proving the sf0.1 walls and plan shapes are not
fixture-sized artifacts.

Everything derives from the driver-provided parquet (no hand-rolled
distributions): replica i of each fact table is the original with its keys
shifted by i * (max_key + 1), so per-key cardinalities — rows per user,
lines per order, docs per fingerprint group — are PRESERVED and the scaled
workload stresses the same code paths with K-times the volume instead of
K-times-deeper hot keys.

Semantics-preserving perturbations where an identical copy would change the
workload CLASS, not just its size:
- documents.text gets a per-replica suffix token (" xreplica<i>"), else
  every doc acquires K-1 exact copies and the near-dup candidate sets grow
  quadratically (K^2) instead of linearly (K) — a different problem than
  "10x the corpus".
- embeddings are circularly rotated by i positions (norm-preserving; a
  rotation of a random-ish vector is near-orthogonal to the original), so
  cosine near-dup structure replicates within each replica instead of
  collapsing into K-fold identical-vector cliques.
- TPC-H: custkey and orderkey shift consistently across customer, orders
  and lineitem (FK integrity); partkey/suppkey are left untouched (the
  benched queries never join part/supplier facts, and dimension reuse is
  exactly what real scale-up looks like); region/nation/part/supplier and
  the reference-series tables are dimensions and copy through unchanged.

Usage: python tools/make_scaled_sf.py [src_sf_dir] [out_dir] [K]
       defaults: /root/testdata/sf0.1 /tmp/sf1.0 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _shift(df: DataFrame, col: str, i: int, span: int) -> DataFrame:
    return df.withColumn(col, (F.col(col) + F.lit(i * span)).cast("bigint"))


def _replicate(df: DataFrame, k: int, build) -> DataFrame:
    out = build(df, 0)
    for i in range(1, k):
        out = out.unionByName(build(df, i))
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from wavelet_decomposition_spark.plans.session import build_session

    spark = build_session(app_name="wds-make-scaled-sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    def rd(t: str) -> DataFrame:
        return spark.read.parquet(f"{src}/{t}.parquet")

    def wr(df: DataFrame, t: str, parts: int) -> None:
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: {spark.read.parquet(f'{out}/{t}.parquet').count()} rows")

    # key spans from the source (one tiny agg each; driver-side scalars)
    ev = rd("events")
    u_span = ev.agg(F.max("user_id")).collect()[0][0] + 1
    e_span = ev.agg(F.max("event_id")).collect()[0][0] + 1
    wr(
        _replicate(
            ev, k,
            lambda d, i: _shift(_shift(d, "user_id", i, u_span),
                                "event_id", i, e_span),
        ),
        "events", 8 * k,
    )

    docs = rd("documents")
    d_span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    wr(
        _replicate(
            docs, k,
            lambda d, i: _shift(d, "doc_id", i, d_span).withColumn(
                "text",
                F.col("text") if i == 0
                else F.concat(F.col("text"), F.lit(f" xreplica{i}")),
            ),
        ),
        "documents", 4 * k,
    )

    emb = rd("embeddings")
    v_span = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").first()[0])

    def rot(d: DataFrame, i: int) -> DataFrame:
        d = _shift(d, "vec_id", i, v_span)
        if i == 0:
            return d
        j = i % dim
        return d.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", j + 1, dim - j),
                F.slice("embedding", 1, j),
            ),
        )

    wr(_replicate(emb, k, rot), "embeddings", 4 * k)

    cust = rd("customer")
    c_span = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    orders = rd("orders")
    o_span = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    wr(_replicate(cust, k, lambda d, i: _shift(d, "c_custkey", i, c_span)),
       "customer", 2 * k)
    wr(
        _replicate(
            orders, k,
            lambda d, i: _shift(_shift(d, "o_orderkey", i, o_span),
                                "o_custkey", i, c_span),
        ),
        "orders", 4 * k,
    )
    wr(
        _replicate(
            rd("lineitem"), k,
            lambda d, i: _shift(d, "l_orderkey", i, o_span),
        ),
        "lineitem", 8 * k,
    )

    for t in ("region", "nation", "part", "supplier"):
        wr(rd(t), t, 1)

    spark.stop()


if __name__ == "__main__":
    main()
