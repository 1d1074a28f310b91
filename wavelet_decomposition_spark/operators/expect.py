"""Declarative data-expectation checks — the ingest gate a 100-TB
pipeline runs before any tier is built (the Great-Expectations core,
engine-native): each rule is a boolean Column over a row; the checker
scans the table ONCE and returns one row per rule with violation counts
and pass rates.

Shape: every rule compiles into a conditional-sum expression inside a
single global aggregate — one scan, no per-rule jobs, no shuffle beyond
the final 1-row partial-merge. Rules therefore cost what one extra
projected column costs, so running 50 of them on ingest is cheap; the
alternative one-query-per-rule pattern scans the table R times.

The output is deliberately long-format (rule per row) so the violation
table itself can be stored as a tier, trended over time, and alerted on
with the engine's own anomaly operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_foreign_keys(
    fks: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table referential-integrity gate: for each
    ``(name, child, child_key, parent, parent_key)`` count child rows,
    NULL foreign keys, and ORPHANS (non-null keys with no parent row —
    SQL semantics: a NULL FK is unknown, not an orphan).

    Scale shape: each check projects the child to its single key column
    BEFORE the join (the scan reads one column), and the parent side is
    its deduplicated key only — a dimension's key set is small even
    when the dimension is wide, so Catalyst broadcasts it and the whole
    check is one map-side pass per child table (a fact-scale parent
    falls back to a shuffled join per AQE — the strategy stays per-FK).
    All three counts come from ONE left join + aggregate over a single
    child scan (r6: was a separate anti-join subtree per FK, doubling
    every child scan): the parent keys are distinct, so the join is
    row-preserving and "joined parent key IS NULL on a non-null child
    key" is exactly the anti-join's orphan set. Results union to one
    row per FK.
    """
    if not fks:
        raise ValueError("no foreign keys given")
    parts = []
    for name, child, child_key, parent, parent_key in fks:
        keys = child.select(F.col(child_key).alias("_k"))
        pkeys = (
            parent.select(F.col(parent_key).alias("_k"))
            .distinct()
            .withColumn("_hit", F.lit(True))
        )
        counts = keys.join(pkeys, "_k", "left").agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(
                F.when(F.col("_k").isNull(), 1).otherwise(0)
            ).alias("n_null_fk"),
            F.sum(
                F.when(
                    F.col("_k").isNotNull() & F.col("_hit").isNull(), 1
                ).otherwise(0)
            ).alias("n_orphans"),
        )
        parts.append(
            counts.select(
                F.lit(name).alias("fk"),
                "n_child",
                "n_null_fk",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("ok"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def check_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Evaluate ``rules`` (name -> boolean Column, true = row passes) in
    ONE scan. Null rule results count as violations (an expectation that
    cannot be evaluated did not pass — the conservative ingest-gate
    convention). Returns ``(rule, n_rows, n_violations, pass_rate)``
    sorted by rule name."""
    import re

    if not rules:
        raise ValueError("no rules given")
    # rule names are spliced into generated SQL (stack literals and
    # column refs): restrict to identifier charset rather than attempt
    # escaping — a clear error beats a parse error three layers down
    for name in rules:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(
                f"rule name {name!r} must match [A-Za-z_][A-Za-z0-9_]*"
            )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, 1).otherwise(0)
            ).alias(f"_v_{name}")
        )
    row = df.agg(*aggs)
    names = sorted(rules)
    stacked = row.selectExpr(
        "stack({}, {}) as (rule, n_rows, n_violations)".format(
            len(names),
            ", ".join(f"'{n}', _n, _v_{n}" for n in names),
        )
    )
    # empty input: pass_rate is vacuously 1.0 (0/0 would emit NaN, and
    # NaN comparisons silently fail every downstream alert predicate)
    return stacked.select(
        "rule",
        "n_rows",
        "n_violations",
        F.when(F.col("n_rows") == 0, F.lit(1.0))
        .otherwise(
            (F.col("n_rows") - F.col("n_violations")).cast("double")
            / F.col("n_rows")
        )
        .alias("pass_rate"),
    )
