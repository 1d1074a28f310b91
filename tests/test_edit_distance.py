"""Prefix-blocked Levenshtein near-dup pairs (operators/dedup.py
edit_distance_pairs) vs a direct DP re-implementation."""

import pytest

from wavelet_decomposition_spark.operators.dedup import edit_distance_pairs

BASE = "the quick brown fox jumps over the lazy dog near the river bank"

DOCS = [
    (1, BASE),
    (2, BASE + " again"),                 # tail edit, dist 6
    (3, BASE[:-4] + "dock"),              # tail substitution
    (4, "a completely different document about spark partitioning"),
    (5, BASE.upper()),                    # normalizes identically to 1
    (6, "X" + BASE),                      # HEAD edit: leaves the block
    (7, "tiny"),                          # under the block prefix
]


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[j - 1] + 1,
                prev[j - 1] + (ca != cb),
            ))
        prev = cur
    return prev[-1]


def _norm(t):
    return " ".join(t.lower().split())


def _expected(max_dist=16, block_prefix=24):
    sides = [
        (i, _norm(t)) for i, t in DOCS if len(_norm(t)) >= block_prefix
    ]
    out = []
    for i, (ia, ta) in enumerate(sides):
        for ib, tb in sides[i + 1:]:
            a, b = (ia, ta), (ib, tb)
            if a[0] > b[0]:
                a, b = b, a
            if a[1][:block_prefix] != b[1][:block_prefix]:
                continue
            if abs(len(a[1]) - len(b[1])) > max_dist:
                continue
            d = _lev(a[1], b[1])
            if d <= max_dist:
                out.append((a[0], b[0], d, len(a[1]), len(b[1])))
    return sorted(out)


def test_pairs_match_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"], r["len_a"], r["len_b"])
        for r in edit_distance_pairs(df).collect()
    )
    want = _expected()
    assert got == want
    pairs = {(a, b): d for a, b, d, *_ in got}
    # case-only variant is an exact dup after normalization
    assert pairs[(1, 5)] == 0
    # tail-append distance is the append length
    assert pairs[(1, 2)] == 6
    # the recall contract: a head-edited copy leaves the prefix block
    assert not any(6 in (a, b) for a, b in pairs)
    # unrelated and too-short docs never pair
    assert not any(4 in (a, b) or 7 in (a, b) for a, b in pairs)


def test_length_guard_is_a_true_lower_bound():
    # |len(a) - len(b)| <= levenshtein(a, b): the pre-DP prune can
    # never drop a pair the distance filter would keep
    cases = [("abc", "a"), ("", "xyz"), ("kitten", "sitting"),
             ("aaaa", "aaaaaaaa")]
    for a, b in cases:
        assert abs(len(a) - len(b)) <= _lev(a, b)


def test_plan_is_hash_equi_join(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        edit_distance_pairs(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
