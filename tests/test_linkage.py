"""Pins for operators/linkage.py beyond oracle parity: the match set
against an independent Python levenshtein, and the clustering against
a true union-find transitive closure (the property fixed-round label
propagation must reproduce)."""

from __future__ import annotations

import pandas as pd

from steaminganalysis_spark.operators.linkage import ER_ROUNDS, LEV_MAX
from steaminganalysis_spark.registry import collect_queries

QUERIES, _ = collect_queries()
SF = "/root/testdata/sf0.001"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _expected_matches() -> tuple[dict[str, int], set[tuple[str, str]]]:
    parts = pd.read_parquet(f"{SF}/part.parquet")["p_name"]
    counts = parts.value_counts().to_dict()
    names = sorted(counts)
    pairs = set()
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if a.split()[1] == b.split()[1] and _lev(a, b) <= LEV_MAX:
                pairs.add((a, b))
    return counts, pairs


def test_blocked_pairs_match_python_levenshtein(spark):
    counts, expected = _expected_matches()
    rows = QUERIES["q_er_blocked_pairs"](spark, SF).collect()
    got = {(r.name_a, r.name_b) for r in rows}
    assert got == expected
    for r in rows:
        assert r.lev == _lev(r.name_a, r.name_b) <= LEV_MAX
        assert r.name_a.split()[1] == r.name_b.split()[1] == r.block
        assert r.n_parts_a == counts[r.name_a]
        assert r.n_parts_b == counts[r.name_b]


def test_clusters_equal_union_find_closure(spark):
    """Fixed-round HashMin must equal the true transitive closure on
    this graph (diameters are < ER_ROUNDS by construction), assign
    every distinct name (singletons included), and canonicalize each
    entity to its minimum member."""
    counts, pairs = _expected_matches()
    parent: dict[str, str] = {n: n for n in counts}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp: dict[str, list[str]] = {}
    for n in counts:
        comp.setdefault(find(n), []).append(n)
    expected = {
        n: (min(members), len(members))
        for members in comp.values()
        for n in members
    }
    rows = QUERIES["q_er_clusters"](spark, SF).collect()
    assert len(rows) == len(counts)
    for r in rows:
        entity, size = expected[r.p_name]
        assert (r.entity, r.entity_size) == (entity, size), r.p_name
        assert r.n_parts == counts[r.p_name]
    # the fixture actually exercises chaining: at least one entity has
    # ≥3 members (cold→old→red→new at lev ≤ 2)
    assert any(size >= 3 for _, size in expected.values())
    assert ER_ROUNDS >= max(size for _, size in expected.values())
