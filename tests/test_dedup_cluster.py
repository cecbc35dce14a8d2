"""Connected-components clustering: equivalence with a union-find
oracle on arbitrary graphs, and the pointer-jumping convergence bound
that makes the iteration O(log n) rounds (not O(diameter))."""

from __future__ import annotations

import random

import pytest

from medallion_etl_spark.operators.dedup_cluster import connected_components


def _uf_components(n_nodes: int, pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id label per component, only for nodes that appear in an edge
    touched = {x for p in pairs for x in p}
    comp: dict[int, list[int]] = {}
    for x in touched:
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for r, members in comp.items() for x in members}


def _edges_df(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_components_match_union_find_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 60
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = {
        r["node"]: r["label"]
        for r in connected_components(_edges_df(spark, pairs)).collect()
    }
    assert got == _uf_components(n, pairs)


def test_chain_graph_converges_in_log_rounds(spark):
    """A 64-node path is the adversarial case for plain min-propagation
    (64 rounds); pointer jumping must close it in O(log n) — the bound
    the 100 TB story leans on for long accidental chains."""
    pairs = [(i, i + 1) for i in range(63)]
    labels = connected_components(_edges_df(spark, pairs), max_rounds=10)
    rows = labels.collect()
    assert len(rows) == 64
    assert {r["label"] for r in rows} == {0}


def test_empty_edges_yield_empty_labels(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0
