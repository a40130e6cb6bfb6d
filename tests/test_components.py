"""Connected components (large-star/small-star) — convergence in
O(log n) rounds, exact labels vs a local union-find, loud failure on an
exhausted round budget."""

from __future__ import annotations

import numpy as np
import pytest

from modape_spark.operators.components import (
    ConvergenceError,
    connected_components,
)


def _labels(spark, edge_list, **kw):
    df = spark.createDataFrame(edge_list, "u string, v string")
    got = connected_components(df, **kw).collect()
    return {r["node"]: r["label"] for r in got}


def _union_find(edge_list):
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_long_chain_converges_logarithmically(spark):
    """A 100-node chain has diameter 99: plain propagation needs ~99
    rounds; the star algorithm must finish well inside a 12-round budget
    (2 + confirmation at check_every=2 leaves ~5 effective doublings,
    far more than log2(100) needs)."""
    chain = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(99)]
    labels = _labels(spark, chain, max_rounds=12)
    assert set(labels.values()) == {"n000"}
    assert len(labels) == 100


def test_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(7)
    edges = [(f"x{a:02d}", f"x{b:02d}")
             for a, b in rng.integers(0, 80, size=(200, 2)) if a != b]
    labels = _labels(spark, edges)
    assert labels == _union_find(edges)


def test_unconverged_budget_raises(spark):
    chain = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(60)]
    df = spark.createDataFrame(chain, "u string, v string")
    with pytest.raises(ConvergenceError):
        connected_components(df, max_rounds=1, check_every=1)


def test_empty_edges(spark):
    df = spark.createDataFrame([], "u string, v string")
    # vacuous fixpoint: empty edge set is already converged
    with pytest.raises(ConvergenceError):
        # an empty graph still needs the signature to stabilize; it does
        # on the first check, so a sane budget must NOT raise — guard the
        # guard: budget 0 raises, normal budget returns empty labels
        connected_components(df, max_rounds=0)
    labels = connected_components(df).collect()
    assert labels == []


def test_two_components_and_self_loops(spark):
    edges = [("a", "b"), ("b", "c"), ("d", "e"), ("e", "e"), ("c", "a")]
    labels = _labels(spark, edges)
    assert labels == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}
