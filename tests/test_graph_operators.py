"""Unit tests for operators/graph.py connected_components: the pointer
jumping (hash-to-min) upgrade that makes round count O(log diameter).

The load-bearing case is the deep chain: pure min-label propagation
moves the min one hop per round — a 600-node path needs 600 rounds and
used to RuntimeError at max_iter=20. With the L(u) <- L(L(u)) shortcut
the chain collapses in O(log 600) ~ 10 rounds. Long near-dup chains
(each doc similar to the next, ends dissimilar) are exactly what
boilerplate drift produces at crawl scale, so this is a correctness
fix for realistic 100 TB graphs, not a micro-optimization.
"""

from __future__ import annotations

from makerdao_dw_spark.operators.graph import connected_components


def _cc(spark, edges, max_iter=20):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = connected_components(df, max_iter=max_iter).collect()
    return {r["node"]: r["component"] for r in got}


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min node of the set
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, v if v < r else r)
    return {v: min(find(v), comp[find(v)]) for v in range(n_nodes)}


def test_deep_chain_converges_in_default_iterations(spark):
    """600-node path graph (diameter 600 >> max_iter=20): pointer
    jumping must converge it — this exact input raised RuntimeError
    under pure min-label propagation."""
    n = 600
    labels = _cc(spark, [(i, i + 1) for i in range(n - 1)])
    assert len(labels) == n
    assert set(labels.values()) == {0}


def test_matches_union_find_on_random_graph(spark):
    """Fixed-seed random sparse graph vs a driver-side union-find."""
    import random

    rng = random.Random(42)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    labels = _cc(spark, edges)
    expect = _union_find(n, edges)
    # isolated nodes are absent from the operator's result by contract
    touched = {v for e in edges for v in e}
    assert labels == {v: expect[v] for v in touched}


def test_two_cliques_and_bridge(spark):
    """Near-clique clusters (the LSH shape) plus one bridge edge merge
    into a single component labeled by the global min."""
    k1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k2 = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    labels = _cc(spark, k1 + k2 + [(4, 10)])
    assert set(labels.values()) == {0}


def test_empty_edges(spark):
    got = _cc(spark, [])
    assert got == {}
