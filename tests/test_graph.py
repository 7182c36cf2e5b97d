"""Connected components vs a pure-Python union-find oracle.

Every structural test runs BOTH execution paths (r10): the gated
driver union-find (the fixture-scale fast path) and the iterative
small-star loop (the at-scale path, forced by zeroing the gate) — the
gate must never be the only thing standing between a broken iteration
and a green suite.
"""

from __future__ import annotations

import random

import pytest

from lookup_transform_spark.operators import graph
from lookup_transform_spark.operators.graph import connected_components, dedup_clusters


@pytest.fixture(params=["driver_uf", "iterative"])
def cc_path(request, monkeypatch):
    if request.param == "iterative":
        monkeypatch.setattr(graph, "_DRIVER_UNION_FIND_MAX_EDGES", -1)
    return request.param


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # canonical min-label per node
    return {n: find(n) for n in parent}


def test_components_match_union_find(spark, cc_path):
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    want = _uf_components(edges)
    # union-find roots are not necessarily min labels; normalize both
    def normalize(comp: dict[int, int]) -> dict[int, int]:
        groups: dict[int, list[int]] = {}
        for n, c in comp.items():
            groups.setdefault(c, []).append(n)
        return {n: min(g) for g in groups.values() for n in g}

    assert normalize(got) == normalize(want)


def test_components_chain_converges(spark, cc_path):
    # worst-case diameter: a path graph needs label propagation across
    # the whole chain — exercises the iteration/fixpoint logic
    n = 40
    df = spark.createDataFrame([(i, i + 1) for i in range(n)], "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_components_empty_edges_short_circuit(spark, cc_path):
    """r8 review: an empty edge set summed to NULL every iteration and
    `None == None` never tripped the fixpoint probe — 20 no-op rounds of
    checkpoints + collects for an input whose answer is known at round
    zero. Result must be an empty frame either way."""
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0


def test_dedup_clusters_canonical(spark, cc_path):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_id_a long, doc_id_b long"
    )
    out = {r.doc_id: (r.cluster_id, r.is_canonical) for r in dedup_clusters(pairs).collect()}
    assert out == {
        1: (1, True), 2: (1, False), 3: (1, False),
        10: (10, True), 11: (10, False),
    }
