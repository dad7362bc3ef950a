from __future__ import annotations

from itertools import combinations

import numpy as np

from tits_spark.operators.triangles import triangle_counts


def _sym(spark, pairs):
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long")


def test_triangle_known_graph(spark):
    # K4 on {0..3} plus a pendant 4-0: every K4 node is in 3 triangles
    pairs = list(combinations(range(4), 2)) + [(0, 4)]
    out = {r.key: r for r in triangle_counts(_sym(spark, pairs)).collect()}
    assert out[0].degree == 4 and out[0].n_tri == 3
    for v in (1, 2, 3):
        assert out[v].degree == 3 and out[v].n_tri == 3
        assert out[v].clustering_u6 == 1_000_000  # fully connected nbhd
    assert out[4].degree == 1 and out[4].n_tri == 0 and out[4].clustering_u6 == 0
    # node 0: 3 triangles of C(4,2)=6 possible wedges -> cc = 0.5
    assert out[0].clustering_u6 == 500_000


def test_triangle_matches_bruteforce_on_random_graph(spark):
    rng = np.random.default_rng(5)
    nodes = 30
    pairs = sorted(
        {
            (int(min(p)), int(max(p)))
            for p in rng.integers(0, nodes, size=(120, 2))
            if p[0] != p[1]
        }
    )
    adj = {n: set() for n in range(nodes)}
    for a, b in pairs:
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    expect = {
        n: sum(1 for x, y in combinations(sorted(adj[n]), 2) if y in adj[x])
        for n in range(nodes)
        if adj[n]
    }
    out = {r.key: r for r in triangle_counts(_sym(spark, pairs)).collect()}
    assert set(out) == set(expect)
    for n, t in expect.items():
        assert out[n].n_tri == t, n
        assert out[n].degree == len(adj[n])


def test_chain_edges_bounded_degree(spark, events):
    from tits_spark.operators.triangles import chain_edges

    edges = chain_edges(events, links=3)
    deg = edges.groupBy("src").count().collect()
    assert all(r["count"] >= 1 for r in deg)
    # symmetric: every (a,b) has its (b,a)
    pairs = {(r.src, r.dst) for r in edges.collect()}
    assert all((b, a) in pairs for a, b in pairs)
    assert all(a != b for a, b in pairs)
