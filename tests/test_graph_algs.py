"""PageRank: float mode vs a pure-Python reference, mass conservation,
integer-mode determinism under partitioning, and int-vs-float agreement."""

from __future__ import annotations

import pytest

from kgspark.ops.graph_algs import pagerank

# a small graph with branching, a cycle, and a dangling node (d)
EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"), ("e", "c"),
]


def _reference_pagerank(edges, damping=0.85, iters=50):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {v: [] for v in nodes}
    for s, t in edges:
        out[s].append(t)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if not out[v])
        new = {v: (1 - damping) / n + damping * dangling / n for v in nodes}
        for s, ts in out.items():
            for t in ts:
                new[t] += damping * r[s] / len(ts)
        r = new
    return r


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def test_float_matches_reference(spark, edges_df):
    got = {r["name"]: r["rank"] for r in pagerank(edges_df, max_iter=50, tol=None).collect()}
    want = _reference_pagerank(EDGES)
    assert got.keys() == want.keys()
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_integer_mode_matches_float(spark, edges_df):
    scale = 10**12
    g_int = {r["name"]: r["rank_units"] / scale
             for r in pagerank(edges_df, max_iter=20, scale=scale).collect()}
    g_flt = {r["name"]: r["rank"]
             for r in pagerank(edges_df, max_iter=20, tol=None).collect()}
    for v in g_flt:
        assert abs(g_int[v] - g_flt[v]) < 1e-6, v  # truncation ~ n/scale


def test_integer_mode_partitioning_invariant(spark, edges_df):
    scale = 10**12
    a = sorted((r["name"], r["rank_units"])
               for r in pagerank(edges_df.repartition(1), max_iter=5, scale=scale).collect())
    b = sorted((r["name"], r["rank_units"])
               for r in pagerank(edges_df.repartition(7), max_iter=5, scale=scale).collect())
    assert a == b  # bit-identical: all integer ops, no float summation order


def test_triangle_count_known_graph(spark):
    """Hand-countable graph: K4 on {1,2,3,4} (4 triangles, 3 per node) plus
    a pendant node 5 (0 triangles) and a disconnected edge 6-7; duplicate /
    reversed / self-loop inputs collapse under canonicalization."""
    from kgspark.ops.graph_algs import triangle_count

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (4, 5),          # pendant
        (6, 7),          # triangle-free component
        (2, 1),          # reversed duplicate
        (3, 3),          # self-loop (dropped)
        (1, 2),          # exact duplicate
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0, 7: 0}

    # skewed star + one closing edge: hub degree >> others, exactly 1 triangle
    star = [(0, i) for i in range(1, 60)] + [(1, 2)]
    sdf = spark.createDataFrame(star, "src long, dst long")
    s = {r["node"]: r["triangles"] for r in triangle_count(sdf).collect()}
    assert s[0] == 1 and s[1] == 1 and s[2] == 1
    assert sum(s.values()) == 3
