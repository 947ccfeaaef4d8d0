"""HITS hubs/authorities: exact integer replay vs a pure-Python
fixed-point reference, partitioning invariance, ranking sanity on a
hub-and-spoke graph, and argument validation."""

from __future__ import annotations

import pytest

from kgspark.ops.graph_algs import hits

# directory pages h1/h2 point at content pages c1..c3; c1 is cited by both
# hubs AND x (strictly top authority), plus a back-link from c1
EDGES = [
    ("h1", "c1"), ("h1", "c2"), ("h1", "c3"),
    ("h2", "c1"), ("h2", "c2"),
    ("c1", "h1"),
    ("x", "c1"),
]


def _reference_hits(edges, iters, scale):
    """Bit-for-bit integer replay: same L-infinity fixed-point scheme."""
    nodes = sorted({x for e in edges for x in e})
    a = {v: scale for v in nodes}
    h = {v: scale for v in nodes}
    for _ in range(iters):
        araw = {v: 0 for v in nodes}
        for s, t in edges:
            araw[t] += h[s]
        am = max(araw.values())
        a = {v: (araw[v] * scale) // am for v in nodes}
        hraw = {v: 0 for v in nodes}
        for s, t in edges:
            hraw[s] += a[t]
        hm = max(hraw.values())
        h = {v: (hraw[v] * scale) // hm for v in nodes}
    return a, h


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def test_matches_integer_reference_exactly(spark, edges_df):
    scale = 10**6
    rows = hits(edges_df, max_iter=4, scale=scale).collect()
    want_a, want_h = _reference_hits(EDGES, iters=4, scale=scale)
    got_a = {r["name"]: r["auth_units"] for r in rows}
    got_h = {r["name"]: r["hub_units"] for r in rows}
    assert got_a == want_a
    assert got_h == want_h


def test_ranking_sanity(spark, edges_df):
    rows = {r["name"]: r for r in hits(edges_df, max_iter=4).collect()}
    auths = {n: r["auth_units"] for n, r in rows.items()}
    hubs = {n: r["hub_units"] for n, r in rows.items()}
    # c1 is pointed at by both strong hubs: top authority, exactly scale
    assert max(auths, key=auths.get) == "c1"
    assert auths["c1"] == 10**6
    # h1 points at all three authorities: top hub
    assert max(hubs, key=hubs.get) == "h1"
    assert hubs["h1"] == 10**6
    # x has no in-edges: zero authority
    assert auths["x"] == 0


def test_partitioning_invariant(spark, edges_df):
    a = sorted(map(tuple, hits(edges_df.repartition(1), max_iter=3).collect()))
    b = sorted(map(tuple, hits(edges_df.repartition(7), max_iter=3).collect()))
    assert a == b


def test_validation(spark, edges_df):
    with pytest.raises(ValueError, match="max_iter"):
        hits(edges_df, max_iter=0)
    with pytest.raises(ValueError, match="scale"):
        hits(edges_df, scale=1)
    empty = edges_df.filter("src = 'nope'")
    with pytest.raises(ValueError, match="at least one edge"):
        hits(empty)
    with pytest.raises(ValueError, match="overflow"):
        hits(edges_df, scale=2**31)
