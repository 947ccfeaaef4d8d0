"""Property-based checks for the late-round-3 operators (k-core, landmark
BFS, label propagation, TransE scoring).

Same independent-oracle discipline as tests/test_r03_ops_fuzz.py:
Hypothesis generates random graphs / embeddings; each Spark operator must
equal a direct brute-force Python replay of its contract, hitting the
degenerate corners (empty graphs, self-loops, disconnected pieces, ties)
the example tests can't enumerate.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ITER_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_st = st.lists(
    st.tuples(st.integers(0, 10), st.integers(0, 10)), min_size=1, max_size=30
)


@ITER_SLOW
@given(edges=edges_st, k=st.integers(1, 3))
def test_kcore_matches_bruteforce(spark, edges, k):
    from kgspark.ops.graph_algs import kcore

    iters = 4
    e = {tuple(sorted(t)) for t in edges if t[0] != t[1]}
    for _ in range(iters):
        deg = Counter([a for a, _ in e] + [b for _, b in e])
        keep = {n for n, d in deg.items() if d >= k}
        e = {(a, b) for a, b in e if a in keep and b in keep}
    expected = Counter([a for a, _ in e] + [b for _, b in e])

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["degree"]
        for r in kcore(df, k=k, max_iter=iters, until_stable=False).collect()
    }
    assert got == dict(expected)


@ITER_SLOW
@given(edges=edges_st, hops=st.integers(1, 3))
def test_landmark_distances_match_bfs(spark, edges, hops):
    from kgspark.ops.graph_algs import landmark_distances

    und = {tuple(t) for t in edges if t[0] != t[1]}
    und |= {(b, a) for a, b in und}
    nodes = sorted({n for e in und for n in e})
    landmarks = nodes[:2]
    expected = {}
    for lm in landmarks:
        dist = {lm: 0}
        frontier = [lm]
        for d in range(1, hops + 1):
            nxt = []
            for u in frontier:
                for a, b in und:
                    if a == u and b not in dist:
                        dist[b] = d
                        nxt.append(b)
            frontier = nxt
        for n, d in dist.items():
            expected[(lm, n)] = d

    df = spark.createDataFrame(edges, "src long, dst long")
    lm_df = spark.createDataFrame([(x,) for x in landmarks], "landmark long")
    got = {
        (r["landmark"], r["node"]): r["dist"]
        for r in landmark_distances(df, lm_df, max_hops=hops).collect()
    }
    assert got == expected


@ITER_SLOW
@given(edges=edges_st, rounds=st.integers(1, 3))
def test_label_propagation_matches_bruteforce(spark, edges, rounds):
    from kgspark.ops.graph_algs import label_propagation

    e = {tuple(t) for t in edges if t[0] != t[1]}
    und = e | {(b, a) for a, b in e}
    nodes = sorted({n for t in und for n in t})
    labels = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            counts = Counter(labels[v] for u, v in und if u == n)
            if not counts:
                new[n] = labels[n]
                continue
            best = max(counts.values())
            new[n] = min(lbl for lbl, c in counts.items() if c == best)
        labels = new

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, max_iter=rounds).collect()
    }
    assert got == labels


vec_st = st.lists(st.integers(-500_000, 500_000), min_size=3, max_size=3)


@ITER_SLOW
@given(es=vec_st, rr=vec_st, eo=vec_st)
def test_transe_score_matches_integer_replication(spark, es, rr, eo):
    from kgspark.ops.transe import transe_score

    scale = 1_000_000
    expected = sum(((a + b - c) ** 2) // scale for a, b, c in zip(es, rr, eo))

    ent = spark.createDataFrame(
        [("s", es), ("o", eo)], "id string, vec array<bigint>"
    )
    rel = spark.createDataFrame([("r", rr)], "id string, vec array<bigint>")
    t = spark.createDataFrame(
        [("s", "r", "o")], "src_id string, rel string, dst_id string"
    )
    (row,) = transe_score(t, ent, rel, scale=scale).collect()
    assert row.score_units == expected
