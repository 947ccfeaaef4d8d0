"""scc: brute-force mutual-reachability replay, classic structures
(cycle, two cycles + bridge, DAG singletons, bowtie), round-cap raise,
partitioning invariance, validation."""

from __future__ import annotations

import pytest

from kgspark.ops.graph_algs import scc


def _python_scc(edges):
    e = {(str(a), str(b)) for a, b in edges if a != b}
    nodes = {a for a, _ in e} | {b for _, b in e}
    adj: dict[str, set[str]] = {n: set() for n in nodes}
    for a, b in e:
        adj[a].add(b)
    reach = {}
    for n in nodes:
        seen, stack = set(), [n]
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        reach[n] = seen
    out = {}
    for n in nodes:
        comp = {w for w in reach[n] if n in reach[w]} | {n}
        out[n] = min(comp)
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["scc_id"] for r in scc(df, **kw).withColumnRenamed("name", "node").collect()}


CASES = [
    # simple 3-cycle plus a tail
    [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
    # two cycles joined by a one-way bridge: stay separate SCCs
    [("a", "b"), ("b", "a"), ("b", "x"), ("x", "y"), ("y", "x")],
    # pure DAG: all singletons
    [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
    # bowtie: in-tails -> core cycle -> out-tails
    [("i1", "c1"), ("i2", "c1"), ("c1", "c2"), ("c2", "c3"), ("c3", "c1"),
     ("c2", "o1"), ("o1", "o2")],
    # self-loop and duplicate edges
    [("a", "a"), ("a", "b"), ("a", "b"), ("b", "a")],
]


@pytest.mark.parametrize("edges", CASES)
def test_matches_bruteforce(spark, edges):
    assert _run(spark, edges) == _python_scc(edges)


def test_decreasing_chain_peels_across_rounds(spark):
    # worst case for the coloring algorithm when colors follow raw ids;
    # md5-permuted colors make it just a few rounds — still must be exact
    chain = [(f"n{i+1}", f"n{i}") for i in range(9)]
    assert _run(spark, chain, max_rounds=10) == _python_scc(chain)


def test_round_cap_raises_not_partial(spark):
    chain = [(f"n{i+1}", f"n{i}") for i in range(9)]
    with pytest.raises(RuntimeError, match="unresolved after max_rounds"):
        _run(spark, chain, max_rounds=1)


def test_partitioning_invariance(spark):
    edges = CASES[1] + CASES[3]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(scc(df).collect())
    b = sorted(scc(df.repartition(7)).collect())
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="max_rounds"):
        scc(df, max_rounds=0)
    with pytest.raises(ValueError, match="max_prop_iter"):
        scc(df, max_prop_iter=0)
