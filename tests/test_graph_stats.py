"""graph_stats: exact Python replay, reciprocity bounds, zero-variance
convention, self-loop/duplicate exclusion, partitioning invariance."""

from __future__ import annotations

import math

import pytest

from kgspark.ops.graph_algs import graph_stats


def _python_stats(edges):
    e = {(str(a), str(b)) for a, b in edges if a != b}
    nodes = {a for a, _ in e} | {b for _, b in e}
    recip = sum(1 for a, b in e if (b, a) in e)
    od: dict[str, int] = {}
    idg: dict[str, int] = {}
    for a, b in e:
        od[a] = od.get(a, 0) + 1
        idg[b] = idg.get(b, 0) + 1
    m = len(e)
    sx = sum(od[a] for a, _ in e)
    sy = sum(idg[b] for _, b in e)
    sxy = sum(od[a] * idg[b] for a, b in e)
    sxx = sum(od[a] ** 2 for a, _ in e)
    syy = sum(idg[b] ** 2 for _, b in e)
    vx, vy = m * sxx - sx * sx, m * syy - sy * sy
    assort = (
        0.0
        if vx == 0 or vy == 0
        else round((m * sxy - sx * sy) / math.sqrt(float(vx) * float(vy)), 6)
    )
    return (len(nodes), m, recip, (10**6 * recip) // m, assort)


EDGES = [
    ("a", "b"), ("b", "a"),          # reciprocal pair
    ("a", "c"), ("c", "d"), ("d", "b"),
    ("a", "a"),                      # self-loop: excluded
    ("a", "b"),                      # duplicate: excluded
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_matches_python_replay(spark, edges_df):
    row = graph_stats(edges_df).collect()[0]
    assert (
        row["n_nodes"], row["n_edges"], row["n_reciprocal"],
        row["reciprocity_ppm"], row["assortativity"],
    ) == _python_stats(EDGES)


def test_reciprocity_bounds(spark):
    dag = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    assert graph_stats(dag).collect()[0]["reciprocity_ppm"] == 0
    bidir = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")],
        "src string, dst string",
    )
    assert graph_stats(bidir).collect()[0]["reciprocity_ppm"] == 10**6


def test_zero_variance_convention(spark):
    star = spark.createDataFrame(
        [("h", "x"), ("h", "y"), ("h", "z")], "src string, dst string"
    )
    assert graph_stats(star).collect()[0]["assortativity"] == 0.0


def test_partitioning_invariance(spark, edges_df):
    a = graph_stats(edges_df).collect()
    b = graph_stats(edges_df.repartition(7)).collect()
    assert a == b
