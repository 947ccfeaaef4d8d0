"""PRA 2-hop path features: hand-counted typed paths, round-trip
exclusion, hub cap, candidate-pair pruning, and invariance."""

from __future__ import annotations

import pytest

from kgspark.ops.graph_algs import path_features_2hop

EDGES = [
    # two parallel typed paths a -> b (via m1 and m2) and one mixed-type
    ("a", "r1", "m1"), ("m1", "r2", "b"),
    ("a", "r1", "m2"), ("m2", "r2", "b"),
    ("a", "r3", "m1"),                     # a -r3-> m1 -r2-> b
    # a round trip a -> m1 -> a must NOT appear
    ("m1", "r2", "a"),
    # hub h: many in/out edges
    ("a", "r1", "h"), ("c", "r1", "h"), ("d", "r1", "h"),
    ("h", "r2", "b"), ("h", "r2", "c"), ("h", "r2", "d"),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["src", "rel", "dst"])


def _got(df):
    return {(r["a"], r["b"], r["rel_path"]): r["n_paths"] for r in df.collect()}


def test_hand_counted_paths(spark, edges_df):
    got = _got(path_features_2hop(edges_df))
    # two r1>r2 paths a->b via m1, m2, PLUS one via hub h = 3
    assert got[("a", "b", "r1>r2")] == 3
    assert got[("a", "b", "r3>r2")] == 1
    # round trip a->m1->a excluded
    assert ("a", "a", "r1>r2") not in got
    # hub-made paths exist for c, d
    assert got[("c", "b", "r1>r2")] == 1
    assert got[("c", "d", "r1>r2")] == 1


def test_hub_cap_prunes_celebrity_mids(spark, edges_df):
    # h has total degree 6; cap at 5 removes every path through it
    got = _got(path_features_2hop(edges_df, max_mid_degree=5))
    assert got[("a", "b", "r1>r2")] == 2          # only m1, m2 survive
    assert ("c", "b", "r1>r2") not in got
    with pytest.raises(ValueError, match="max_mid_degree"):
        path_features_2hop(edges_df, max_mid_degree=0)


def test_candidate_pairs_prune(spark, edges_df):
    pairs = spark.createDataFrame([("a", "b")], ["a", "b"])
    got = _got(path_features_2hop(edges_df, pairs=pairs))
    assert set(k[:2] for k in got) == {("a", "b")}
    assert got[("a", "b", "r1>r2")] == 3


def test_partitioning_invariant(spark, edges_df):
    x = sorted(map(tuple, path_features_2hop(edges_df.repartition(1)).collect()))
    y = sorted(map(tuple, path_features_2hop(edges_df.repartition(7)).collect()))
    assert x == y
