"""Attribute fusion: hand-checked majority vote, deterministic tie-break,
NULL abstention, weighted votes, and partitioning invariance."""

from __future__ import annotations

from kgspark.construct.fusion import fuse_attributes

ROWS = [
    # e1.color: blue wins 2-1
    ("e1", "color", "blue"), ("e1", "color", "blue"), ("e1", "color", "red"),
    # e1.size: exact tie -> lexicographically smaller value "L" wins over "M"
    ("e1", "size", "M"), ("e1", "size", "L"),
    # e2.color: single assertion + a NULL abstention
    ("e2", "color", "green"), ("e2", "color", None),
]


def _got(df):
    return {
        (r["entity_id"], r["attr"]): (
            r["value"], r["votes"], r["total_votes"], r["n_values"], r["support_ppm"]
        )
        for r in df.collect()
    }


def test_majority_tie_and_null(spark):
    df = spark.createDataFrame(ROWS, ["entity_id", "attr", "value"])
    got = _got(fuse_attributes(df))
    assert got[("e1", "color")] == ("blue", 2, 3, 2, 666666)
    assert got[("e1", "size")] == ("L", 1, 2, 2, 500000)
    # the NULL row abstains: 1 vote of 1, one distinct value
    assert got[("e2", "color")] == ("green", 1, 1, 1, 1000000)


def test_weighted_votes_flip_the_winner(spark):
    rows = [
        ("e1", "color", "blue", 1), ("e1", "color", "blue", 1),
        ("e1", "color", "red", 5),  # one reliable source outvotes two weak ones
    ]
    df = spark.createDataFrame(rows, ["entity_id", "attr", "value", "w"])
    got = _got(fuse_attributes(df, weight_col="w"))
    assert got[("e1", "color")] == ("red", 5, 7, 2, 714285)


def test_partitioning_invariant(spark):
    df = spark.createDataFrame(ROWS * 11, ["entity_id", "attr", "value"])
    a = sorted(map(tuple, fuse_attributes(df.repartition(1)).collect()))
    b = sorted(map(tuple, fuse_attributes(df.repartition(13)).collect()))
    assert a == b
