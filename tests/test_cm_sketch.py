"""Count-min sketch: never-undercount property, exactness at generous
width, merge = rebuild, weighted counts, invariance, validation."""

from __future__ import annotations

from collections import Counter

import pytest

from kgspark.ops.sketch import cm_merge, cm_query, cm_sketch

VALUES = (["hot"] * 40 + [f"k{i}" for i in range(30)] + ["warm"] * 7) * 2


@pytest.fixture(scope="module")
def vals_df(spark):
    return spark.createDataFrame([(v,) for v in VALUES], ["key"])


def _est(spark, sketch, keys, **kw):
    q = spark.createDataFrame([(k,) for k in keys], ["key"])
    return {r["value"]: r["est_count"] for r in cm_query(sketch, q, "key", **kw).collect()}


def test_never_undercounts_and_exact_when_wide(spark, vals_df):
    exact = Counter(VALUES)
    sk = cm_sketch(vals_df, "key", depth=3, width=16)  # collision-prone
    got = _est(spark, sk, exact, depth=3, width=16)
    assert all(got[k] >= exact[k] for k in exact)
    wide = cm_sketch(vals_df, "key", depth=4, width=4096)
    got_w = _est(spark, wide, exact, depth=4, width=4096)
    assert got_w == dict(exact)  # wide grid: no collisions on 32 keys
    # unseen key reads ~0 on the wide grid
    assert _est(spark, wide, ["never-seen"], depth=4, width=4096)["never-seen"] == 0


def test_merge_equals_rebuild(spark, vals_df):
    half_a = spark.createDataFrame([(v,) for v in VALUES[::2]], ["key"])
    half_b = spark.createDataFrame([(v,) for v in VALUES[1::2]], ["key"])
    merged = cm_merge(cm_sketch(half_a, "key").unionByName(cm_sketch(half_b, "key")))
    full = cm_sketch(vals_df, "key")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_weighted(spark):
    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], ["key", "n"])
    sk = cm_sketch(df, "key", depth=3, width=512, weight_col="n")
    got = _est(spark, sk, ["a", "b"], depth=3, width=512)
    assert got == {"a": 12, "b": 1}


def test_partitioning_invariant_and_validation(spark, vals_df):
    a = sorted(map(tuple, cm_sketch(vals_df.repartition(1), "key").collect()))
    b = sorted(map(tuple, cm_sketch(vals_df.repartition(13), "key").collect()))
    assert a == b
    with pytest.raises(ValueError, match="depth and width"):
        cm_sketch(vals_df, "key", depth=0)
