"""KMV distinct-count sketch: exactness below k, estimator accuracy above k,
the merge closure property, and partitioning invariance."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kgspark.ops.sketch import kmv_distinct, kmv_estimate, kmv_merge, kmv_sketch


def _groups_df(spark, n_rows, n_distinct):
    # values cycle through n_distinct ids; duplicates must not affect KMV
    return spark.range(n_rows).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % n_distinct).alias("v"),
    )


def test_exact_below_k(spark):
    df = _groups_df(spark, 300, 50)
    got = {r["g"]: r["est_distinct"] for r in kmv_distinct(df, "v", ["g"], k=64).collect()}
    truth = {
        r["g"]: r["d"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("d")).collect()
    }
    assert got == truth  # sketch holds the whole distinct set -> exact


def test_estimator_accuracy_above_k(spark):
    k = 256
    df = _groups_df(spark, 20000, 5000)
    truth = {
        r["g"]: r["d"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("d")).collect()
    }
    got = {r["g"]: r["est_distinct"] for r in kmv_distinct(df, "v", ["g"], k=k).collect()}
    rse = 1.0 / math.sqrt(k - 2)  # Beyer et al. standard error
    for g, d in truth.items():
        assert abs(got[g] - d) <= 4 * rse * d, (g, got[g], d)


def test_merge_closure(spark):
    """KMV closure: merging per-shard sketches == sketching the union."""
    df = _groups_df(spark, 4000, 900).cache()
    a = df.filter(F.col("v") % 2 == 0)
    b = df.filter(F.col("v") % 2 == 1)
    parts = kmv_sketch(a, "v", ["g"], k=64).unionByName(kmv_sketch(b, "v", ["g"], k=64))
    merged = kmv_merge(parts, ["g"], k=64)
    whole = kmv_sketch(df, "v", ["g"], k=64)
    m = {r["g"]: r["sketch"] for r in merged.collect()}
    w = {r["g"]: r["sketch"] for r in whole.collect()}
    assert m == w
    est = {r["g"]: r["est_distinct"] for r in kmv_estimate(merged, k=64).collect()}
    est_w = {r["g"]: r["est_distinct"] for r in kmv_estimate(whole, k=64).collect()}
    assert est == est_w


def test_partitioning_invariance(spark):
    df = _groups_df(spark, 5000, 700)
    one = {r["g"]: r["est_distinct"]
           for r in kmv_distinct(df.repartition(2), "v", ["g"], k=64).collect()}
    many = {r["g"]: r["est_distinct"]
            for r in kmv_distinct(df.repartition(13), "v", ["g"], k=64).collect()}
    assert one == many
