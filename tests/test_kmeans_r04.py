"""ops/kmeans — integer fixed-point Lloyd k-means + SemDeDup pairs.

Determinism is the contract: the DuckDB oracle in __spark_entry__ unrolls
the same iterations bit-for-bit, so these tests pin the properties that
make that possible (partition invariance, floor quantization, tie-breaks)
plus the semantic behavior (planted near-dup recovery, cluster cap)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgspark.ops.kmeans import kmeans_assign, quantized, semdedup_pairs


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def _blob(rng, center, n, spread=0.05):
    c = np.asarray(center, dtype=np.float64)
    pts = c + rng.normal(0, spread, size=(n, len(center)))
    return [p / np.linalg.norm(p) for p in pts]


def test_kmeans_separates_planted_blobs_and_is_partition_invariant(spark):
    rng = np.random.default_rng(11)
    rows = []
    for bi, center in enumerate([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]]):
        for j, v in enumerate(_blob(rng, center, 12)):
            rows.append((bi * 100 + j, v))
    e = _emb(spark, rows)
    a = {r["vec_id"]: r["cluster"] for r in kmeans_assign(e, k=3, n_iter=4).collect()}
    # every blob lands in exactly one cluster, blobs in distinct clusters
    blobs = [{a[bi * 100 + j] for j in range(12)} for bi in range(3)]
    assert all(len(b) == 1 for b in blobs)
    assert len({next(iter(b)) for b in blobs}) == 3
    # repartitioning cannot change a single assignment
    a2 = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(e.repartition(7), k=3, n_iter=4).collect()
    }
    assert a == a2


def test_kmeans_empty_cluster_keeps_centroid_and_validation(spark):
    # two identical points, k=2: one centroid never receives members after
    # the first assignment — the loop must carry it, not crash or NULL out
    e = _emb(spark, [(1, [1.0, 0.0]), (2, [1.0, 0.0])])
    out = kmeans_assign(e, k=2, n_iter=3).collect()
    assert {r["cluster"] for r in out} <= {0, 1} and len(out) == 2
    with pytest.raises(ValueError, match="k must be"):
        kmeans_assign(e, k=0)
    with pytest.raises(ValueError, match="n_iter"):
        kmeans_assign(e, k=1, n_iter=-1)
    with pytest.raises(ValueError, match="centroid-collect guard"):
        kmeans_assign(e, k=1_000_000, n_iter=1)
    with pytest.raises(ValueError, match="empty"):
        kmeans_assign(e.filter("vec_id > 99"), k=1)


def test_quantized_floor_semantics(spark):
    df = spark.createDataFrame([([0.0015, -0.0015, 0.9999],)], "v array<double>")
    got = df.select(quantized(F.col("v"), 1000).alias("q")).first()["q"]
    # floor, not round: -0.0015*1000 = -1.5 -> -2
    assert got == [1, -2, 999]


def test_semdedup_recovers_planted_scaled_copies_only(spark):
    rng = np.random.default_rng(23)
    rows = []
    for bi, center in enumerate([[1, 0, 0, 0, 0], [0, 0, 1, 0, 0]]):
        for j, v in enumerate(_blob(rng, center, 10, spread=0.2)):
            rows.append((bi * 100 + j, v))
    # plant: ids 0 and 103 re-enter scaled (same direction, cosine ~1)
    planted = {(0, 1000), (103, 1103)}
    for orig, copy in planted:
        v = dict(rows)[orig]
        rows.append((copy, [x * 0.8 for x in v]))
    e = _emb(spark, rows)
    got = {
        (r["a"], r["b"])
        for r in semdedup_pairs(e, k=2, n_iter=3, threshold_milli=995).collect()
    }
    assert got == planted
    with pytest.raises(ValueError, match="threshold_milli"):
        semdedup_pairs(e, k=2, threshold_milli=0)


def test_semdedup_cluster_cap_bounds_pairs_deterministically(spark):
    rng = np.random.default_rng(5)
    rows = [(i, v) for i, v in enumerate(_blob(rng, [1, 0, 0], 30, spread=0.01))]
    e = _emb(spark, rows)
    # one tight blob, threshold low enough that everything pairs: the cap
    # must bound the quadratic exactly at C(cap, 2)
    full = semdedup_pairs(e, k=1, n_iter=1, threshold_milli=900).count()
    assert full == 30 * 29 // 2
    capped = semdedup_pairs(
        e, k=1, n_iter=1, threshold_milli=900, max_cluster_size=8
    )
    assert capped.count() == 8 * 7 // 2
    # deterministic: same cap, same survivors
    again = semdedup_pairs(
        e.repartition(5), k=1, n_iter=1, threshold_milli=900, max_cluster_size=8
    )
    assert {tuple(r) for r in capped.collect()} == {tuple(r) for r in again.collect()}
