"""Round-3: TransE embedding training (ops/transe.py) and landmark
shortest-path distances (ops/graph_algs.landmark_distances)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark.ops.graph_algs import landmark_distances
from kgspark.ops.transe import (
    embeddings_to_float,
    init_embeddings,
    transe_score,
    transe_train,
)


@pytest.fixture(scope="module")
def triples(spark):
    # two disjoint relation clusters: a/b/c linked by R1, x/y/z by R2
    rows = [
        ("a", "R1", "b"),
        ("b", "R1", "c"),
        ("a", "R1", "c"),
        ("x", "R2", "y"),
        ("y", "R2", "z"),
        ("x", "R2", "z"),
        ("a", "R2", "z"),
        ("c", "R1", "x"),
    ]
    return spark.createDataFrame(rows, "src_id string, rel string, dst_id string")


def _emb_rows(df):
    return sorted((r.id, tuple(r.vec)) for r in df.collect())


class TestTransE:
    def test_init_deterministic_and_bounded(self, spark):
        ids = spark.createDataFrame([("a",), ("b",)], "id string")
        e1 = init_embeddings(ids, "id", 6, amp_units=1000)
        e2 = init_embeddings(ids.repartition(7), "id", 6, amp_units=1000)
        r1, r2 = _emb_rows(e1), _emb_rows(e2)
        assert r1 == r2
        for _, vec in r1:
            assert len(vec) == 6
            assert all(-1000 <= v <= 1000 for v in vec)
        # different ids draw different vectors
        assert r1[0][1] != r1[1][1]

    def test_train_partitioning_invariant(self, triples):
        e1, r1 = transe_train(triples, dim=4, epochs=2)
        e2, r2 = transe_train(triples.repartition(11), dim=4, epochs=2)
        assert _emb_rows(e1) == _emb_rows(e2)
        assert _emb_rows(r1) == _emb_rows(r2)

    def test_training_reduces_hinge_loss(self, triples):
        """Mean margin violation of (positive, corruption) pairs shrinks
        after training vs the untrained init."""
        from kgspark.ops.kg_sampling import negative_samples

        ents = (
            triples.select(F.col("src_id").alias("entity_id"))
            .union(triples.select("dst_id"))
            .distinct()
        )
        pairs = negative_samples(
            triples, ents, n_per_positive=1, salt="transe-neg-v1", keep_positive=True
        )

        def hinge_sum(ent, rel):
            pos = transe_score(
                pairs.select("src_id", "rel", "dst_id"), ent, rel
            ).withColumnRenamed("score_units", "fp")
            neg = transe_score(
                pairs.select(
                    "src_id", "rel", F.col("neg_dst_id").alias("dst_id")
                ),
                ent,
                rel,
            ).withColumnRenamed("score_units", "fn")
            j = pos.join(
                neg.select(F.col("dst_id").alias("neg_dst_id"), "src_id", "rel", "fn"),
                ["src_id", "rel"],
            )
            return (
                j.select(
                    F.greatest(
                        F.lit(0).cast("long"),
                        F.lit(1_000_000) + F.col("fp") - F.col("fn"),
                    ).alias("h")
                )
                .agg(F.sum("h"))
                .first()[0]
            )

        ents_all = (
            triples.select(F.col("src_id").alias("id"))
            .union(triples.select("dst_id"))
            .distinct()
        )
        rels_all = triples.select(F.col("rel").alias("id")).distinct()
        e0 = init_embeddings(ents_all, "id", 4)
        r0 = init_embeddings(rels_all, "id", 4)
        et, rt = transe_train(triples, dim=4, epochs=5)
        before, after = hinge_sum(e0, r0), hinge_sum(et, rt)
        assert after < before

    def test_minibatch_subset_of_fullbatch_updates(self, triples):
        """n_batches=2 trains on alternating deterministic halves — still
        partitioning-invariant and returns full embedding tables."""
        e1, _ = transe_train(triples, dim=4, epochs=2, n_batches=2)
        e2, _ = transe_train(triples.repartition(5), dim=4, epochs=2, n_batches=2)
        assert _emb_rows(e1) == _emb_rows(e2)
        assert len(_emb_rows(e1)) == 6  # a b c x y z — nothing lost

    def test_amp_guard(self, triples):
        with pytest.raises(ValueError, match="amp_units"):
            transe_train(triples, dim=2, epochs=1, amp_units=20_000_000)

    def test_to_float(self, spark):
        ids = spark.createDataFrame([("a",)], "id string")
        emb = init_embeddings(ids, "id", 2, amp_units=500_000)
        fl = embeddings_to_float(emb)
        (row,) = fl.collect()
        (urow,) = emb.collect()
        assert row.vec == [v / 1_000_000 for v in urow.vec]


class TestLandmarkDistances:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src int, dst int")

    def test_path_graph_exact(self, spark):
        e = self._edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (8, 9)])
        lm = spark.createDataFrame([(0,), (3,)], "landmark int")
        got = sorted(
            (r.landmark, r.node, r.dist)
            for r in landmark_distances(e, lm, max_hops=3).collect()
        )
        assert got == sorted(
            [
                (0, 0, 0), (0, 1, 1), (0, 2, 2), (0, 3, 3),
                (3, 3, 0), (3, 2, 1), (3, 4, 1), (3, 1, 2), (3, 0, 3),
            ]
        )

    def test_directed_respects_orientation(self, spark):
        e = self._edges(spark, [(0, 1), (1, 2)])
        lm = spark.createDataFrame([(2,)], "landmark int")
        got = landmark_distances(e, lm, max_hops=3, directed=True).collect()
        assert [(r.landmark, r.node, r.dist) for r in got] == [(2, 2, 0)]

    def test_shortest_wins_over_longer_route(self, spark):
        # 0-1-2-3 chain plus shortcut 0-3
        e = self._edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
        lm = spark.createDataFrame([(0,)], "landmark int")
        d = {
            r.node: r.dist
            for r in landmark_distances(e, lm, max_hops=5).collect()
        }
        assert d == {0: 0, 1: 1, 2: 2, 3: 1}

    def test_until_stable_matches_fixed(self, spark):
        e = self._edges(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
        lm = spark.createDataFrame([(1,)], "landmark int")
        fixed = sorted(
            map(tuple, landmark_distances(e, lm, max_hops=10).collect())
        )
        stable = sorted(
            map(
                tuple,
                landmark_distances(e, lm, max_hops=10, until_stable=True).collect(),
            )
        )
        assert fixed == stable

    def test_partitioning_invariant(self, spark):
        e = self._edges(spark, [(i, (i * 3 + 1) % 17) for i in range(17)])
        lm = spark.createDataFrame([(0,), (5,)], "landmark int")
        a = sorted(map(tuple, landmark_distances(e, lm, max_hops=4).collect()))
        b = sorted(
            map(
                tuple,
                landmark_distances(e.repartition(9), lm, max_hops=4).collect(),
            )
        )
        assert a == b
