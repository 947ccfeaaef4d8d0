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


class TestLinkPredictionEval:
    def _embs(self, spark):
        # dim-1 hand-crafted embeddings: distances fully predictable
        ent = spark.createDataFrame(
            [("a", [0]), ("b", [0]), ("c", [1000])], "id string, vec array<bigint>"
        )
        rel = spark.createDataFrame([("R", [0])], "id string, vec array<bigint>")
        return ent, rel

    def test_rank_with_deterministic_tie_break(self, spark):
        from kgspark.ops.transe import link_prediction_ranks

        ent, rel = self._embs(spark)
        test = spark.createDataFrame(
            [("a", "R", "b")], "src_id string, rel string, dst_id string"
        )
        # scores vs (a,R): a->0, b->0, c->floor(1000^2/1e6)=1
        # b ties with a; tie-break a<b counts against b -> rank 2
        (row,) = link_prediction_ranks(test, ent, rel).collect()
        assert (row.s, row.r, row.o, row.rank) == ("a", "R", "b", 2)

    def test_filtered_setting_excludes_known_competitor(self, spark):
        from kgspark.ops.transe import link_prediction_ranks

        ent, rel = self._embs(spark)
        test = spark.createDataFrame(
            [("a", "R", "b")], "src_id string, rel string, dst_id string"
        )
        known = spark.createDataFrame(
            [("a", "R", "b"), ("a", "R", "a")],
            "src_id string, rel string, dst_id string",
        )
        # raw rank 2 (a ties and wins tie-break); filtered removes known
        # competitor a -> rank 1
        (row,) = link_prediction_ranks(test, ent, rel, filter_triples=known).collect()
        assert row.rank == 1

    def test_metrics(self, spark):
        from kgspark.ops.transe import lp_metrics

        ranks = spark.createDataFrame(
            [("a", "R", "b", 1), ("a", "R", "c", 4), ("b", "R", "c", 20)],
            "s string, r string, o string, rank long",
        )
        (m,) = lp_metrics(ranks).collect()
        assert m.n == 3
        assert m.rr_micro_sum == 1_000_000 + 250_000 + 50_000
        assert (m.hits_1, m.hits_3, m.hits_10) == (1, 1, 2)

    def test_max_candidates_guard(self, spark):
        from kgspark.ops.transe import link_prediction_ranks

        ent, rel = self._embs(spark)
        test = spark.createDataFrame(
            [("a", "R", "b")], "src_id string, rel string, dst_id string"
        )
        with pytest.raises(ValueError, match="max_candidates"):
            link_prediction_ranks(test, ent, rel, max_candidates=2)


class TestBM25:
    def _docs(self, spark):
        rows = [
            (1, "spark join spark table"),
            (2, "join table row value"),
            (3, "the quick brown fox"),
            (4, "spark spark spark spark spark spark"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    @staticmethod
    def _expected(rows, query, k1=1200, b=750):
        """Independent integer replication of the BM25 fixed-point chain."""
        import math

        toks = {i: t.lower().split() for i, t in rows}
        dl = {i: len(ts) for i, ts in toks.items()}
        n, tot = len(dl), sum(dl.values())
        out = {}
        for term in query:
            df = sum(1 for ts in toks.values() if term in ts)
            if df == 0:
                continue
            idf = round(math.log(1 + (n - df + 0.5) / (df + 0.5)) * 1000)
            for i, ts in toks.items():
                tf = ts.count(term)
                if not tf:
                    continue
                r1 = (1000 * dl[i] * n) // tot
                norm = (1000 - b) + (b * r1) // 1000
                denom = 1000 * tf + (k1 * norm) // 1000
                out.setdefault(i, 0)
                out[i] += (idf * tf * (k1 + 1000) * 1000) // denom
        return out

    def test_exact_scores_vs_independent_replication(self, spark):
        from kgspark.ops.textstats import bm25_rank

        rows = [
            (1, "spark join spark table"),
            (2, "join table row value"),
            (3, "the quick brown fox"),
            (4, "spark spark spark spark spark spark"),
        ]
        got = {
            r.doc_id: r.score_micro
            for r in bm25_rank(self._docs(spark), ["spark", "join"]).collect()
        }
        assert got == self._expected(rows, ["spark", "join"])

    def test_rare_term_outweighs_common(self, spark):
        from kgspark.ops.textstats import bm25_rank

        docs = spark.createDataFrame(
            [
                (1, "common rare"),
                (2, "common x"),
                (3, "common y"),
                (4, "common z"),
            ],
            "doc_id long, text string",
        )
        scores = {
            r.doc_id: r.score_micro
            for r in bm25_rank(docs, ["common", "rare"]).collect()
        }
        # doc 1 has the rare term -> scores strictly higher than the others
        assert scores[1] > max(scores[2], scores[3], scores[4])

    def test_partitioning_invariant(self, spark):
        from kgspark.ops.textstats import bm25_rank

        d = self._docs(spark)
        a = sorted(map(tuple, bm25_rank(d, ["spark", "join"]).collect()))
        b = sorted(
            map(tuple, bm25_rank(d.repartition(7), ["spark", "join"]).collect())
        )
        assert a == b

    def test_empty_query_raises(self, spark):
        from kgspark.ops.textstats import bm25_rank

        with pytest.raises(ValueError):
            bm25_rank(self._docs(spark), [])


class TestPersonalizedPageRank:
    def _edges(self, spark):
        # star: hub h -> a,b; chain c -> d (disconnected from the hub side)
        return spark.createDataFrame(
            [("h", "a"), ("h", "b"), ("a", "h"), ("c", "d")],
            "src string, dst string",
        )

    def test_unreachable_nodes_get_zero(self, spark):
        from kgspark.ops.graph_algs import pagerank

        seeds = spark.createDataFrame([("h",)], "name string")
        r = {
            row.name: row.rank_units
            for row in pagerank(
                self._edges(spark), max_iter=3, scale=10**12, seeds=seeds
            ).collect()
        }
        # c and d are unreachable from seed h -> rank exactly 0 (c) or only
        # via d's own teleport share, which is 0 for non-seeds
        assert r["c"] == 0 and r["d"] == 0
        # a and b are symmetric; everyone on the seed side holds mass
        assert r["a"] == r["b"] > 0 and r["h"] > 0

    def test_seeds_all_nodes_equals_classic(self, spark):
        from kgspark.ops.graph_algs import pagerank

        e = self._edges(spark)
        allnodes = e.selectExpr("src AS name").union(e.selectExpr("dst")).distinct()
        classic = sorted(
            map(tuple, pagerank(e, max_iter=3, scale=10**12).collect())
        )
        ppr_all = sorted(
            map(
                tuple,
                pagerank(e, max_iter=3, scale=10**12, seeds=allnodes).collect(),
            )
        )
        assert classic == ppr_all

    def test_unknown_seed_raises(self, spark):
        from kgspark.ops.graph_algs import pagerank

        seeds = spark.createDataFrame([("zzz",)], "name string")
        with pytest.raises(ValueError, match="seed"):
            pagerank(self._edges(spark), max_iter=2, scale=10**12, seeds=seeds)

    def test_partitioning_invariant(self, spark):
        from kgspark.ops.graph_algs import pagerank

        e = self._edges(spark)
        seeds = spark.createDataFrame([("h",), ("c",)], "name string")
        a = sorted(map(tuple, pagerank(e, max_iter=3, scale=10**12, seeds=seeds).collect()))
        b = sorted(
            map(
                tuple,
                pagerank(
                    e.repartition(7), max_iter=3, scale=10**12, seeds=seeds
                ).collect(),
            )
        )
        assert a == b

    def test_float_mode_seeds(self, spark):
        from kgspark.ops.graph_algs import pagerank

        seeds = spark.createDataFrame([("h",)], "name string")
        r = {
            row.name: row.rank
            for row in pagerank(
                self._edges(spark), max_iter=5, tol=None, seeds=seeds
            ).collect()
        }
        assert r["c"] == 0.0 and r["d"] == 0.0
        assert abs(sum(r.values()) - 1.0) < 1e-9  # mass conserved on the seed side


class TestHarmonicCentrality:
    def test_path_graph_exact(self, spark):
        from kgspark.ops.graph_algs import harmonic_centrality

        # path 0-1-2 with both endpoints as landmarks:
        # h(0) = 1e6//1 (from 2? no: d(2,0)=2 -> 1e6//2) + skip own landmark
        e = spark.createDataFrame([(0, 1), (1, 2)], "src int, dst int")
        lm = spark.createDataFrame([(0,), (2,)], "landmark int")
        got = {
            r.node: r.centrality_units
            for r in harmonic_centrality(e, lm, max_hops=3).collect()
        }
        # node 0: d from lm2 = 2 -> 500000; node 1: 1e6 + 1e6; node 2: 500000
        assert got == {0: 500_000, 1: 2_000_000, 2: 500_000}

    def test_partitioning_invariant(self, spark):
        from kgspark.ops.graph_algs import harmonic_centrality

        e = spark.createDataFrame(
            [(i, (i * 3 + 1) % 13) for i in range(13)], "src int, dst int"
        )
        lm = spark.createDataFrame([(0,), (5,)], "landmark int")
        a = sorted(map(tuple, harmonic_centrality(e, lm, max_hops=4).collect()))
        b = sorted(
            map(tuple, harmonic_centrality(e.repartition(5), lm, max_hops=4).collect())
        )
        assert a == b


class TestLinkPredictionScores:
    def test_cycle4_hand_computed(self, spark):
        from kgspark.ops.graph_algs import link_prediction_scores

        # C4: 1-2-3-4-1. Non-adjacent pairs (1,3) and (2,4), each with two
        # degree-2 common neighbors: cn=2, ra=2*500000, jacc=1e6*2//2.
        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1)], "src int, dst int"
        )
        got = {
            (r.x, r.y): (r.cn, r.ra_units, r.jacc_units)
            for r in link_prediction_scores(e).collect()
        }
        assert got == {
            (1, 3): (2, 1_000_000, 1_000_000),
            (2, 4): (2, 1_000_000, 1_000_000),
        }

    def test_star_plus_edge_existing_pairs_excluded(self, spark):
        from kgspark.ops.graph_algs import link_prediction_scores

        # hub 0 — {1..5}, plus 1-2. Candidates = the 10 leaf pairs minus
        # the existing (1,2); wedges through leaf centers 1 and 2 produce
        # only already-adjacent pairs (0,1)/(0,2), also excluded.
        e = spark.createDataFrame(
            [(0, i) for i in range(1, 6)] + [(1, 2)], "src int, dst int"
        )
        rows = link_prediction_scores(e).collect()
        got = {(r.x, r.y): (r.cn, r.ra_units, r.jacc_units) for r in rows}
        assert len(got) == 9 and (1, 2) not in got
        assert got[(3, 4)] == (1, 200_000, 1_000_000)  # deg 1+1, cn 1
        assert got[(1, 3)] == (1, 200_000, 500_000)  # deg 2+1, cn 1

    def test_hub_cap_and_audit(self, spark):
        from kgspark.ops.graph_algs import link_prediction_scores, lp_center_audit

        e = spark.createDataFrame(
            [(0, i) for i in range(1, 6)] + [(1, 2)], "src int, dst int"
        )
        assert link_prediction_scores(e, max_center_degree=4).count() == 0
        a = lp_center_audit(e, max_center_degree=4).collect()[0]
        assert (a.centers_skipped, a.centers_kept, a.wedge_rows_avoided) == (1, 5, 10)

    def test_partitioning_invariant(self, spark):
        from kgspark.ops.graph_algs import link_prediction_scores

        e = spark.createDataFrame(
            [(i, (i * 5 + 2) % 17) for i in range(17)]
            + [(i, (i * 3 + 1) % 17) for i in range(17)],
            "src int, dst int",
        )
        a = sorted(map(tuple, link_prediction_scores(e).collect()))
        b = sorted(
            map(tuple, link_prediction_scores(e.repartition(7)).collect())
        )
        assert a == b and len(a) > 0


class TestClusteringCoefficient:
    def test_k4_and_pendant(self, spark):
        from kgspark.ops.graph_algs import clustering_coefficient

        # K4 on {0..3} (every node: 3 triangles, deg 3, cc = 1) plus a
        # pendant 3-4 (node 4: deg 1 -> cc 0; node 3: deg 4, still 3
        # triangles -> floor(1e6*6/12) = 500000).
        k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
        e = spark.createDataFrame(k4 + [(3, 4)], "src int, dst int")
        got = {
            r.node: (r.triangles, r.deg, r.cc_units)
            for r in clustering_coefficient(e).collect()
        }
        assert got[0] == (3, 3, 1_000_000)
        assert got[3] == (3, 4, 500_000)
        assert got[4] == (0, 1, 0)

    def test_partitioning_invariant(self, spark):
        from kgspark.ops.graph_algs import clustering_coefficient

        e = spark.createDataFrame(
            [(i, (i * 5 + 2) % 19) for i in range(19)]
            + [(i, (i + 1) % 19) for i in range(19)],
            "src int, dst int",
        )
        a = sorted(map(tuple, clustering_coefficient(e).collect()))
        b = sorted(map(tuple, clustering_coefficient(e.repartition(6)).collect()))
        assert a == b and len(a) == 19
