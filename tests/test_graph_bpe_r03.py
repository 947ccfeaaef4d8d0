"""Unit semantics for the round-3b additions: k-core peeling, deterministic
label propagation, salted random walks, and distributed BPE training /
encoding (ops/graph_algs.py, ops/bpe.py). The registry queries
`kcore_docs` / `label_propagation_docs` / `random_walks_docs` /
`bpe_pair_counts` carry the cross-engine DuckDB checks; these tests pin
the algorithmic contracts on crafted graphs/corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.ops.bpe import (
    apply_merge,
    bpe_encode,
    bpe_train,
    char_symbols,
    pair_counts,
    word_freqs,
)
from kgspark.ops.graph_algs import kcore, label_propagation, random_walks


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ---------------------------------------------------------------------------
# kcore
# ---------------------------------------------------------------------------
def test_kcore_peels_cascade(spark):
    # path 1-2-3-4: endpoints have degree 1; removing them leaves 2-3 with
    # degree 1 -> the 2-core is EMPTY, reachable only by iterating
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    assert kcore(e, 2).count() == 0


def test_kcore_keeps_cycles_drops_tail(spark):
    # triangle {1,2,3} with tail 3-4, plus 4-cycle {10..13}
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (10, 11), (11, 12), (12, 13), (13, 10)])
    got = {(r["node"], r["degree"]) for r in kcore(e, 2).collect()}
    assert got == {(n, 2) for n in [1, 2, 3, 10, 11, 12, 13]}
    # the 3-core is empty (no node reaches degree 3 anywhere)
    assert kcore(e, 3).count() == 0


def test_kcore_fixed_iter_matches_stable_when_converged(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)])
    stable = sorted(kcore(e, 2, until_stable=True).collect())
    fixed = sorted(kcore(e, 2, max_iter=6, until_stable=False).collect())
    assert stable == fixed


def test_kcore_ignores_direction_duplicates_loops(spark):
    e = _edges(spark, [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (2, 2)])
    got = {(r["node"], r["degree"]) for r in kcore(e, 2).collect()}
    assert got == {(1, 2), (2, 2), (3, 2)}


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------
def test_lpa_two_cliques_converge_to_min_labels(spark):
    clique1 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(4, 10)]
    labels = dict(
        (r["node"], r["label"])
        for r in label_propagation(_edges(spark, clique1 + clique2 + bridge), max_iter=4).collect()
    )
    assert all(labels[n] == 1 for n in range(1, 5))
    assert all(labels[n] == 10 for n in range(10, 14))


def test_lpa_deterministic_and_partitioning_invariant(spark):
    e = _edges(spark, [(i, (i * 3 + 1) % 17) for i in range(17)])
    a = sorted(label_propagation(e, max_iter=3).collect())
    b = sorted(label_propagation(e.repartition(13), max_iter=3).collect())
    assert a == b


# ---------------------------------------------------------------------------
# random walks
# ---------------------------------------------------------------------------
def test_random_walks_follow_edges_and_stop_at_sinks(spark):
    # 1 -> 2 -> 3 (3 is a sink); walks from 3 never start (no out-edges)
    e = _edges(spark, [(1, 2), (2, 3)])
    rows = random_walks(e, walk_length=5, num_walks=1).collect()
    walks: dict[str, dict[int, int]] = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    assert set(walks) == {"1#0", "2#0"}
    assert [walks["1#0"][s] for s in sorted(walks["1#0"])] == [1, 2, 3]
    assert [walks["2#0"][s] for s in sorted(walks["2#0"])] == [2, 3]
    edge_set = {(1, 2), (2, 3)}
    for w in walks.values():
        steps = [w[s] for s in sorted(w)]
        assert all((a, b) in edge_set for a, b in zip(steps, steps[1:]))


def test_random_walks_salt_redraws_and_multiplicity(spark):
    ring = [(i, (i + 1) % 20) for i in range(20)] + [(i, (i + 7) % 20) for i in range(20)]
    e = _edges(spark, ring)
    base = random_walks(e, walk_length=4, num_walks=3)
    rows = base.collect()
    assert {r["walk_id"] for r in rows} == {f"{n}#{k}" for n in range(20) for k in range(3)}
    assert sorted(rows) == sorted(random_walks(e, walk_length=4, num_walks=3).collect())
    redraw = random_walks(e, walk_length=4, num_walks=3, salt="walk-v2").collect()
    assert sorted(rows) != sorted(redraw)
    # every hop is a real edge
    edge_set = set((a, b) for a, b in ring)
    walks: dict[str, dict[int, int]] = {}
    for r in rows:
        walks.setdefault(r["walk_id"], {})[r["step"]] = r["node"]
    for w in walks.values():
        steps = [w[s] for s in sorted(w)]
        assert len(steps) == 5
        assert all((a, b) in edge_set for a, b in zip(steps, steps[1:]))


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------
def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_freqs_and_pair_counts(spark):
    d = _docs(spark, ["low low lower", "Low lowest"])
    wf = {r["word"]: r["freq"] for r in word_freqs(d).collect()}
    assert wf == {"low": 3, "lower": 1, "lowest": 1}
    w = word_freqs(d).select("word", "freq", char_symbols("word").alias("syms"))
    pc = {(r["a"], r["b"]): r["cnt"] for r in pair_counts(w).collect()}
    # 'l o' appears once per word occurrence-type weighted by freq: 3+1+1
    assert pc[("l", "o")] == 5
    assert pc[("o", "w")] == 5
    assert pc[("w", "e")] == 2
    assert pc[("e", "r")] == 1
    assert pc[("e", "s")] == 1


def test_apply_merge_is_greedy_left_to_right(spark):
    df = spark.createDataFrame([(["a", "a", "a"],), (["a", "a", "a", "a"],)], "syms array<string>")
    got = [r["m"] for r in df.select(apply_merge(F.col("syms"), "a", "a").alias("m")).collect()]
    assert got == [["aa", "a"], ["aa", "aa"]]
    df2 = spark.createDataFrame([(["x", "a", "b", "a", "b"],)], "syms array<string>")
    got2 = df2.select(apply_merge(F.col("syms"), "a", "b").alias("m")).collect()[0]["m"]
    assert got2 == ["x", "ab", "ab"]


def test_bpe_train_learns_expected_merges_deterministically(spark):
    d = _docs(spark, ["ab ab ab abc", "ab abc abd"])
    merges, seg = bpe_train(word_freqs(d), num_merges=3)
    # 'a b' dominates (freq 5+2+1=8); then 'ab c' (2) ties with 'ab d'(1)? no:
    # counts after merge1: ('ab','c')=2, ('ab','d')=1 -> 'ab c' second
    assert merges[0] == ("a", "b")
    assert ("ab", "c") in merges
    segs = {r["word"]: r["syms"] for r in seg.collect()}
    assert segs["ab"] == ["ab"]
    assert segs["abc"] == ["abc"] or segs["abc"] == ["ab", "c"]
    rerun, _ = bpe_train(word_freqs(d.repartition(7)), num_merges=3)
    assert rerun == merges


def test_bpe_encode_round_trips_and_falls_back(spark):
    train = _docs(spark, ["hello world hello", "world of spark"])
    merges, seg = bpe_train(word_freqs(train), num_merges=8)
    test = _docs(spark, ["Hello unseen world", "spark of WORLD"])
    out = {r["doc_id"]: r for r in bpe_encode(test, seg).collect()}
    # concatenating tokens reproduces the lowercased word sequence
    assert "".join(out[0]["tokens"]) == "hellounseenworld"
    assert "".join(out[1]["tokens"]) == "sparkofworld"
    assert out[0]["n_tokens"] == len(out[0]["tokens"])
    # 'unseen' was never trained: must fall back to characters
    toks0 = out[0]["tokens"]
    assert all(len(t) == 1 for t in toks0 if t in list("unseen")) or "unseen" not in "".join(toks0[:1])


def test_bpe_encode_order_exact_under_repartition(spark):
    texts = [" ".join(f"w{i % 7}tok" for i in range(30))]
    d = _docs(spark, texts)
    _, seg = bpe_train(word_freqs(d), num_merges=5)
    a = bpe_encode(d, seg).collect()[0]["tokens"]
    b = bpe_encode(d.repartition(11), seg, broadcast_vocab=False).collect()[0]["tokens"]
    assert a == b


class TestNode2VecWalks:
    """node2vec biased walks (ops/graph_algs.node2vec_walks)."""

    def _sym_edges(self, spark):
        from pyspark.sql import functions as F

        raw = [(i, (i * 3 + 1) % 11) for i in range(11)] + [
            (i, (i * 5 + 2) % 11) for i in range(11)
        ]
        raw = raw + [(b, a) for a, b in raw]
        return spark.createDataFrame(raw, "src int, dst int")

    def _walks_by_id(self, rows):
        from collections import defaultdict

        seq = defaultdict(dict)
        for r in rows:
            seq[r.walk_id][r.step] = r.node
        return seq

    def test_walks_follow_edges(self, spark):
        from kgspark.ops.graph_algs import node2vec_walks

        e = self._sym_edges(spark)
        adj = {(r.src, r.dst) for r in e.collect() if r.src != r.dst}
        rows = node2vec_walks(e, walk_length=3, num_walks=2).collect()
        for wid, d in self._walks_by_id(rows).items():
            for t in range(1, max(d) + 1):
                if t in d:
                    assert (d[t - 1], d[t]) in adj

    def test_partitioning_invariant(self, spark):
        from kgspark.ops.graph_algs import node2vec_walks

        e = self._sym_edges(spark)
        a = sorted(
            map(
                tuple,
                node2vec_walks(e, walk_length=3, num_walks=2, q_milli=500).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                node2vec_walks(
                    e.repartition(7), walk_length=3, num_walks=2, q_milli=500
                ).collect(),
            )
        )
        assert a == b

    def test_high_p_discourages_backtracking(self, spark):
        from kgspark.ops.graph_algs import node2vec_walks

        e = self._sym_edges(spark)

        def backtracks(pm):
            rows = node2vec_walks(e, walk_length=4, num_walks=3, p_milli=pm).collect()
            n = 0
            for wid, d in self._walks_by_id(rows).items():
                for t in range(2, max(d) + 1):
                    if t in d and t - 2 in d and d[t] == d[t - 2]:
                        n += 1
            return n

        assert backtracks(8000) < backtracks(125)

    def test_salt_redraws(self, spark):
        from kgspark.ops.graph_algs import node2vec_walks

        e = self._sym_edges(spark)
        a = sorted(map(tuple, node2vec_walks(e, walk_length=3, salt="s1").collect()))
        b = sorted(map(tuple, node2vec_walks(e, walk_length=3, salt="s2").collect()))
        assert a != b


def test_bpe_train_local_and_distributed_paths_identical(spark):
    """r04: the merge loop is driver-local by default (2 Spark jobs total);
    the distributed loop is the overflow fallback. Both must learn the
    SAME merges and produce the SAME final segmentation — merges, counts,
    tie-breaks, and the greedy fold all replicated exactly."""
    d = _docs(
        spark,
        [
            "ab ab ab abc low low lower lowest",
            "ab abc abd banana bandana low",
            "newer newest lower lowest wider widest",
        ],
    )
    wf = word_freqs(d)
    m_local, seg_local = bpe_train(wf, num_merges=12, min_freq=2)
    m_dist, seg_dist = bpe_train(wf, num_merges=12, min_freq=2, distributed=True)
    assert m_local == m_dist
    sl = {r["word"]: (r["freq"], r["syms"]) for r in seg_local.collect()}
    sd = {r["word"]: (r["freq"], r["syms"]) for r in seg_dist.collect()}
    assert sl == sd


def test_bpe_train_vocab_overflow_falls_back_to_distributed(spark):
    d = _docs(spark, ["ab ab ab abc", "ab abc abd"])
    wf = word_freqs(d)
    # max_local_vocab=1 forces the fallback; result must be unchanged
    m_fb, seg_fb = bpe_train(wf, num_merges=3, max_local_vocab=1)
    m_loc, seg_loc = bpe_train(wf, num_merges=3)
    assert m_fb == m_loc
    assert {r["word"]: r["syms"] for r in seg_fb.collect()} == {
        r["word"]: r["syms"] for r in seg_loc.collect()
    }
