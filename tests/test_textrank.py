"""TextRank: exact Python PageRank replay, hand-built graph semantics,
overlap-edge construction, token-df cap, top-k ordering, partitioning
invariance, validation."""

from __future__ import annotations

import pytest

from kgspark.ops.textrank import sentence_overlap_edges, textrank_sentences

SCALE = 10**12
D_PCT = 85


def _python_textrank(sent_tokens: dict[int, set[str]], min_overlap, iters):
    """Brute-force replay of the integer fixed point for one document."""
    ids = sorted(sent_tokens)
    n = len(ids)
    edges: dict[int, list[int]] = {i: [] for i in ids}
    for i in ids:
        for j in ids:
            if i < j and len(sent_tokens[i] & sent_tokens[j]) >= min_overlap:
                edges[i].append(j)
                edges[j].append(i)
    r = {i: SCALE // n for i in ids}
    for _ in range(iters):
        contrib = {i: 0 for i in ids}
        for i in ids:
            if edges[i]:
                for j in edges[i]:
                    contrib[j] += r[i] // len(edges[i])
        dangling = sum(r[i] for i in ids if not edges[i])
        r = {
            i: ((100 - D_PCT) * SCALE) // (100 * n)
            + (D_PCT * (contrib[i] + dangling // n)) // 100
            for i in ids
        }
    return r


@pytest.fixture(scope="module")
def doc_df(spark):
    # two sentences about cats link to each other; the dog sentence and
    # the isolated one hang off / float free
    text = (
        "black cat sat on the mat today. "
        "the black cat likes the red mat. "
        "a brown dog likes the red mat. "
        "quantum flux capacitors hum quietly."
    )
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_matches_python_replay(spark, doc_df):
    out = {
        r["sent_id"]: r["rank_units"]
        for r in textrank_sentences(doc_df, min_overlap=2, max_iter=4).collect()
    }
    toks = {
        0: {"black", "cat", "sat", "on", "the", "mat", "today"},
        1: {"the", "black", "cat", "likes", "red", "mat"},
        2: {"brown", "dog", "likes", "the", "red", "mat"},
        3: {"quantum", "flux", "capacitors", "hum", "quietly"},
    }
    toks = {k: {t for t in v if len(t) >= 2} for k, v in toks.items()}
    assert out == _python_textrank(toks, 2, 4)


def test_ranks_sum_to_scale_per_doc(spark, doc_df):
    total = sum(
        r["rank_units"]
        for r in textrank_sentences(doc_df, min_overlap=2, max_iter=3).collect()
    )
    # floor-division loss only: within n_sentences * (iters+2) units
    assert SCALE - 4 * 6 <= total <= SCALE


def test_overlap_edges_and_cap(spark):
    sents = spark.createDataFrame(
        [
            (0, 0, "alpha beta gamma"),
            (0, 1, "alpha beta delta"),
            (0, 2, "alpha epsilon zeta"),
            (1, 0, "alpha beta gamma"),  # other doc: never pairs across
        ],
        "doc_id long, sent_id int, sentence string",
    )
    got = {
        (r["doc_id"], r["src"], r["dst"])
        for r in sentence_overlap_edges(sents, min_overlap=2).collect()
    }
    assert got == {(0, 0, 1), (0, 1, 0)}
    # cap at 2: 'alpha' (in 3 sentences) is dropped, so no pair reaches
    # 2 shared tokens any more
    assert (
        sentence_overlap_edges(sents, min_overlap=2, max_token_sents=2).count() == 0
    )


def test_topk_order_and_tiebreak(spark, doc_df):
    rows = textrank_sentences(doc_df, min_overlap=2, max_iter=3, top_k=2).collect()
    assert len(rows) == 2
    by_rn = sorted(rows, key=lambda r: r["rn"])
    assert by_rn[0]["rank_units"] >= by_rn[1]["rank_units"]
    if by_rn[0]["rank_units"] == by_rn[1]["rank_units"]:
        assert by_rn[0]["sent_id"] < by_rn[1]["sent_id"]


def test_partitioning_invariance(spark, doc_df):
    docs = doc_df.unionByName(
        spark.createDataFrame(
            [(1, "red mat here. red mat there. something else entirely.")],
            "doc_id long, text string",
        )
    )
    a = textrank_sentences(docs, min_overlap=2, max_iter=3)
    b = textrank_sentences(docs.repartition(7), min_overlap=2, max_iter=3)
    key = lambda r: (r["doc_id"], r["sent_id"])  # noqa: E731
    assert sorted(a.collect(), key=key) == sorted(b.collect(), key=key)


def test_validation(spark, doc_df):
    with pytest.raises(ValueError, match="max_iter"):
        textrank_sentences(doc_df, max_iter=0)
    with pytest.raises(ValueError, match="damping"):
        textrank_sentences(doc_df, damping=0.851)
    with pytest.raises(ValueError, match="min_overlap"):
        textrank_sentences(doc_df, min_overlap=0)
    with pytest.raises(ValueError, match="top_k"):
        textrank_sentences(doc_df, top_k=0)
    with pytest.raises(ValueError, match="max_token_sents"):
        textrank_sentences(doc_df, max_token_sents=1)
