"""ngram_novelty: exact Python replay, duplicated-doc collapse,
within-doc repeats not unique, short-doc omission, invariance."""

from __future__ import annotations

import pytest

from kgspark.ops.curation import ngram_novelty


def _python_novelty(docs, n):
    from collections import Counter

    grams = {}
    for d, t in docs:
        toks = t.lower().split()
        grams[d] = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
    counts = Counter(g for gs in grams.values() for g in gs)
    out = {}
    for d, gs in grams.items():
        if not gs:
            continue
        u = sum(1 for g in gs if counts[g] == 1)
        out[d] = (len(gs), u, (10**6 * u) // len(gs))
    return out


DOCS = [
    (1, "a b c d e f g"),           # shares "a b c d e" with doc 2
    (2, "a b c d e x y"),
    (3, "p q r s t"),               # fully novel
    (4, "m m m m m m"),             # within-doc repeated 5-gram: not unique
    (5, "too short"),               # < 5 tokens: omitted
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_python_replay(spark, docs_df):
    got = {
        r["doc_id"]: (r["n_grams"], r["n_unique"], r["novelty_ppm"])
        for r in ngram_novelty(docs_df, n=5, hash="md5").collect()
    }
    assert got == _python_novelty(DOCS, 5)


def test_semantics(spark, docs_df):
    got = {
        r["doc_id"]: r
        for r in ngram_novelty(docs_df, n=5, hash="md5").collect()
    }
    assert 5 not in got  # short doc omitted
    assert got[3]["novelty_ppm"] == 10**6  # fully novel
    assert got[4]["n_unique"] == 0  # self-repeated grams are not unique
    # the shared prefix gram "a b c d e" is non-unique for both 1 and 2
    assert got[1]["n_unique"] == 2 and got[2]["n_unique"] == 2


def test_xxhash_tier_agrees(spark, docs_df):
    a = sorted(ngram_novelty(docs_df, n=5, hash="md5").collect())
    b = sorted(ngram_novelty(docs_df, n=5, hash="xxhash64").collect())
    assert a == b


def test_partitioning_invariance(spark, docs_df):
    a = sorted(ngram_novelty(docs_df, n=5).collect())
    b = sorted(ngram_novelty(docs_df.repartition(7), n=5).collect())
    assert a == b
