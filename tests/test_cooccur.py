"""Entity co-occurrence PMI: exact Python replay, per-doc cap excludes
marginals too, min_pairs floor, npmi conventions, partitioning
invariance, validation."""

from __future__ import annotations

import math

import pytest

from kgspark.extract.cooccur import entity_cooccurrence


def _r(c):
    return int(round(math.log(c) * 1000))


def _python_pmi(doc_ents, min_pairs, cap):
    kept = {d: es for d, es in doc_ents.items() if len(es) <= cap}
    nd = len(kept)
    na: dict[str, int] = {}
    nab: dict[tuple[str, str], int] = {}
    for es in kept.values():
        for e in es:
            na[e] = na.get(e, 0) + 1
        ss = sorted(es)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                k = (ss[i], ss[j])
                nab[k] = nab.get(k, 0) + 1
    out = {}
    for (a, b), c in nab.items():
        if c < min_pairs:
            continue
        pmi = _r(c) + _r(nd) - _r(na[a]) - _r(na[b])
        dnm = _r(nd) - _r(c)
        npmi = 1.0 if dnm == 0 else round(pmi / dnm, 6)
        out[(a, b)] = (c, na[a], na[b], nd, pmi, npmi)
    return out


DOCS = {
    0: {"cat", "dog"},
    1: {"cat", "dog"},
    2: {"cat", "dog", "fish"},
    3: {"cat", "fish"},
    4: {"dog"},
    5: {"fish", "cat"},
}


@pytest.fixture(scope="module")
def mentions_df(spark):
    rows = [(d, e) for d, es in DOCS.items() for e in es]
    return spark.createDataFrame(rows, "doc_id long, entity string")


def test_matches_python_replay(spark, mentions_df):
    got = {
        (r["entity_a"], r["entity_b"]): (
            r["n_ab"], r["n_a"], r["n_b"], r["n_docs"],
            r["pmi_milli"], r["npmi"],
        )
        for r in entity_cooccurrence(mentions_df, min_pairs=2).collect()
    }
    assert got == _python_pmi(DOCS, 2, 200)


def test_cap_excludes_marginals_too(spark, mentions_df):
    # cap=2 drops docs 2 entirely: pair (cat, fish) keeps docs 3 and 5,
    # and cat's marginal must NOT count doc 2 either
    out = {
        (r["entity_a"], r["entity_b"]): r
        for r in entity_cooccurrence(
            mentions_df, min_pairs=2, max_entities_per_doc=2
        ).collect()
    }
    expect = _python_pmi(DOCS, 2, 2)
    assert set(out) == set(expect)
    r = out[("cat", "fish")]
    assert (r["n_ab"], r["n_a"], r["n_b"], r["n_docs"]) == expect[("cat", "fish")][:4]


def test_npmi_one_when_pair_everywhere(spark):
    df = spark.createDataFrame(
        [(0, "x"), (0, "y"), (1, "x"), (1, "y")], "doc_id long, entity string"
    )
    rows = entity_cooccurrence(df, min_pairs=1).collect()
    assert len(rows) == 1 and rows[0]["npmi"] == 1.0 and rows[0]["pmi_milli"] == 0


def test_duplicate_mentions_count_once(spark):
    df = spark.createDataFrame(
        [(0, "x"), (0, "x"), (0, "y"), (1, "x"), (1, "y")],
        "doc_id long, entity string",
    )
    rows = entity_cooccurrence(df, min_pairs=1).collect()
    assert rows[0]["n_a"] == 2 and rows[0]["n_ab"] == 2


def test_partitioning_invariance(spark, mentions_df):
    key = lambda r: (r["entity_a"], r["entity_b"])  # noqa: E731
    a = sorted(entity_cooccurrence(mentions_df).collect(), key=key)
    b = sorted(
        entity_cooccurrence(mentions_df.repartition(7)).collect(), key=key
    )
    assert a == b


def test_validation(spark, mentions_df):
    with pytest.raises(ValueError, match="min_pairs"):
        entity_cooccurrence(mentions_df, min_pairs=0)
    with pytest.raises(ValueError, match="max_entities_per_doc"):
        entity_cooccurrence(mentions_df, max_entities_per_doc=1)
