"""mention_snippets (KWIC): exact Python replay of offsets/contexts,
occurrence-count agreement with detect_mentions' n_hits convention,
regex-metachar aliases as literals, edge clipping, invariance,
validation."""

from __future__ import annotations

import pytest

from kgspark.extract.mentions import detect_mentions, mention_snippets


def _python_kwic(text, alias, window):
    out, start = [], 0
    while True:
        pos = text.find(alias, start)
        if pos < 0:
            break
        out.append(
            (pos, text[max(0, pos - window) : pos],
             text[pos + len(alias) : pos + len(alias) + window])
        )
        start = pos + len(alias)  # non-overlapping, left to right
    return out


TEXT = "the spark engine sparks sparkly sparks again and spark"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([("d1", TEXT)], "url string, text string")


@pytest.fixture(scope="module")
def aliases(spark):
    return spark.createDataFrame(
        [("spark", "T", "spark"), ("a.b", "T", "x")],
        "alias string, label string, name string",
    )


def test_matches_python_replay(spark, docs, aliases):
    got = sorted(
        (r["pos"], r["left_ctx"], r["right_ctx"])
        for r in mention_snippets(docs, aliases, window=8).collect()
    )
    assert got == sorted(_python_kwic(TEXT, "spark", 8))


def test_occurrences_agree_with_n_hits(spark, docs, aliases):
    n_hits = detect_mentions(docs, aliases).collect()[0]["n_hits"]
    n_snips = mention_snippets(docs, aliases).count()
    assert n_snips == n_hits == 5


def test_metachar_alias_is_literal(spark, aliases):
    d = spark.createDataFrame(
        [("d2", "xa.bx and a.b plus a0b")], "url string, text string"
    )
    rows = [
        r for r in mention_snippets(d, aliases, window=5).collect()
        if r["alias"] == "a.b"
    ]
    assert sorted(r["pos"] for r in rows) == [1, 10]  # a0b NOT matched


def test_edge_clipping(spark, aliases):
    d = spark.createDataFrame([("d3", "spark")], "url string, text string")
    r = mention_snippets(d, aliases, window=10).collect()[0]
    assert (r["pos"], r["left_ctx"], r["right_ctx"]) == (0, "", "")


def test_partitioning_invariance(spark, docs, aliases):
    more = docs.unionByName(
        spark.createDataFrame(
            [("d4", "spark here and a.b there")], "url string, text string"
        )
    )
    key = lambda r: (r["url"], r["alias"], r["pos"])  # noqa: E731
    a = sorted(mention_snippets(more, aliases).collect(), key=key)
    b = sorted(
        mention_snippets(more.repartition(5), aliases).collect(), key=key
    )
    assert a == b


def test_validation(spark, docs, aliases):
    with pytest.raises(ValueError, match="window"):
        mention_snippets(docs, aliases, window=0)
