"""RAKE: exact Python replay of the paper's worked scoring, boundary
semantics, long-phrase drop-after-count, top-k tie-break, partitioning
invariance, validation."""

from __future__ import annotations

from collections import defaultdict

import pytest

from kgspark.ops.rake import rake_keywords


def _python_rake(text, stops, max_phrase_len):
    import re

    phrases = []
    for sent in re.split(r"[.!?]+\s*", text):
        toks = [t for t in re.sub(r"[^a-z0-9]+", " ", sent.lower()).split() if t]
        cur: list[str] = []
        for t in toks:
            if t in stops:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append(cur)
    deg: dict[str, int] = defaultdict(int)
    freq: dict[str, int] = defaultdict(int)
    for p in phrases:
        for t in p:
            deg[t] += len(p)
            freq[t] += 1
    ws = {t: (1000 * deg[t]) // freq[t] for t in deg}
    out: dict[str, tuple[int, int]] = {}
    for p in phrases:
        if len(p) <= max_phrase_len:
            out[" ".join(p)] = (len(p), sum(ws[t] for t in p))
    return out


STOPS = ["the", "of", "and", "a", "in", "is"]
TEXT = (
    "compatibility of systems of linear constraints. "
    "a set of natural numbers is given. "
    "criteria of compatibility of a system of linear constraints considered. "
    "upper bounds for components of a minimal set of solutions given."
)


@pytest.fixture(scope="module")
def doc_df(spark):
    return spark.createDataFrame([(7, TEXT)], "doc_id long, text string")


def test_matches_python_replay(spark, doc_df):
    got = {
        r["phrase"]: (r["n_words"], r["score_milli"])
        for r in rake_keywords(doc_df, stopwords=STOPS).collect()
    }
    assert got == _python_rake(TEXT, set(STOPS), 5)


def test_boundaries(spark):
    # stopword splits within a sentence; sentence boundary splits even
    # without a stopword
    df = spark.createDataFrame(
        [(1, "red car and blue bike. green van")], "doc_id long, text string"
    )
    got = {r["phrase"] for r in rake_keywords(df, stopwords=["and"]).collect()}
    assert got == {"red car", "blue bike", "green van"}


def test_long_phrases_feed_word_stats_but_do_not_surface(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta. alpha")], "doc_id long, text string"
    )
    rows = {
        r["phrase"]: r["score_milli"]
        for r in rake_keywords(df, stopwords=[], max_phrase_len=2).collect()
    }
    # the 4-word run is dropped from the output, but 'alpha' keeps
    # deg = 4 + 1 = 5, freq = 2 -> 2500
    assert rows == {"alpha": 2500}


def test_topk_tiebreak_is_phrase_asc(spark):
    df = spark.createDataFrame(
        [(1, "zz yy. zz yy. aa bb. aa bb.")], "doc_id long, text string"
    )
    rows = rake_keywords(df, stopwords=[], top_k=1).collect()
    assert len(rows) == 1 and rows[0]["phrase"] == "aa bb"


def test_partitioning_invariance(spark, doc_df):
    extra = spark.createDataFrame(
        [(8, "linear constraints of a minimal set. upper bounds given.")],
        "doc_id long, text string",
    )
    docs = doc_df.unionByName(extra)
    key = lambda r: (r["doc_id"], r["phrase"])  # noqa: E731
    a = sorted(rake_keywords(docs, stopwords=STOPS).collect(), key=key)
    b = sorted(
        rake_keywords(docs.repartition(5), stopwords=STOPS).collect(), key=key
    )
    assert a == b


def test_validation(spark, doc_df):
    with pytest.raises(ValueError, match="max_phrase_len"):
        rake_keywords(doc_df, max_phrase_len=0)
    with pytest.raises(ValueError, match="min_token_chars"):
        rake_keywords(doc_df, min_token_chars=0)
    with pytest.raises(ValueError, match="top_k"):
        rake_keywords(doc_df, top_k=0)
