"""contaminated_spans: planted eval overlap located exactly, islands
merge across adjacent hits, surgical trim keeps the clean remainder,
document-level decontaminate agreement, invariance."""

from __future__ import annotations

import pytest

from kgspark.ops.curation import (
    contaminated_spans,
    decontaminate,
    trim_repeated_spans,
)

# 20 tokens; tokens 6-13 ("q1 .. q8") will be quoted by the eval set
DOC = (
    "w1 w2 w3 w4 w5 q1 q2 q3 q4 q5 q6 q7 q8 w6 w7 w8 w9 w10 w11 w12"
)
CLEAN = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, DOC), (2, CLEAN)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def eval_df(spark):
    return spark.createDataFrame(
        [(100, "q1 q2 q3 q4 q5 q6 q7 q8")], "doc_id long, text string"
    )


def test_span_located_exactly(spark, corpus, eval_df):
    spans = contaminated_spans(corpus, eval_df, n=8, hash="md5").collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"]) for r in spans] == [
        (1, 6, 13)
    ]


def test_adjacent_hits_merge(spark, corpus):
    # eval quotes two overlapping 8-gram windows -> one merged island
    ev = spark.createDataFrame(
        [(0, "q1 q2 q3 q4 q5 q6 q7 q8"), (1, "w5 q1 q2 q3 q4 q5 q6 q7")],
        "doc_id long, text string",
    )
    spans = contaminated_spans(corpus, ev, n=8, hash="md5").collect()
    assert [(r["span_start"], r["span_end"]) for r in spans] == [(5, 13)]


def test_surgical_trim_keeps_remainder(spark, corpus, eval_df):
    spans = contaminated_spans(corpus, eval_df, n=8, hash="md5")
    out = {
        r["doc_id"]: r["text_trimmed"]
        for r in trim_repeated_spans(corpus, spans).collect()
    }
    assert out[1] == "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    assert out[2] == CLEAN


def test_agrees_with_document_level_rule(spark, corpus, eval_df):
    doc_level = {
        r["doc_id"]
        for r in decontaminate(corpus, eval_df, n=8, hash="md5")
        .filter("is_contaminated")
        .collect()
    }
    span_level = {
        r["doc_id"]
        for r in contaminated_spans(corpus, eval_df, n=8, hash="md5").collect()
    }
    assert doc_level == span_level == {1}


def test_partitioning_invariance(spark, corpus, eval_df):
    a = sorted(contaminated_spans(corpus, eval_df, n=8, hash="md5").collect())
    b = sorted(
        contaminated_spans(
            corpus.repartition(7), eval_df, n=8, hash="md5"
        ).collect()
    )
    assert a == b
