"""Bloom-filter decontamination + DSIR importance weights (round-4b).

Planted-case semantics plus the engine-portability invariants the rest of
the curation tier holds: deterministic under repartitioning, config-guarded
artifacts, NULL-text handling.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark.ops.curation import (
    bloom_decontaminate,
    bloom_words,
    decontaminate,
    dsir_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- bloom ------------------------------------------------------------------


def test_bloom_flags_planted_overlap(spark):
    ev = _docs(spark, [(1, "alpha beta gamma delta")])
    corpus = _docs(
        spark,
        [
            (10, "x alpha beta gamma y"),  # shares the 3-gram "alpha beta gamma"
            (11, "nothing shared here at all"),
            (12, None),
        ],
    )
    words = bloom_words(ev, n=3, m_bits=1 << 12, k_hashes=3)
    out = bloom_decontaminate(corpus, words, n=3, m_bits=1 << 12, k_hashes=3)
    got = {r["doc_id"]: (r["bloom_hits"], r["maybe_contaminated"]) for r in out.collect()}
    assert got[10][0] >= 1 and got[10][1] is True
    assert got[12] == (0, False)  # NULL text is definitely clean


def test_bloom_is_superset_of_exact(spark):
    # No false NEGATIVES ever: every exact contamination is a bloom hit,
    # even with a deliberately tiny (collision-heavy) filter.
    rows = [(i, f"tok{i} tok{i + 1} tok{i + 2} tok{i + 3}") for i in range(40)]
    ev = _docs(spark, rows[:10])
    corpus = _docs(spark, rows)
    words = bloom_words(ev, n=3, m_bits=256, k_hashes=2)
    b = bloom_decontaminate(corpus, words, n=3, m_bits=256, k_hashes=2)
    e = decontaminate(corpus, ev, n=3, hash="md5")
    joined = b.select("doc_id", "maybe_contaminated").join(
        e.select("doc_id", "is_contaminated"), "doc_id"
    )
    assert joined.filter(F.col("is_contaminated") & ~F.col("maybe_contaminated")).count() == 0
    # and the tiny filter really does fire on the planted overlap docs
    assert b.filter("maybe_contaminated").count() >= 10


def test_bloom_config_guard(spark):
    ev = _docs(spark, [(1, "a b c d e")])
    words = bloom_words(ev, n=3, m_bits=1 << 12, k_hashes=3)
    with pytest.raises(ValueError, match="config mismatch"):
        bloom_decontaminate(_docs(spark, [(2, "a b c")]), words, n=3, m_bits=1 << 12, k_hashes=4)


def test_bloom_validation(spark):
    ev = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="m_bits"):
        bloom_words(ev, m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_words(ev, m_bits=64, k_hashes=0)


def test_bloom_partitioning_stable(spark):
    rows = [(i, f"w{i} w{i + 1} w{i + 2} shared tail tokens") for i in range(30)]
    ev = _docs(spark, rows[:5])
    corpus = _docs(spark, rows)
    words = bloom_words(ev, n=3, m_bits=1 << 10, k_hashes=3)
    a = bloom_decontaminate(corpus, words, n=3, m_bits=1 << 10, k_hashes=3)
    b = bloom_decontaminate(
        corpus.repartition(7), words, n=3, m_bits=1 << 10, k_hashes=3
    )
    assert sorted(map(tuple, a.select("doc_id", "bloom_hits").collect())) == sorted(
        map(tuple, b.select("doc_id", "bloom_hits").collect())
    )


# --- dsir ---------------------------------------------------------------


def test_dsir_ranks_target_like_docs_higher(spark):
    target = _docs(spark, [(100 + i, "medical trial dosage patient outcome") for i in range(5)])
    corpus = _docs(
        spark,
        [
            (1, "medical trial dosage patient outcome"),  # exactly target-like
            (2, "football score match goal referee"),  # disjoint from target
            (3, None),
        ],
    )
    out = dsir_scores(corpus, target, n_buckets=4096)
    got = {r["doc_id"]: (r["n_features"], r["logweight_millinat"]) for r in out.collect()}
    assert got[1][1] > got[2][1]
    assert got[3] == (0, 0)  # NULL text scores zero


def test_dsir_raw_defaults_to_corpus_and_is_deterministic(spark):
    corpus = _docs(spark, [(i, f"tok{i % 7} tok{(i + 1) % 7} filler") for i in range(40)])
    target = _docs(spark, [(999, "tok0 tok1 filler")])
    a = dsir_scores(corpus, target, n_buckets=2048).select(
        "doc_id", "logweight_millinat"
    )
    b = dsir_scores(corpus.repartition(9), target, n_buckets=2048).select(
        "doc_id", "logweight_millinat"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dsir_validation(spark):
    corpus = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_scores(corpus, corpus, n_buckets=1)
