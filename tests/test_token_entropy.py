"""Token entropy: exact Python fixed-point replay, discrimination between
spam and diverse text, single-token convention, and invariance."""

from __future__ import annotations

import math
from collections import Counter

from kgspark.ops.textstats import token_entropy

DOCS = [
    (1, "buy now buy now buy now buy now"),          # low diversity
    (2, "the quick brown fox jumps over lazy dogs"), # all distinct
    (3, "word"),                                     # single token
    (4, "a a a a a a a a a a a a b"),                # heavy skew
    (5, None),                                       # no row emitted
    (6, "  Mixed   CASE  mixed case  "),             # lowering + ws collapse
    (7, "x x x"),                                    # millinat rounding would
    # push raw entropy ~ -3.9e-4 below zero; the clamp keeps the [0,1] contract
]


def _replay(text):
    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    s = sum(c * round(math.log(c) * 1000) for c in Counter(toks).values())
    raw = max(math.log(n) - s / 1000.0 / n, 0.0)
    ent = round(raw, 6)
    norm = 0.0 if n <= 1 else round(raw / math.log(n), 6)
    return n, ent, norm


def test_exact_replay_and_discrimination(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_tokens"], r["entropy"], r["entropy_norm"])
           for r in token_entropy(df).collect()}
    assert 5 not in got
    for doc_id, text in DOCS:
        if text is None:
            continue
        assert got[doc_id] == _replay(text), doc_id
    # discrimination: all-distinct prose ~1.0, binary spam well below
    assert got[2][2] > 0.99
    assert got[1][2] < 0.5
    assert got[4][2] < got[1][2]  # heavier skew, lower norm
    assert got[3] == (1, 0.0, 0.0)
    # case-folding + whitespace collapse: "mixed case" twice each
    assert got[6][0] == 4 and got[6][2] < 1.0
    # clamp: N identical tokens is exactly 0.0, never -0.000388
    assert got[7] == (3, 0.0, 0.0)
    assert all(v[1] >= 0.0 and 0.0 <= v[2] <= 1.0 for v in got.values())


def test_partitioning_invariant(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} tok{i % 7} filler{i}") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, token_entropy(df.repartition(1)).collect()))
    b = sorted(map(tuple, token_entropy(df.repartition(17)).collect()))
    assert a == b
