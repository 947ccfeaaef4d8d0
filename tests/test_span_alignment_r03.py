"""Checks for ops/dedup.shared_span_alignment (diagonal gaps-and-islands
alignment of shared winnowed fingerprints for verified pairs).

Brute-force oracle replays the whole contract in Python: winnow with
positions, per-pair shared-fp position cross-product, grouping by diagonal
(pos_b - pos_a), island merge with the k+w-1 gap rule. Example test plants
a known shared run at DIFFERENT offsets in two documents and asserts the
reported spans point at it on both sides.
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ITER_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

tok_st = st.sampled_from(["aa", "bb", "cc", "dd"])
doc_st = st.lists(tok_st, min_size=2, max_size=10).map(" ".join)


def _fp_positions(text, k, w):
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    toks = norm.split(" ")
    if len(toks) < k:
        return set()
    grams = [
        (i + 1, hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest())
        for i in range(len(toks) - k + 1)
    ]
    out = set()
    for s in range(max(len(grams) - w + 1, 1)):
        window = grams[s : s + w]
        h = min(x[1] for x in window)
        p = min(p for p, x in window if x == h)
        out.add((p, h))
    return out


def _brute_spans(docs, pairs, k, w):
    max_gap = k + w - 1
    fps = {i: _fp_positions(t, k, w) for i, t in docs}
    out = set()
    for a, b in pairs:
        hits = {}
        for pa, ha in fps[a]:
            for pb, hb in fps[b]:
                if ha == hb:
                    hits.setdefault(pb - pa, []).append(pa)
        for diag, poss in hits.items():
            poss = sorted(set(poss))
            start = prev = poss[0]
            runs = []
            for p in poss[1:]:
                if p - prev > max_gap:
                    runs.append((start, prev))
                    start = p
                prev = p
            runs.append((start, prev))
            for s, e in runs:
                n = len([p for p in poss if s <= p <= e])
                out.add((a, b, s, e + k - 1, s + diag, e + k - 1 + diag, n))
    return out


@ITER_SLOW
@given(docs=st.lists(doc_st, min_size=2, max_size=5))
def test_alignment_matches_bruteforce(spark, docs):
    from kgspark.ops.dedup import shared_span_alignment

    k, w = 2, 3
    corpus = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(corpus, "doc_id int, text string")
    # align EVERY a<b pair — exercises empty overlaps too
    ids = [i for i, _ in corpus]
    pair_rows = [(a, b) for x, a in enumerate(ids) for b in ids[x + 1 :]]
    pairs = spark.createDataFrame(pair_rows, "a int, b int")
    got = {
        (r["a"], r["b"], r["a_start"], r["a_end"], r["b_start"], r["b_end"], r["n_fps"])
        for r in shared_span_alignment(df, pairs, k=k, w=w).collect()
    }
    assert got == _brute_spans(corpus, pair_rows, k, w)


def test_alignment_finds_planted_run(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from kgspark.ops.dedup import shared_span_alignment

    shared = " ".join(f"s{i}" for i in range(20))  # 20-token shared run
    pre_a = " ".join(f"a{i}" for i in range(10))  # run starts at token 11 in a
    pre_b = " ".join(f"b{i}" for i in range(30))  # ...and token 31 in b
    df = spark.createDataFrame(
        [(1, pre_a + " " + shared), (2, pre_b + " " + shared + " tail0 tail1")],
        "doc_id int, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "a int, b int")
    rows = shared_span_alignment(df, pairs, k=5, w=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["b_start"] - r["a_start"] == 20  # the planted offset
    # the span lies inside the shared run on both sides (token indices)
    assert 11 <= r["a_start"] <= r["a_end"] <= 30
    assert 31 <= r["b_start"] <= r["b_end"] <= 50
