"""Property-based checks for ops/textstats.winnow_fingerprints (the
Schleimer-Wilkerson-Aiken winnowing scheme).

Two independent oracles: (1) a brute-force Python replay of the contract
(gram md5s, per-window leftmost min, distinct); (2) the paper's guarantee —
any two documents sharing a run of >= k + w - 1 tokens must share at least
one fingerprint hash.
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

tok_st = st.sampled_from(["aa", "bb", "cc", "dd", "Ee"])
doc_st = st.lists(tok_st, min_size=0, max_size=14).map(" ".join)


def _brute(text, k, w):
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    toks = norm.split(" ")
    if len(toks) < k:
        return set()
    grams = [
        (i + 1, hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest())
        for i in range(len(toks) - k + 1)
    ]
    n = len(grams)
    out = set()
    for s in range(max(n - w + 1, 1)):
        window = grams[s : s + w]
        h = min(x[1] for x in window)
        p = min(p for p, x in window if x == h)
        out.add((p, h))
    return out


@ITER_SLOW
@given(docs=st.lists(doc_st, min_size=1, max_size=6))
def test_winnow_matches_bruteforce(spark, docs):
    from kgspark.ops.textstats import winnow_fingerprints

    k, w = 2, 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id int, text string"
    )
    rows = winnow_fingerprints(df, k=k, w=w, hash="md5").collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    expected = {i: _brute(t, k, w) for i, t in enumerate(docs) if _brute(t, k, w)}
    assert got == expected


def test_winnow_guarantee_shared_run(spark):
    from kgspark.ops.textstats import winnow_fingerprints

    # two docs sharing a k+w-1 = 8-token run must share a fingerprint hash
    shared = "q w e r t y u i"
    df = spark.createDataFrame(
        [(1, "zz xx " + shared + " vv"), (2, shared + " nn mm kk")],
        "doc_id int, text string",
    )
    rows = winnow_fingerprints(df, k=5, w=4, hash="md5").collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2]
