"""Checks for ops/dedup.winnow_containment_pairs (Broder containment over
winnowed fingerprints).

Brute-force oracle: recompute winnowed fingerprint sets in Python (reusing
the replay from test_winnow_r03) and score shared/|smaller| directly.
Example test pins the operator's reason to exist: a short document embedded
verbatim in a much longer one scores containment 1.0 while its Jaccard
resemblance is far below any dedup threshold.
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
doc_st = st.lists(tok_st, min_size=2, max_size=12).map(" ".join)


def _fps(text, k, w):
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
        out.add(min(x[1] for x in grams[s : s + w]))
    return out


def _brute_pairs(docs, k, w, min_ppm, cap):
    sets = {i: _fps(t, k, w) for i, t in docs}
    # boilerplate-guard: drop fps in >cap docs (or <2)
    from collections import Counter

    cnt = Counter(fp for s in sets.values() for fp in s)
    ok = {fp for fp, c in cnt.items() if 2 <= c <= cap}
    out = {}
    ids = sorted(sets)
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            shared = len(sets[a] & sets[b] & ok)
            if not shared or not sets[a] or not sets[b]:
                continue
            ppm = shared * 1_000_000 // min(len(sets[a]), len(sets[b]))
            if ppm >= min_ppm:
                out[(a, b)] = (shared, len(sets[a]), len(sets[b]), ppm)
    return out


@ITER_SLOW
@given(docs=st.lists(doc_st, min_size=2, max_size=6))
def test_containment_matches_bruteforce(spark, docs):
    from kgspark.ops.dedup import winnow_containment_pairs

    k, w, min_ppm, cap = 2, 3, 200_000, 64
    corpus = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(corpus, "doc_id int, text string")
    rows = winnow_containment_pairs(
        df, k=k, w=w, min_containment_ppm=min_ppm, max_bucket_size=cap
    ).collect()
    got = {
        (r["a"], r["b"]): (r["shared"], r["n_a"], r["n_b"], r["containment_ppm"])
        for r in rows
    }
    assert got == _brute_pairs(corpus, k, w, min_ppm, cap)


def test_containment_sees_embedded_doc(spark):
    from kgspark.ops.dedup import winnow_containment_pairs

    inner = "q w e r t y u i o p"
    filler = " ".join(f"f{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, inner), (2, filler + " " + inner)], "doc_id int, text string"
    )
    rows = winnow_containment_pairs(df, min_containment_ppm=900_000).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"]) == (1, 2)
    assert r["containment_ppm"] == 1_000_000  # fully contained...
    # ...while resemblance (shared/union) is tiny — resemblance dedup
    # could never flag this pair at any sane threshold
    union = r["n_a"] + r["n_b"] - r["shared"]
    assert r["shared"] / union < 0.15
