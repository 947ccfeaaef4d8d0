"""Property-based checks for the round-4b curation ops: Bloom
decontamination and DSIR importance weights vs brute-force Python
replays of their exact contracts (the repo's fuzz standard — the oracle
SQL is one independent implementation, this is a second).
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ITER_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

word_st = st.sampled_from(["alpha", "beta", "gamma", "x", "Y", "z9"])
text_st = st.lists(word_st, min_size=0, max_size=12).map(" ".join)

_M_BITS = 1 << 10
_K = 3
_N = 3
_SALT = "bloom-v1"


def _toks(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def _md5_grams(text: str, n: int) -> list[str]:
    t = _toks(text)
    if len(t) < n:
        return []
    return [
        hashlib.md5(" ".join(t[i : i + n]).encode()).hexdigest()
        for i in range(len(t) - n + 1)
    ]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _positions(ng_hex: str) -> list[int]:
    return [_h60(f"{ng_hex}|{j}|{_SALT}") % _M_BITS for j in range(_K)]


@ITER_SLOW
@given(
    eval_texts=st.lists(text_st, min_size=1, max_size=4),
    corpus_texts=st.lists(text_st, min_size=1, max_size=8),
)
def test_bloom_matches_bruteforce(spark, eval_texts, corpus_texts):
    from kgspark.ops.curation import bloom_decontaminate, bloom_words

    ev = spark.createDataFrame(
        [(i, t) for i, t in enumerate(eval_texts)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    words = bloom_words(ev, n=_N, m_bits=_M_BITS, k_hashes=_K)
    got = {
        r["doc_id"]: r["bloom_hits"]
        for r in bloom_decontaminate(
            corpus, words, n=_N, m_bits=_M_BITS, k_hashes=_K
        ).collect()
    }

    bits: set[int] = set()
    for t in eval_texts:
        for g in _md5_grams(t, _N):
            bits.update(_positions(g))
    want = {
        i: sum(1 for g in set(_md5_grams(t, _N)) if all(p in bits for p in _positions(g)))
        for i, t in enumerate(corpus_texts)
    }
    assert got == want


@ITER_SLOW
@given(
    target_texts=st.lists(text_st, min_size=1, max_size=4),
    corpus_texts=st.lists(text_st, min_size=1, max_size=6),
)
def test_dsir_matches_bruteforce(spark, target_texts, corpus_texts):
    from kgspark.ops.curation import dsir_scores

    B = 256
    salt = "dsir-v1"

    def feats(text: str) -> list[int]:
        grams = _md5_grams(text, 1) + _md5_grams(text, 2)
        return [_h60(f"{g}|{salt}") % B for g in grams]

    def counts(texts) -> dict[int, int]:
        c: dict[int, int] = {}
        for t in texts:
            for b in feats(t):
                c[b] = c.get(b, 0) + 1
        return c

    tc, rc = counts(target_texts), counts(corpus_texts)
    r1000 = lambda x: int(round(math.log(x) * 1000))
    llr = {
        b: r1000(tc.get(b, 0) + 1) - r1000(rc.get(b, 0) + 1)
        for b in set(tc) | set(rc)
    }
    const = r1000(sum(rc.values()) + B) - r1000(sum(tc.values()) + B)
    want = {}
    for i, t in enumerate(corpus_texts):
        fs = feats(t)
        want[i] = (len(fs), sum(llr.get(b, 0) for b in fs) + len(fs) * const)

    target = spark.createDataFrame(
        [(i, t) for i, t in enumerate(target_texts)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    out = dsir_scores(corpus, target, n_buckets=B)
    got = {
        r["doc_id"]: (r["n_features"], r["logweight_millinat"])
        for r in out.collect()
    }
    assert got == want
