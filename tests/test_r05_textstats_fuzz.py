"""Property-based cross-checks for the text-quality tier added in round 4b
(Stupid Backoff LM, A-ES weighted sampling keys, sentence segmentation,
token entropy) — exact Python replays of the documented integer-arithmetic
contracts over Hypothesis-generated random corpora."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ITER_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

VOCAB = ["aa", "bb", "cc", "dd", "the"]

docs_st = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _r1000(c: float) -> int:
    """Spark F.round HALF_UP at scale 0 of 1000*ln(c)."""
    return int(
        Decimal(repr(math.log(c) * 1000)).quantize(Decimal("1"), ROUND_HALF_UP)
    )


def _python_backoff(doc_texts, model_texts, alpha_milli=400):
    ln_alpha = round(math.log(alpha_milli / 1000.0) * 1000)
    mtoks = [t.lower().split() for t in model_texts]
    uni: Counter = Counter(t for toks in mtoks for t in toks)
    big: Counter = Counter(
        (toks[i - 1], toks[i]) for toks in mtoks for i in range(1, len(toks))
    )
    C = sum(uni.values())
    out = {}
    for i, text in enumerate(doc_texts):
        toks = text.lower().split()
        ssum = nc = backoff = 0
        for pos, term in enumerate(toks, start=1):
            cu = uni.get(term, 1)
            if pos == 1:
                ssum += _r1000(cu)
                nc += 1
            else:
                cb = big.get((toks[pos - 2], term))
                if cb is not None:
                    ssum += _r1000(cb) - _r1000(uni[toks[pos - 2]])
                else:
                    ssum += ln_alpha + _r1000(cu)
                    nc += 1
                    backoff += 1
        out[i] = (len(toks), backoff, ssum - nc * _r1000(C))
    return out


@ITER_SLOW
@given(doc_texts=docs_st, model_texts=docs_st)
def test_stupid_backoff_matches_replay(spark, doc_texts, model_texts):
    from kgspark.ops.textstats import stupid_backoff_logprob

    docs = spark.createDataFrame(list(enumerate(doc_texts)), "doc_id long, text string")
    model = spark.createDataFrame(
        list(enumerate(model_texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["backoff_tokens"], r["logprob_millinat"])
        for r in stupid_backoff_logprob(docs, model_docs=model).collect()
    }
    assert got == _python_backoff(doc_texts, model_texts)


weights_st = st.lists(
    st.one_of(
        st.none(),
        st.just(float("nan")),
        st.floats(allow_nan=False, allow_infinity=False, min_value=-5, max_value=1e6),
        st.integers(0, 10**6),
    ),
    min_size=1,
    max_size=30,
)


@ITER_SLOW
@given(weights=weights_st)
def test_weighted_sample_keys_match_replay(spark, weights):
    from kgspark.ops.sample import weighted_sample_keys

    rows = [(i, None if w is None else float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r["id"]: r["wsample_key"] for r in weighted_sample_keys(df, "w", "id").collect()}

    valid = {
        i: w
        for i, w in rows
        if w is not None and not math.isnan(w) and w > 0
    }
    if not valid:
        assert all(v is None for v in got.values())
        return
    wmax = max(valid.values())
    udenom = 1_000_000_000_000
    for i, w in rows:
        if i not in valid:
            assert got[i] is None
            continue
        h = int(hashlib.md5(f"{i}|wsample-v1".encode()).hexdigest()[:15], 16)
        u = (h % udenom + 0.5) / float(udenom)
        wn = max(w / wmax, 1.0e-8)
        key = math.log(u) / wn * 1e9
        want = int(Decimal(repr(key)).quantize(Decimal("1"), ROUND_HALF_UP))
        # the ln/div/mul chain may differ by a few ulps between the JVM
        # and CPython libm; ulps scale with the key magnitude (observed: 2
        # units at |key| ~ 8e15), so the tolerance is relative
        assert abs(got[i] - want) <= max(2, int(abs(want) * 1e-14)), (i, got[i], want)


text_st = st.text(
    alphabet=list("abc .!?\t\n") + ["\x01", "\x07"], min_size=0, max_size=60
)


def _python_sentences(text):
    s = re.sub(r"[\x00-\x08\x0e-\x1f\x7f]", "", text)
    s = re.sub(r"\s+", " ", s).strip()
    s = re.sub(r"([.!?]+) ", "\\1\x01", s)
    kept = [p for p in s.split("\x01") if p.strip() != ""]
    return list(enumerate(kept))


@ITER_SLOW
@given(texts=st.lists(text_st, min_size=1, max_size=6))
def test_split_sentences_matches_regex_replay(spark, texts):
    from kgspark.ops.textstats import split_sentences

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["sent_id"], r["sentence"])
        for r in split_sentences(df).collect()
    )
    want = sorted(
        (i, sid, sent) for i, t in enumerate(texts) for sid, sent in _python_sentences(t)
    )
    assert got == want


@ITER_SLOW
@given(texts=st.lists(docs_st.map(lambda d: " ".join(d)), min_size=1, max_size=6))
def test_token_entropy_matches_replay_random_docs(spark, texts):
    from kgspark.ops.textstats import token_entropy

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["entropy"], r["entropy_norm"])
        for r in token_entropy(df).collect()
    }
    for i, text in enumerate(texts):
        toks = [t for t in text.lower().split() if t]
        n = len(toks)
        s = sum(c * round(math.log(c) * 1000) for c in Counter(toks).values())
        raw = max(math.log(n) - s / 1000.0 / n, 0.0)
        ent = round(raw, 6)
        norm = 0.0 if n <= 1 else round(raw / math.log(n), 6)
        assert got[i] == (n, ent, norm), i
