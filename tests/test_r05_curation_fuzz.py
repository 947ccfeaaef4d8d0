"""Property-based cross-checks for the curation tier (Flesch readability,
leakage-safe splits, surgical span decontamination) — exact Python replays
over Hypothesis-generated random corpora."""

from __future__ import annotations

import hashlib
import math
import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ITER_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["table", "tsk", "queue", "a", "bcd", "name", "slowly", "idea", "xyzzy"]
texts_st = st.lists(
    st.one_of(
        st.just(""),
        st.lists(
            st.sampled_from(WORDS + [".", "!?", "up.", "end!"]),
            min_size=1,
            max_size=15,
        ).map(" ".join),
    ),
    min_size=1,
    max_size=6,
)


def _round0(x: float) -> int:
    return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))


def _python_readability(text):
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    n_words = 0 if norm == "" else len(norm.split(" "))
    n_sentences = max(len(re.findall(r"[.!?]+", norm)), 1)
    if norm == "":
        n_syll = 0
    else:
        n_syll = 0
        for w in norm.split(" "):
            groups = len(re.findall(r"[aeiouy]+", w))
            silent_e = 1 if re.search(r"[b-df-km-np-tv-z]e$", w) else 0
            n_syll += max(groups - silent_e, 1)
    flesch = (
        None
        if n_words == 0
        else _round0(
            (206.835 - 1.015 * n_words / n_sentences - 84.6 * n_syll / n_words) * 1000
        )
    )
    return n_words, n_sentences, n_syll, flesch


@ITER_SLOW
@given(texts=texts_st)
def test_readability_matches_replay(spark, texts):
    from kgspark.ops.textstats import readability_stats

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_sentences"], r["n_syllables"], r["flesch_milli"])
        for r in readability_stats(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _python_readability(t), (i, t)


def _bucket(key: str, salt: str = "split-v1") -> int:
    return int(hashlib.md5(f"{key}|{salt}".encode()).hexdigest()[:15], 16) % 100


@ITER_SLOW
@given(
    ids=st.lists(st.integers(0, 40), min_size=1, max_size=25, unique=True),
    cluster_of=st.dictionaries(st.integers(0, 40), st.integers(0, 5), max_size=20),
    val_pct=st.integers(0, 20),
    test_pct=st.integers(0, 20),
)
def test_leakage_safe_split_matches_replay(spark, ids, cluster_of, val_pct, test_pct):
    from kgspark.ops.curation import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    clusters = spark.createDataFrame(
        list(cluster_of.items()) or [(999999, 0)], "doc_id long, cluster long"
    )
    out = leakage_safe_split(
        docs, clusters, val_pct=val_pct, test_pct=test_pct
    ).collect()
    got = {r["doc_id"]: (r["cluster"], r["split"]) for r in out}
    by_cluster: dict[str, set] = {}
    for i in ids:
        ckey = str(cluster_of[i]) if i in cluster_of else str(i)
        b = _bucket(ckey)
        split = "val" if b < val_pct else ("test" if b < val_pct + test_pct else "train")
        assert got[i] == (ckey, split), (i, got[i], ckey, split)
        by_cluster.setdefault(ckey, set()).add(split)
    # the leakage-safety invariant itself: one split per cluster
    assert all(len(s) == 1 for s in by_cluster.values())


gram_texts_st = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=14).map(
        " ".join
    ),
    min_size=1,
    max_size=5,
)


def _python_spans(corpus_texts, eval_texts, n):
    ev = set()
    for t in eval_texts:
        toks = [x for x in re.sub(r"\s+", " ", t.lower()).strip().split(" ") if x]
        for i in range(len(toks) - n + 1):
            ev.add(" ".join(toks[i : i + n]))
    out = []
    for doc_id, t in enumerate(corpus_texts):
        toks = [x for x in re.sub(r"\s+", " ", t.lower()).strip().split(" ") if x]
        hits = [
            i + 1
            for i in range(len(toks) - n + 1)
            if " ".join(toks[i : i + n]) in ev
        ]
        # gaps-and-islands merge: hit at pos p covers [p, p+n-1]; a new
        # island starts when pos > prev_max_end + 1
        start = prev_end = None
        for p in hits:
            if start is None:
                start, prev_end = p, p + n - 1
            elif p > prev_end + 1:
                out.append((doc_id, start, prev_end))
                start, prev_end = p, p + n - 1
            else:
                prev_end = max(prev_end, p + n - 1)
        if start is not None:
            out.append((doc_id, start, prev_end))
    return sorted(out)


@ITER_SLOW
@given(corpus_texts=gram_texts_st, eval_texts=gram_texts_st, n=st.integers(2, 4))
def test_contaminated_spans_matches_replay(spark, corpus_texts, eval_texts, n):
    from kgspark.ops.curation import contaminated_spans

    corpus = spark.createDataFrame(
        list(enumerate(corpus_texts)), "doc_id long, text string"
    )
    ev = spark.createDataFrame(list(enumerate(eval_texts)), "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in contaminated_spans(corpus, ev, n=n, hash="md5").collect()
    )
    assert got == _python_spans(corpus_texts, eval_texts, n)
