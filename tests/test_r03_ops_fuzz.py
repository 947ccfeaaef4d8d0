"""Property-based checks for the round-3 operators.

Hypothesis generates random graphs / word documents / group layouts; each
Spark operator must equal a direct brute-force Python replay of its
contract — the same independent-oracle discipline as the canonicalization
fuzz (tests/test_canonicalize_fuzz.py), aimed at the combinatorial corners
(degenerate graphs, sub-n documents, single-group corpora) the example
tests can't enumerate.
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_st = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=40
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
doc_st = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join)


@SLOW
@given(edges=edges_st)
def test_triangle_count_matches_bruteforce(spark, edges):
    from kgspark.ops.graph_algs import triangle_count

    adj = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in adj for n in e})
    expected = {n: 0 for n in nodes}
    for x, y, z in combinations(nodes, 3):
        if (x, y) in adj and (y, z) in adj and (x, z) in adj:
            expected[x] += 1
            expected[y] += 1
            expected[z] += 1

    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == expected


@SLOW
@given(
    corpus=st.lists(doc_st, min_size=0, max_size=8),
    ev=st.lists(doc_st, min_size=0, max_size=4),
    n=st.integers(2, 4),
)
def test_decontaminate_matches_bruteforce(spark, corpus, ev, n):
    from kgspark.ops.curation import decontaminate

    def grams(text):
        toks = [t for t in text.lower().split() if t]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    eval_grams = set().union(*(grams(t) for t in ev)) if ev else set()
    expected = {
        i: len(grams(t) & eval_grams) for i, t in enumerate(corpus)
    }

    cdf = spark.createDataFrame(
        list(enumerate(corpus)) or [(0, None)], "doc_id long, text string"
    )
    edf = spark.createDataFrame(
        list(enumerate(ev)) or [(0, None)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["contaminated_ngrams"]
        for r in decontaminate(cdf, edf, n=n).collect()
    }
    if corpus:
        assert got == expected
    else:
        assert got == {0: 0}  # the placeholder null-text row stays clean


@SLOW
@given(
    layout=st.lists(st.integers(1, 30), min_size=1, max_size=4),
    alpha=st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]),
)
def test_resample_temperature_matches_bruteforce(spark, layout, alpha):
    """Thresholds equal the closed-form rate; membership equals a direct
    md5 replay; alpha=1 keeps everything regardless of layout."""
    import hashlib

    from kgspark.ops.curation import resample_temperature

    rows = []
    nid = 0
    for g, size in enumerate(layout):
        for _ in range(size):
            rows.append((nid, f"g{g}"))
            nid += 1
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = resample_temperature(df, "grp", "doc_id", alpha=alpha).collect()

    n_min = min(layout)
    for r in out:
        size = layout[int(r["grp"][1:])]
        rate = round((n_min / size) ** (1.0 - alpha), 6)
        assert r["accept_ppm"] == min(1_000_000, int(rate * 1_000_000))
        h = int(hashlib.md5(f"{r['doc_id']}|mix-v1".encode()).hexdigest()[:15], 16)
        assert r["is_kept"] == (h % 1_000_000 < r["accept_ppm"])
        if alpha == 1.0:
            assert r["is_kept"]


@SLOW
@given(
    texts=st.lists(doc_st, min_size=0, max_size=6),
    n=st.integers(2, 3),
)
def test_ngram_hashes_md5_matches_python(spark, texts, n):
    """The portable md5 n-gram column equals hashlib over the same
    whitespace-normalized lowercase windows (the contract the DuckDB
    oracle relies on)."""
    import hashlib

    from kgspark.ops.curation import ngram_hashes

    df = spark.createDataFrame(
        list(enumerate(texts)) or [(0, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", ngram_hashes(F.col("text"), n=n, hash="md5").alias("h")
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split() if w]
        expected = [
            hashlib.md5(" ".join(toks[j : j + n]).encode()).hexdigest()
            for j in range(len(toks) - n + 1)
        ]
        assert got[i] == expected


@SLOW
@given(
    corpus=st.lists(doc_st, min_size=1, max_size=6),
    n=st.integers(2, 3),
    min_count=st.integers(2, 3),
)
def test_repeated_spans_matches_bruteforce(spark, corpus, n, min_count):
    from kgspark.ops.curation import repeated_spans, trim_repeated_spans

    docs_toks = [[w for w in t.lower().split() if w] for t in corpus]
    from collections import Counter

    counts = Counter()
    for toks in docs_toks:
        for i in range(len(toks) - n + 1):
            counts[" ".join(toks[i : i + n])] += 1

    expected_spans = {}
    expected_trim = {}
    for d, toks in enumerate(docs_toks):
        hits = [
            i + 1
            for i in range(len(toks) - n + 1)
            if counts[" ".join(toks[i : i + n])] >= min_count
        ]
        spans = []
        for pos in hits:  # gaps-and-islands merge, intervals [pos, pos+n-1]
            if spans and pos <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], pos + n - 1)
            else:
                spans.append([pos, pos + n - 1])
        expected_spans[d] = sorted(map(tuple, spans))
        masked = {i for s, e in spans for i in range(s, e + 1)}
        expected_trim[d] = " ".join(
            t for j, t in enumerate(toks, start=1) if j not in masked
        )

    df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    sp = repeated_spans(df, n=n, min_count=min_count)
    got = {}
    for r in sp.collect():
        got.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    got = {k: sorted(v) for k, v in got.items()}
    assert got == {d: v for d, v in expected_spans.items() if v}

    trimmed = {r["doc_id"]: r["text_trimmed"] for r in trim_repeated_spans(df, sp).collect()}
    assert trimmed == expected_trim
