"""Property-based checks for the round-4b operators (RAKE, n-gram
novelty, entity PMI, KWIC, graph_stats, event transitions).

Same independent-oracle discipline as tests/test_r03_ops_fuzz.py:
Hypothesis generates random token streams / mention tables / graphs;
each Spark operator must equal a direct brute-force Python replay of
its contract, hitting the degenerate corners (all-stopword docs,
empty overlaps, self-loops, duplicate mentions, tie piles) the example
tests can't enumerate.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal


def _round6(x: float) -> float:
    """Spark's F.round semantics (java BigDecimal HALF_UP over the double's
    shortest decimal repr) — Python's round() is banker's and diverges on
    exact ties like 406/1792 = 0.2265625 (found by the PMI fuzz)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ITER_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

VOCAB = ["aa", "bb", "cc", "the", "of"]
STOPS = ["the", "of"]

docs_st = st.lists(
    st.lists(st.sampled_from(VOCAB + ["."]), min_size=1, max_size=25).map(
        lambda ts: " ".join(ts).replace(" .", ".")
    ),
    min_size=1,
    max_size=5,
)


def _rake_python(text, stops, max_phrase_len=5):
    phrases = []
    for sent in re.split(r"[.!?]+\s*", text):
        toks = [t for t in re.sub(r"[^a-z0-9]+", " ", sent.lower()).split() if t]
        cur: list[str] = []
        for t in toks:
            if t in stops:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append(cur)
    deg: dict[str, int] = defaultdict(int)
    freq: dict[str, int] = defaultdict(int)
    for p in phrases:
        for t in p:
            deg[t] += len(p)
            freq[t] += 1
    ws = {t: (1000 * deg[t]) // freq[t] for t in deg}
    out = {}
    for p in phrases:
        if len(p) <= max_phrase_len:
            out[" ".join(p)] = (len(p), sum(ws[t] for t in p))
    return out


@ITER_SLOW
@given(texts=docs_st)
def test_rake_matches_bruteforce(spark, texts):
    from kgspark.ops.rake import rake_keywords

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict = defaultdict(dict)
    for r in rake_keywords(df, stopwords=STOPS).collect():
        got[r["doc_id"]][r["phrase"]] = (r["n_words"], r["score_milli"])
    for d, t in enumerate(texts):
        assert got.get(d, {}) == _rake_python(t, set(STOPS))


@ITER_SLOW
@given(texts=docs_st, n=st.integers(2, 4))
def test_novelty_matches_bruteforce(spark, texts, n):
    from kgspark.ops.curation import ngram_novelty

    # novelty operates on whitespace tokens of the lowered text
    toksets = {
        d: t.lower().split() for d, t in enumerate(texts)
    }
    grams = {
        d: [" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)]
        for d, ts in toksets.items()
    }
    counts = Counter(g for gs in grams.values() for g in gs)
    expect = {}
    for d, gs in grams.items():
        if not gs:
            continue
        u = sum(1 for g in gs if counts[g] == 1)
        expect[d] = (len(gs), u, (10**6 * u) // len(gs))

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_unique"], r["novelty_ppm"])
        for r in ngram_novelty(df, n=n, hash="md5").collect()
    }
    assert got == expect


mentions_st = st.lists(
    st.tuples(st.integers(0, 5), st.sampled_from(["x", "y", "z", "w"])),
    min_size=1,
    max_size=30,
)


@ITER_SLOW
@given(rows=mentions_st, cap=st.integers(2, 4))
def test_entity_pmi_matches_bruteforce(spark, rows, cap):
    from kgspark.extract.cooccur import entity_cooccurrence

    doc_ents: dict[int, set[str]] = defaultdict(set)
    for d, e in rows:
        doc_ents[d].add(e)
    kept = {d: es for d, es in doc_ents.items() if len(es) <= cap}
    nd = len(kept)
    na: Counter = Counter()
    nab: Counter = Counter()
    for es in kept.values():
        for e in es:
            na[e] += 1
        ss = sorted(es)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                nab[(ss[i], ss[j])] += 1
    r = lambda c: int(round(math.log(c) * 1000))  # noqa: E731
    expect = {}
    for (a, b), c in nab.items():
        pmi = r(c) + r(nd) - r(na[a]) - r(na[b])
        dnm = r(nd) - r(c)
        expect[(a, b)] = (c, pmi, 1.0 if dnm == 0 else _round6(pmi / dnm))

    df = spark.createDataFrame(rows, "doc_id long, entity string")
    got = {
        (x["entity_a"], x["entity_b"]): (x["n_ab"], x["pmi_milli"], x["npmi"])
        for x in entity_cooccurrence(
            df, min_pairs=1, max_entities_per_doc=cap
        ).collect()
    }
    assert got == expect


@ITER_SLOW
@given(
    text=st.text(alphabet="ab x", min_size=1, max_size=40),
    window=st.integers(1, 6),
)
def test_kwic_matches_bruteforce(spark, text, window):
    from kgspark.extract.mentions import mention_snippets

    alias = "ab"
    expect, start = [], 0
    while True:
        p = text.find(alias, start)
        if p < 0:
            break
        expect.append(
            (p, text[max(0, p - window) : p],
             text[p + len(alias) : p + len(alias) + window])
        )
        start = p + len(alias)
    docs = spark.createDataFrame([("d", text)], "url string, text string")
    al = spark.createDataFrame([(alias, "T", alias)], "alias string, label string, name string")
    got = sorted(
        (r["pos"], r["left_ctx"], r["right_ctx"])
        for r in mention_snippets(docs, al, window=window).collect()
    )
    assert got == sorted(expect)


@ITER_SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=25
    )
)
def test_graph_stats_matches_bruteforce(spark, edges):
    from kgspark.ops.graph_algs import graph_stats

    e = {(str(a), str(b)) for a, b in edges if a != b}
    if not e:
        return  # all self-loops: empty distinct edge set, nothing to assert
    nodes = {a for a, _ in e} | {b for _, b in e}
    recip = sum(1 for a, b in e if (b, a) in e)
    od: Counter = Counter(a for a, _ in e)
    idg: Counter = Counter(b for _, b in e)
    m = len(e)
    sx = sum(od[a] for a, _ in e)
    sy = sum(idg[b] for _, b in e)
    sxy = sum(od[a] * idg[b] for a, b in e)
    sxx = sum(od[a] ** 2 for a, _ in e)
    syy = sum(idg[b] ** 2 for _, b in e)
    vx, vy = m * sxx - sx * sx, m * syy - sy * sy
    assort = (
        0.0
        if vx == 0 or vy == 0
        else _round6((m * sxy - sx * sy) / math.sqrt(float(vx) * float(vy)))
    )
    df = spark.createDataFrame(list(edges), "src long, dst long")
    row = graph_stats(df).collect()[0]
    assert (
        row["n_nodes"], row["n_edges"], row["n_reciprocal"],
        row["reciprocity_ppm"], row["assortativity"],
    ) == (len(nodes), m, recip, (10**6 * recip) // m, assort)


@ITER_SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 50),   # event_id (may collide -> still total order per user with ts)
            st.integers(0, 5),    # minute
            st.integers(0, 3),    # user
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: r[0],
    )
)
def test_event_transitions_matches_bruteforce(spark, rows):
    from datetime import datetime

    from kgspark.ops.behavior import event_transitions

    data = [
        (eid, datetime(2024, 1, 1, 0, m), u, t) for eid, m, u, t in rows
    ]
    by_user: dict[int, list] = defaultdict(list)
    for eid, ts, u, t in data:
        by_user[u].append((ts, eid, t))
    pairs: Counter = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    totals: Counter = Counter()
    for (a, _), c in pairs.items():
        totals[a] += c
    expect = {
        (a, b): (c, totals[a], (10**6 * c) // totals[a])
        for (a, b), c in pairs.items()
    }
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r["src_event"], r["dst_event"]): (
            r["n_transitions"], r["n_from_src"], r["p_ppm"]
        )
        for r in event_transitions(df).collect()
    }
    assert got == expect


@ITER_SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)), min_size=1, max_size=20
    )
)
def test_scc_matches_bruteforce(spark, edges):
    from kgspark.ops.graph_algs import scc

    e = {(str(a), str(b)) for a, b in edges if a != b}
    if not e:
        return
    nodes = {a for a, _ in e} | {b for _, b in e}
    adj: dict = {n: set() for n in nodes}
    for a, b in e:
        adj[a].add(b)
    reach = {}
    for n in nodes:
        seen, stack = set(), [n]
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        reach[n] = seen
    expect = {
        n: min({w for w in reach[n] if n in reach[w]} | {n}) for n in nodes
    }
    df = spark.createDataFrame(list(edges), "src long, dst long")
    got = {r["name"]: r["scc_id"] for r in scc(df, max_rounds=20).collect()}
    assert got == expect
