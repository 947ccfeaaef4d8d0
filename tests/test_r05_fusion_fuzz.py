"""Property-based cross-checks for attribute fusion, ontology type
checking, and crawl-wave scheduling over Hypothesis-generated random
inputs — exact Python replays of each operator's documented contract
(same discipline as tests/test_r05_algs_fuzz.py)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ITER_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

assertions_st = st.lists(
    st.tuples(
        st.integers(0, 3),              # entity
        st.sampled_from(["name", "ty"]),  # attr
        st.one_of(st.none(), st.sampled_from(["u", "v", "w"])),  # value
        st.integers(1, 5),              # weight (bigint units)
    ),
    min_size=1,
    max_size=40,
)


def _python_fuse(rows, weighted):
    votes: dict[tuple, int] = defaultdict(int)
    for e, a, v, w in rows:
        if v is None:
            continue
        votes[(e, a, v)] += w if weighted else 1
    per_key: dict[tuple, list] = defaultdict(list)
    for (e, a, v), n in votes.items():
        per_key[(e, a)].append((v, n))
    out = {}
    for (e, a), vs in per_key.items():
        total = sum(n for _, n in vs)
        winner, n = min(vs, key=lambda t: (-t[1], t[0]))
        out[(e, a)] = (winner, n, total, len(vs), (n * 10**6) // total)
    return out


@ITER_SLOW
@given(rows=assertions_st, weighted=st.booleans())
def test_fuse_attributes_matches_vote_replay(spark, rows, weighted):
    from kgspark.construct.fusion import fuse_attributes

    want = _python_fuse(rows, weighted)
    if not want:
        return  # every assertion abstained (NULL values)
    df = spark.createDataFrame(
        rows, "entity_id long, attr string, value string, wgt long"
    )
    fused = fuse_attributes(df, weight_col="wgt" if weighted else None)
    got = {
        (r["entity_id"], r["attr"]): (
            r["value"], r["votes"], r["total_votes"], r["n_values"], r["support_ppm"],
        )
        for r in fused.collect()
    }
    assert got == want


nodes_st = st.lists(
    st.tuples(st.integers(0, 5), st.sampled_from(["A", "B", "C"])),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)
typed_edges_st = st.lists(
    st.tuples(st.integers(0, 7), st.sampled_from(["r1", "r2", "r3"]), st.integers(0, 7)),
    min_size=1,
    max_size=20,
)
spec_st = st.lists(
    st.tuples(
        st.sampled_from(["r1", "r2"]),
        st.sampled_from(["A", "B"]),
        st.sampled_from(["A", "B", "C"]),
    ),
    min_size=1,
    max_size=6,
)


@ITER_SLOW
@given(nodes=nodes_st, edges=typed_edges_st, spec=spec_st)
def test_check_edge_types_matches_bruteforce(spark, nodes, edges, spec):
    from kgspark.construct.typecheck import check_edge_types

    lab = dict(nodes)
    specset = set(spec)
    known = {r for r, _, _ in spec}
    want = {}
    for s, r, d in set(edges):
        sl, dl = lab.get(s), lab.get(d)
        if sl is None or dl is None:
            want[(s, r, d)] = ("unlabeled_endpoint", sl, dl)
        elif (r, sl, dl) in specset:
            continue
        elif r not in known:
            want[(s, r, d)] = ("unknown_rel", sl, dl)
        else:
            want[(s, r, d)] = ("signature", sl, dl)
    ndf = spark.createDataFrame(
        [(e, l, f"n{e}") for e, l in nodes], ["entity_id", "label", "name"]
    )
    # the operator does not dedup edges; dedup in generation for a set compare
    edf = spark.createDataFrame(sorted(set(edges)), ["src_id", "rel", "dst_id"])
    got = {
        (r["src"], r["rel"], r["dst"]): (r["violation"], r["src_label"], r["dst_label"])
        for r in check_edge_types(ndf, edf, list(set(spec))).collect()
    }
    assert got == want


urls_st = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(0, 9)),
    min_size=1,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


@ITER_SLOW
@given(rows=urls_st, k=st.integers(1, 3), use_prio=st.booleans())
def test_crawl_waves_matches_order_replay(spark, rows, k, use_prio):
    from kgspark.ops.curation import crawl_waves

    salt = "wave-v1"
    urls = [(f"https://h{h}.example/p{i}", prio) for h, i, prio in rows]
    by_host: dict[str, list] = defaultdict(list)
    for (h, _, _), (u, prio) in zip(rows, urls):
        hh = hashlib.md5(f"{u}|{salt}".encode()).hexdigest()
        key = (-prio, hh, u) if use_prio else (hh, u)
        by_host[f"h{h}.example"].append((key, u))
    want = {}
    for host, items in by_host.items():
        for rk, (_, u) in enumerate(sorted(items)):
            want[u] = (host, rk % k, rk // k)
    df = spark.createDataFrame(urls, "url string, prio long")
    out = crawl_waves(
        df, per_host_per_wave=k, priority_col="prio" if use_prio else None, salt=salt
    )
    got = {r["url"]: (r["host"], r["slot"], r["wave"]) for r in out.collect()}
    assert got == want
