"""Property-based cross-checks for the iterative graph algorithms added in
round 4b (SCC, HITS, 1-WL) over Hypothesis-generated RANDOM digraphs.

The example tests in test_scc.py / test_hits.py / test_wl.py pin classic
structures (cycles, bowties, hub-and-spoke); these fuzz tests reuse the
same algorithm-independent Python replays but let Hypothesis hunt the
shapes hand-written cases miss (overlapping cycles, multi-edges,
self-loops, disconnected pieces, adversarial id orderings).
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

ITER_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_st = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=25
)


def _python_scc(edges):
    """Mutual-reachability closure — independent of the coloring algorithm."""
    e = {(str(a), str(b)) for a, b in edges if a != b}
    nodes = {a for a, _ in e} | {b for _, b in e}
    adj: dict[str, set[str]] = {n: set() for n in nodes}
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
    return {
        n: min({w for w in reach[n] if n in reach[w]} | {n}) for n in nodes
    }


@ITER_SLOW
@given(edges=edges_st)
def test_scc_matches_closure_on_random_digraphs(spark, edges):
    from kgspark.ops.graph_algs import scc

    want = _python_scc(edges)
    if not want:
        return  # all self-loops: empty graph after the operator's filter
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], "src string, dst string"
    )
    got = {r["name"]: r["scc_id"] for r in scc(df).collect()}
    assert got == want


def _python_hits(edges, iters, scale):
    """Integer L-infinity fixed-point replay (same as test_hits.py, kept
    duplicate-edge-sensitive because hits() does not dedup)."""
    nodes = sorted({x for e in edges for x in e})
    a = {v: scale for v in nodes}
    h = {v: scale for v in nodes}
    for _ in range(iters):
        araw = {v: 0 for v in nodes}
        for s, t in edges:
            araw[t] += h[s]
        am = max(araw.values())
        a = {v: (araw[v] * scale) // am for v in nodes}
        hraw = {v: 0 for v in nodes}
        for s, t in edges:
            hraw[s] += a[t]
        hm = max(hraw.values())
        h = {v: (hraw[v] * scale) // hm for v in nodes}
    return a, h


@ITER_SLOW
@given(edges=edges_st, iters=st.integers(1, 4))
def test_hits_matches_integer_replay_on_random_digraphs(spark, edges, iters):
    from kgspark.ops.graph_algs import hits

    e = [(str(a), str(b)) for a, b in edges]
    scale = 10**6
    want_a, want_h = _python_hits(e, iters, scale)
    df = spark.createDataFrame(e, ["src", "dst"])
    rows = hits(df, max_iter=iters, scale=scale).collect()
    assert {r["name"]: r["auth_units"] for r in rows} == want_a
    assert {r["name"]: r["hub_units"] for r in rows} == want_h


MOD = 2**32


def _term(lab: str) -> int:
    return int(hashlib.md5(lab.encode()).hexdigest()[:15], 16) % MOD


def _python_wl(edges, rounds):
    """Exact digest replay (same as test_wl.py, duplicate-edge-sensitive)."""
    nodes = {str(a) for a, _ in edges} | {str(b) for _, b in edges}
    e = [(str(a), str(b)) for a, b in edges]
    lab = {n: "." for n in nodes}
    for _ in range(rounds):
        od, ic = {}, {}
        for a, b in e:
            s, c = od.get(a, (0, 0))
            od[a] = (s + _term(lab[b]), c + 1)
            s, c = ic.get(b, (0, 0))
            ic[b] = (s + _term(lab[a]), c + 1)
        lab = {
            n: hashlib.md5(
                "|".join(
                    [
                        lab[n],
                        str(od.get(n, (0, 0))[0]),
                        str(od.get(n, (0, 0))[1]),
                        str(ic.get(n, (0, 0))[0]),
                        str(ic.get(n, (0, 0))[1]),
                    ]
                ).encode()
            ).hexdigest()
            for n in nodes
        }
    return lab


@ITER_SLOW
@given(edges=edges_st, rounds=st.integers(1, 3))
def test_wl_matches_digest_replay_on_random_digraphs(spark, edges, rounds):
    from kgspark.ops.wl import wl_refine

    e = [(str(a), str(b)) for a, b in edges]
    df = spark.createDataFrame(e, "src string, dst string")
    got = {r["name"]: r["wl_label"] for r in wl_refine(df, rounds=rounds).collect()}
    assert got == _python_wl(e, rounds)


def _hll_replay(values, p=6):
    """Exact register + estimate replay of ops/sketch.hll_sketch/estimate."""
    import math

    b = 60 - p
    m = 2**p
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx, rest = h // 2**b, h % 2**b
        rk = (b + 1) if rest == 0 else b - rest.bit_length() + 1
        regs[idx] = max(regs.get(idx, 0), rk)
    s = sum(1 << (b - min(rk, b)) for rk in regs.values())
    zeros = m - len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = (alpha * m * m * float(2**b)) / float(s + zeros * 2**b)
    if zeros > 0 and raw <= 2.5 * m:
        est = math.floor(math.log(m / zeros) * m)
    else:
        est = math.floor(raw)
    return regs, est


@ITER_SLOW
@given(
    values=st.lists(st.integers(0, 400), min_size=1, max_size=120),
)
def test_hll_registers_and_estimate_match_replay(spark, values):
    from kgspark.ops.sketch import hll_estimate, hll_sketch

    df = spark.createDataFrame([(v,) for v in values], "user_id long").withColumn(
        "g", F.lit("g")
    )
    sk = hll_sketch(df, "user_id", ["g"], p=6)
    regs = {r["idx"]: r["maxrank"] for r in sk.collect()}
    want_regs, want_est = _hll_replay(set(values))
    assert regs == want_regs
    got = hll_estimate(sk, ["g"], p=6).first()["est_distinct"]
    # registers are exact integers; the floored float estimate may sit on a
    # libm last-ulp boundary between JVM and CPython, so allow 1 unit
    assert abs(got - want_est) <= 1


def _cm_pos_py(value, j, width, salt="cm-v1"):
    h = hashlib.md5(f"{salt}|{value}|{j}".encode()).hexdigest()[:15]
    return int(h, 16) % width


@ITER_SLOW
@given(
    tokens=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=80),
    depth=st.integers(1, 4),
    width=st.sampled_from([8, 64, 1024]),
)
def test_cm_sketch_grid_and_queries_match_replay(spark, tokens, depth, width):
    from collections import Counter

    from kgspark.ops.sketch import cm_query, cm_sketch

    df = spark.createDataFrame([(t,) for t in tokens], "tok string")
    grid = {
        (r["j"], r["pos"]): r["cnt"]
        for r in cm_sketch(df, "tok", depth=depth, width=width).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for t in tokens:
        for j in range(depth):
            k = (j, _cm_pos_py(t, j, width))
            want[k] = want.get(k, 0) + 1
    assert grid == want
    truth = Counter(tokens)
    qdf = spark.createDataFrame([(t,) for t in "abcdefghzz"], "tok string")
    sketch = cm_sketch(df, "tok", depth=depth, width=width)
    est = {
        r["value"]: r["est_count"]
        for r in cm_query(sketch, qdf, "tok", depth=depth, width=width).collect()
    }
    for t, e in est.items():
        assert e >= truth.get(t, 0)  # never undercounts
        assert e == min(
            want.get((j, _cm_pos_py(t, j, width)), 0) for j in range(depth)
        )
