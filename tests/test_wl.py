"""1-WL refinement: exact Python replay of the digest arithmetic,
role-equivalence semantics, directionality, init labels, signature
equality/inequality, partitioning invariance, validation."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kgspark.ops.wl import wl_refine, wl_signature

MOD = 2**32


def _term(lab: str) -> int:
    return int(hashlib.md5(lab.encode()).hexdigest()[:15], 16) % MOD


def _python_wl(edges, rounds, init=None):
    nodes = {str(a) for a, _ in edges} | {str(b) for _, b in edges}
    e = [(str(a), str(b)) for a, b in edges]
    lab = {n: (init or {}).get(n, ".") for n in nodes}
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


EDGES = [("a", "m"), ("b", "m"), ("m", "z"), ("c", "n"), ("n", "z")]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_matches_python_replay(spark, edges_df):
    got = {
        r["name"]: r["wl_label"]
        for r in wl_refine(edges_df, rounds=3).collect()
    }
    assert got == _python_wl(EDGES, 3)


def test_roles_converge_and_separate(spark, edges_df):
    lab = {
        r["name"]: r["wl_label"]
        for r in wl_refine(edges_df, rounds=1).collect()
    }
    # a, b, c all have out-degree 1 to a '.'-labeled node and no
    # in-edges: one role after round 1
    assert lab["a"] == lab["b"] == lab["c"]
    # m (in-degree 2) separates from n (in-degree 1) at round 1
    assert lab["m"] != lab["n"]
    # ...but at round 0 semantics they'd match; after round 2 a/b (feed m)
    # separate from c (feeds n)
    lab2 = {
        r["name"]: r["wl_label"]
        for r in wl_refine(edges_df, rounds=2).collect()
    }
    assert lab2["a"] == lab2["b"] != lab2["c"]


def test_direction_matters(spark):
    # pure source vs pure sink of equal degree differ at round 1
    df = spark.createDataFrame([("s", "t")], "src string, dst string")
    lab = {r["name"]: r["wl_label"] for r in wl_refine(df, rounds=1).collect()}
    assert lab["s"] != lab["t"]


def test_init_labels_seed_coloring(spark, edges_df):
    init = spark.createDataFrame([("a", "T1")], "name string, label string")
    got = {
        r["name"]: r["wl_label"]
        for r in wl_refine(edges_df, rounds=1, init_labels=init).collect()
    }
    assert got == _python_wl(EDGES, 1, init={"a": "T1"})
    assert got["a"] != got["b"]  # typed seed separates a from b


def test_signature_isomorphic_vs_not(spark, edges_df):
    iso = [("x1", "y1"), ("x2", "y1"), ("y1", "w"), ("x3", "y2"), ("y2", "w")]
    sig_a = wl_signature(wl_refine(edges_df, rounds=2)).collect()[0][0]
    sig_b = wl_signature(
        wl_refine(spark.createDataFrame(iso, "src string, dst string"), rounds=2)
    ).collect()[0][0]
    assert sig_a == sig_b  # same shape, renamed nodes
    other = spark.createDataFrame(
        [("p", "q"), ("q", "r")], "src string, dst string"
    )
    sig_c = wl_signature(wl_refine(other, rounds=2)).collect()[0][0]
    assert sig_a != sig_c


def test_partitioning_invariance(spark, edges_df):
    a = sorted(wl_refine(edges_df, rounds=2).collect())
    b = sorted(wl_refine(edges_df.repartition(7), rounds=2).collect())
    assert a == b


def test_validation(spark, edges_df):
    with pytest.raises(ValueError, match="rounds"):
        wl_refine(edges_df, rounds=0)


def test_quotient_graph(spark, edges_df):
    from kgspark.ops.wl import wl_quotient

    labels = wl_refine(edges_df, rounds=2)
    q = wl_quotient(edges_df, labels).collect()
    lab = {r["name"]: r["wl_label"] for r in labels.collect()}
    # roles after 2 rounds: {a,b}, {c}, {m}, {n}, {z}
    assert lab["a"] == lab["b"]
    got = {(r["src_role"], r["dst_role"]): (r["n_edges"], r["n_src_nodes"], r["n_dst_nodes"]) for r in q}
    # a->m and b->m collapse to one quotient edge with n_edges=2
    assert got[(lab["a"], lab["m"])] == (2, 2, 1)
    assert got[(lab["c"], lab["n"])] == (1, 1, 1)
    assert got[(lab["m"], lab["z"])] == (1, 1, 1)
    assert got[(lab["n"], lab["z"])] == (1, 1, 1)
    assert len(got) == 4
    # quotient edge counts conserve the original edge count
    assert sum(v[0] for v in got.values()) == 5


def test_grouped_signature_dedups_subgraphs(spark):
    # two extracted subgraphs with identical shape (renamed nodes) and one
    # different: grouped wl_signature collapses the first two
    rows = []
    for gid, edges in [
        ("s1", [("a", "b"), ("c", "b")]),
        ("s2", [("x", "y"), ("z", "y")]),
        ("s3", [("p", "q"), ("q", "r")]),
    ]:
        for s, d in edges:
            rows.append((gid, f"{gid}:{s}", f"{gid}:{d}"))
    df = spark.createDataFrame(rows, "gid string, src string, dst string")
    labels = wl_refine(df, rounds=2).withColumn(
        "gid", F.split("name", ":")[0]
    )
    sigs = {
        r["gid"]: r["wl_signature"]
        for r in wl_signature(labels, group_col="gid").collect()
    }
    assert sigs["s1"] == sigs["s2"] != sigs["s3"]
