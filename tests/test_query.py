"""Query layer: retrieval templates + BFS subgraph over the miniature graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark import fixtures
from kgspark.construct.reference_build import build_structured_graph
from kgspark.query import retriever, subgraph


@pytest.fixture(scope="module")
def graph(spark, mini_sources):
    nodes, edges, _ = build_structured_graph(spark, mini_sources)
    return nodes.cache(), edges.cache()


def test_disease_expand(graph):
    nodes, edges = graph
    d = fixtures.DISEASES[1]  # single-record disease
    row = retriever.disease_expand(nodes, edges, d).collect()[0]
    assert row["disease"] == d
    assert len(row["symptoms"]) == 3
    assert len(row["complications"]) == 2
    assert len(row["drugs"]) == 2
    assert row["intro"].startswith(d)


def test_insurance_covering(graph):
    nodes, edges = graph
    rows = retriever.insurance_covering(nodes, edges, "高血压").collect()
    assert rows
    by_name = {r["ins_name"]: r["description"] for r in rows}
    assert "高血压" in by_name["长相安慢病保"]
    # dup-name product: the edge came from its first record's description,
    # while last-write-wins replaced the props with the later record's —
    # faithful MERGE semantics, so this description may NOT contain 高血压.
    assert by_name[fixtures.INSURANCES[0]] == "含恶性肿瘤医疗保障"


def test_insurance_for_age(graph):
    nodes, edges = graph
    young = retriever.insurance_for_age(nodes, edges, 30)
    assert young.count() == 0
    old = retriever.insurance_for_age(nodes, edges, 70).collect()
    assert 0 < len(old) <= 5


def test_insurance_search_series_vs_generic(graph):
    nodes, _ = graph
    precise = retriever.insurance_search(nodes, "推荐一下蓝医保系列")
    assert all("蓝医保" in r["name"] for r in precise.collect())
    generic = retriever.insurance_search(nodes, "随便推荐个保险", seed=42)
    names = [r["name"] for r in generic.collect()]
    assert names and all(
        any(k in n for k in retriever.GENERIC_KEYWORDS) for n in names
    )
    # seeded rand: stable across invocations
    again = [r["name"] for r in retriever.insurance_search(nodes, "随便推荐个保险", seed=42).collect()]
    assert names == again


def test_nursing_home_search(graph):
    nodes, _ = graph
    rows = retriever.nursing_home_search(nodes, city="北京", price_max=7500).collect()
    assert rows
    for r in rows:
        assert "北京" in r["address"] or "北京" in r["name"]
        assert int(r["price"]) <= 7500


def test_parse_query_rules():
    p = retriever.parse_query_rules("70岁高血压老人能买什么保险？", known_diseases=["高血压"])
    assert p["intent"] == "insurance_query"
    assert p["age"] == 70
    assert p["disease"] == ["高血压"]
    p2 = retriever.parse_query_rules("北京有哪些5000元以下的养老院？")
    assert p2["intent"] == "nursing_home_search"
    assert p2["city"] == "北京"
    assert p2["price_max"] == 5000


def test_subgraph_bfs(graph):
    nodes, edges = graph
    d = fixtures.DISEASES[1]
    sub = subgraph.retrieve_subgraph(nodes, edges, [d], hops=2, limit=50)
    hops = {r["name"]: r["hop"] for r in sub.nodes.collect()}
    assert hops[d] == 0
    # direct symptom is hop 1
    one_hop = [n for n, h in hops.items() if h == 1]
    assert one_hop
    assert sub.triples.count() > 0
    txt = subgraph.subgraph_to_text(sub)
    assert txt.startswith("三元组：")
    # hop-2 frontier contains something NOT adjacent to the seed
    assert any(h == 2 for h in hops.values())


def test_subgraph_unknown_entity(graph):
    nodes, edges = graph
    sub = subgraph.retrieve_subgraph(nodes, edges, ["不存在的实体"], hops=2)
    assert sub.nodes.count() == 0
    assert "未检索到" in subgraph.subgraph_to_text(sub)


def test_label_counts(graph):
    nodes, _ = graph
    counts = {r["label"]: r["n"] for r in retriever.label_counts(nodes).collect()}
    assert counts["Population"] == 1
    assert counts["Disease"] >= 10


def test_motif_paths_and_trail_semantics(spark):
    """Fixed-rel chains match hand-computed paths; node_distinct drops the
    cycle-revisiting row; name resolution keeps positions."""
    from kgspark.query.motif import paths, paths_with_names

    edges = spark.createDataFrame(
        [
            (1, "R", 2), (2, "S", 3), (2, "S", 4),
            (5, "R", 2),
            (1, "R", 6), (6, "S", 1),  # 1 -R-> 6 -S-> 1 revisits node 1
        ],
        "src_id long, rel string, dst_id long",
    )
    got = {tuple(r) for r in paths(edges, ["R", "S"]).collect()}
    assert got == {(1, 2, 3), (1, 2, 4), (5, 2, 3), (5, 2, 4)}
    loose = {tuple(r) for r in paths(edges, ["R", "S"], node_distinct=False).collect()}
    assert loose == got | {(1, 6, 1)}

    nodes = spark.createDataFrame(
        [(i, "L", f"v{i}", {}) for i in (1, 2, 3, 4, 5, 6)],
        "entity_id long, label string, name string, props map<string,string>",
    )
    named = {tuple(r) for r in paths_with_names(nodes, paths(edges, ["R", "S"])).collect()}
    assert ("v1", "v2", "v3") in named and len(named) == 4

    import pytest as _pytest

    with _pytest.raises(ValueError):
        paths(edges, [])


def test_graph_summary_and_sql_views(spark):
    from kgspark.query.stats import graph_summary, register_graph_views

    nodes = spark.createDataFrame(
        [(1, "A", "a", {}), (2, "A", "b", {}), (3, "B", "c", {})],
        "entity_id long, label string, name string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(1, "R", 2), (1, "S", 3)], "src_id long, rel string, dst_id long"
    )
    row = graph_summary(nodes, edges).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_labels"], row["n_rels"]) == (3, 2, 2, 2)
    assert row["max_out_degree"] == 2 and row["n_dangling"] == 2

    nv, ev = register_graph_views(spark, nodes, edges, prefix="t_stats")
    got = spark.sql(
        f"SELECT count(*) AS c FROM {nv} n JOIN {ev} e ON n.entity_id = e.src_id"
    ).collect()[0]["c"]
    assert got == 2


def test_subgraph_rank_ordered_truncation(spark):
    """With a rank table, the triple cap keeps the highest-ranked triples
    instead of alphabetical-first."""
    from kgspark.query.subgraph import retrieve_subgraph

    nodes = spark.createDataFrame(
        [(i, "L", n, {}) for i, n in [(1, "seed"), (2, "aaa"), (3, "zzz")]],
        "entity_id long, label string, name string, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [(1, "R", 2), (1, "R", 3)], "src_id long, rel string, dst_id long"
    )
    # alphabetical cap would keep (seed -R-> aaa); rank favors zzz
    ranks = spark.createDataFrame(
        [("zzz", 0.9), ("aaa", 0.1), ("seed", 0.0)], "name string, rank double"
    )
    sub = retrieve_subgraph(nodes, edges, ["seed"], hops=1, limit=1, ranks=ranks)
    assert [(r["subj"], r["obj"]) for r in sub.triples.collect()] == [("seed", "zzz")]
    sub_plain = retrieve_subgraph(nodes, edges, ["seed"], hops=1, limit=1)
    assert [(r["subj"], r["obj"]) for r in sub_plain.triples.collect()] == [("seed", "aaa")]
