"""Web link-graph extraction: href resolution, scheme filtering, host
aggregation, and PageRank composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.extract.links import extract_links, extract_links_from_html, host_graph


def test_pinned_link_extractor():
    html = (
        '<html><body>'
        '<a href="/rel/path">r</a>'
        '<a href="https://other.example/x#frag">o</a>'
        '<a href="mailto:a@b.c">m</a>'
        '<a href="page2">p</a>'
        '<a href="https://other.example/x">dup</a>'
        '<a name="anchor-no-href">n</a>'
        "</body></html>"
    ).encode()
    got = extract_links_from_html("https://site.example/dir/page1", html)
    assert got == [
        "https://site.example/rel/path",
        "https://other.example/x",          # fragment stripped
        "https://site.example/dir/page2",   # relative to the dir
        "https://other.example/x",          # duplicate kept
    ]
    assert extract_links_from_html("https://s.example/", None) == []


def test_link_and_host_graph(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.example/1",
             b'<a href="https://b.example/x"></a><a href="/2"></a>'),
            ("https://a.example/2", b'<a href="https://b.example/y"></a>'),
            ("https://b.example/x", None),
        ],
        "url string, html binary",
    )
    links = extract_links(pages)
    assert links.count() == 3
    hosts = {tuple(r) for r in host_graph(links).collect()}
    # the a->a self-loop (the /2 link) is dropped; a->b has weight 2
    assert hosts == {("a.example", "b.example", 2)}


def test_host_pagerank_composes(spark):
    from kgspark.ops.graph_algs import pagerank

    edges = spark.createDataFrame(
        [("a.example", "hub.example"), ("b.example", "hub.example"),
         ("hub.example", "a.example")],
        "src_host string, dst_host string",
    )
    ranks = {
        r["name"]: r["rank"]
        for r in pagerank(edges, src="src_host", dst="dst_host", max_iter=30,
                          tol=None).collect()
    }
    assert ranks["hub.example"] > ranks["a.example"] > ranks["b.example"]
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_anchor_text_alias_candidates(spark):
    from kgspark.extract.links import alias_candidates_from_anchors, extract_anchor_texts

    page = (
        '<a href="https://t.example/d">高血压</a>'
        '<a href="https://t.example/d"><b>高血压</b> 详情</a>'
        '<a href="https://t.example/d">高血压</a>'
        '<a href="https://t.example/other">其他</a>'
        '<a href="https://t.example/img"><img src="x.png"/></a>'  # empty anchor
    ).encode()
    pages = spark.createDataFrame(
        [(f"https://s{i}.example/p", page) for i in range(2)], "url string, html binary"
    )
    anchors = extract_anchor_texts(pages)
    got = {
        (r["dst_url"], r["anchor_text"]): 1 for r in anchors.collect()
    }
    assert ("https://t.example/d", "高血压 详情") in got  # nested tag text kept
    assert ("https://t.example/img", "") not in got

    cands = alias_candidates_from_anchors(anchors, min_support=2, top_k=2)
    rows = {(r["dst_url"], r["alias"]): (r["support"], r["rank"]) for r in cands.collect()}
    # plain 高血压 appears 2x per page x 2 pages = 4; 详情 variant 2; 其他 2
    assert rows[("https://t.example/d", "高血压")] == (4, 1)
    assert rows[("https://t.example/d", "高血压 详情")] == (2, 2)
    assert rows[("https://t.example/other", "其他")] == (2, 1)
