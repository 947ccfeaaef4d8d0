"""Web link-graph construction: <a href> edges from the html column.

The Common-Crawl-scale complement of the entity KG: the URL-to-URL (and
host-to-host) graph is the backbone artifact of web corpora — crawl
frontier scoring, spam/host authority (PageRank over hosts — compose with
ops/graph_algs.pagerank), and per-document outlink features for curation.

Same execution shape as the other extraction stages (extract/html.py,
SCALE.md §4): one Arrow-batched mapInPandas over the corpus, stdlib-only
parsing, map-only (no shuffle until the caller aggregates). Relative hrefs
resolve against the page url (urljoin); fragments are dropped; only
http(s) schemes are kept.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser
from urllib.parse import urldefrag, urljoin, urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _HrefCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)


def extract_links_from_html(base_url: str, html: bytes | None) -> list[str]:
    """Pinned per-document link extractor: absolute, defragmented, http(s)
    hrefs in document order (duplicates kept — multiplicity is signal)."""
    if html is None:
        return []
    p = _HrefCollector()
    p.feed(html.decode("utf-8", errors="replace"))
    p.close()
    out = []
    for href in p.hrefs:
        try:
            absolute = urldefrag(urljoin(base_url, href))[0]
        except ValueError:
            continue  # unparseable href — e.g. bad IPv6 literal
        if urlsplit(absolute).scheme in ("http", "https"):
            out.append(absolute)
    return out


def extract_links(pages: DataFrame) -> DataFrame:
    """(url, html, ...) -> (src_url, dst_url), one row per anchor occurrence."""
    cols = pages.select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            src, dst = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                for link in extract_links_from_html(
                    url, bytes(html) if html is not None else None
                ):
                    src.append(url)
                    dst.append(link)
            yield pd.DataFrame({"src_url": src, "dst_url": dst})

    return cols.mapInPandas(run, schema="src_url string, dst_url string")


def host_graph(links: DataFrame) -> DataFrame:
    """URL edges -> weighted host-level edges (src_host, dst_host, n_links),
    self-loops (intra-host navigation) dropped. JVM-side host parsing
    (parse_url); the aggregate is the usual two-phase count. Feed the
    (src_host, dst_host) pairs to ops/graph_algs.pagerank for host
    authority."""
    hosts = links.select(
        F.parse_url("src_url", F.lit("HOST")).alias("src_host"),
        F.parse_url("dst_url", F.lit("HOST")).alias("dst_host"),
    ).where(
        F.col("src_host").isNotNull()
        & F.col("dst_host").isNotNull()
        & (F.col("src_host") != F.col("dst_host"))
    )
    return hosts.groupBy("src_host", "dst_host").agg(F.count("*").alias("n_links"))
