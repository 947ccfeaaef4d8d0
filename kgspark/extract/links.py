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


class _AnchorCollector(HTMLParser):
    """(href, anchor text) pairs; nested tags inside <a> contribute their
    text; nested/unclosed anchors close the open one first (browser-like)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pairs: list[tuple[str, str]] = []
        self._href: str | None = None
        self._text: list[str] = []

    def _close(self) -> None:
        if self._href is not None:
            self.pairs.append((self._href, "".join(self._text).strip()))
        self._href, self._text = None, []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            self._close()
            self._href = next((v for k, v in attrs if k == "href" and v), None)

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._close()

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._text.append(data)

    def close(self) -> None:  # EOF with an unclosed <a>
        super().close()
        self._close()


def extract_anchor_texts(pages: DataFrame) -> DataFrame:
    """(url, html) -> (dst_url, anchor_text) rows — anchor text is the
    web's crowd-sourced alias dictionary: the phrases pages use when
    linking to a target are candidate surface forms FOR that target
    (the classic anchor-text entity-linking signal). Empty anchors
    (image links) are dropped; href resolution as in extract_links."""
    cols = pages.select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dst, txt = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                if html is None:
                    continue
                p = _AnchorCollector()
                p.feed(bytes(html).decode("utf-8", errors="replace"))
                p.close()
                for href, text in p.pairs:
                    if not text:
                        continue
                    try:
                        absolute = urldefrag(urljoin(url, href))[0]
                    except ValueError:
                        continue
                    if urlsplit(absolute).scheme in ("http", "https"):
                        dst.append(absolute)
                        txt.append(text)
            yield pd.DataFrame({"dst_url": dst, "anchor_text": txt})

    return cols.mapInPandas(run, schema="dst_url string, anchor_text string")


def alias_candidates_from_anchors(
    anchors: DataFrame, min_support: int = 2, top_k: int = 5
) -> DataFrame:
    """Aggregate anchors into a per-target alias shortlist: the ``top_k``
    most frequent anchor texts per dst_url with support >= ``min_support``.
    Output (dst_url, alias, support, rank) feeds the X6 alias dictionary
    (extract/mentions.py) — two-phase count + a bounded window."""
    freq = anchors.groupBy("dst_url", "anchor_text").agg(
        F.count("*").alias("support")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("dst_url").orderBy(
        F.desc("support"), F.col("anchor_text")
    )
    return (
        freq.where(F.col("support") >= min_support)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .withColumnRenamed("anchor_text", "alias")
    )
