"""X5: HTML -> text extraction (BASELINE.json input_hint per-row invariant).

``extract_text`` is the *pinned* pure-Python extractor: the contract is that
the Spark stage output is byte-identical per url to calling this function
row-wise. The Spark stage (``with_extracted_text``) wraps the same function
in an Arrow-batched pandas UDF — per-element Python inside an Arrow batch,
never per-row serialization — and only runs it on rows whose ``text`` is
null, so pre-extracted pages are a zero-cost pass-through.

Extraction spec (deterministic, no external deps):
- parse with html.parser (stdlib, tolerant of broken markup);
- ignore everything inside <script> <style> <nav> <footer> <head> subtrees;
- collect the text of content-block elements (<p>, <h1>-<h6>, <li>, <td>),
  whitespace-stripped per block;
- join non-empty blocks with "\n".

The reference's closest analogue is its crawler's per-element BS4
``get_text`` scraping (spider_nursing_home.py:46-94); this generalizes it to
the web-pages corpus the north rule targets.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SKIP_TAGS = {"script", "style", "nav", "footer", "head"}
_BLOCK_TAGS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td"}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._block_depth = 0
        self._current: list[str] = []
        self.blocks: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS and self._skip_depth == 0:
            if self._block_depth == 0:
                self._current = []
            self._block_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS and self._skip_depth == 0 and self._block_depth > 0:
            self._block_depth -= 1
            if self._block_depth == 0:
                block = "".join(self._current).strip()
                if block:
                    self.blocks.append(block)

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and self._block_depth > 0:
            self._current.append(data)


def extract_text(html: bytes | None) -> str | None:
    """Pinned extractor. UTF-8 with errors='replace'; None-safe."""
    if html is None:
        return None
    parser = _TextExtractor()
    parser.feed(html.decode("utf-8", errors="replace"))
    parser.close()
    return "\n".join(parser.blocks)


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


def with_extracted_text(pages: DataFrame) -> DataFrame:
    """Fill null ``text`` from ``html``; keep pre-extracted text untouched.

    Catalyst hoists UDFs out of conditionals, so the html column is masked to
    NULL first for rows that already have text — pre-extracted rows cross the
    Arrow boundary as nulls, not page bodies.
    """
    needs = F.col("text").isNull()
    masked_html = F.when(needs, F.col("html"))
    return pages.withColumn(
        "text", F.coalesce(F.col("text"), extract_text_udf(masked_html))
    )
