"""X5: HTML -> text extraction (BASELINE.json input_hint per-row invariant).

``extract_text_reference`` is the *pinned* pure-Python extractor: the
contract is that the Spark stage output is byte-identical per url to calling
it row-wise. ``extract_text`` is the production function — a fast tag
scanner that handles the common well-formed subset ~3x faster and delegates
every divergence-risk document to the reference parser, so it is
byte-identical by construction (fuzz- and corpus-asserted in tests). The
Spark stage (``with_extracted_text``) wraps it in an Arrow-batched pandas
UDF — per-element Python inside an Arrow batch, never per-row serialization
— and only runs it on rows whose ``text`` is null, so pre-extracted pages
are a zero-cost pass-through.

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

import re
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


def extract_text_reference(html: bytes | None) -> str | None:
    """Pinned REFERENCE extractor (the per-row invariant's ground truth):
    stdlib HTMLParser, UTF-8 with errors='replace'; None-safe."""
    if html is None:
        return None
    parser = _TextExtractor()
    parser.feed(html.decode("utf-8", errors="replace"))
    parser.close()
    return "\n".join(parser.blocks)


# --- fast path --------------------------------------------------------------
# The stdlib HTMLParser is the flagship pipeline's constant-factor ceiling
# (measured ~11k docs/s/core vs 61k for the OpenIE stage). The fast scanner
# below handles the common well-formed subset with C-speed find/match calls
# and a small per-TAG (not per-char) Python loop. It is byte-identical to
# the reference BY CONSTRUCTION: any document containing a construct where
# tokenization could diverge — charrefs '&', doctype/bogus declarations
# ('<!' not opening a well-formed comment; well-formed comments ARE handled,
# with HTMLParser's own close pattern), processing instructions '<?', a '<' that does not open a plain tag,
# unbalanced attribute quotes (a quoted '>' would end the tag early),
# end-tags carrying attributes/self-close, or a non-standard script/style
# close — is delegated to the reference parser. Equality is fuzz- and
# corpus-tested in tests/test_extract.py.
_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\s[^<>]*?)?)(/?)>")
# script/style content is CDATA to HTMLParser: opaque until the literal
# close tag (case-insensitive, optional whitespace)
_CDATA_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in ("script", "style")
}
# HTMLParser's own comment-close pattern (html.parser._commentclose): '-- >'
# also terminates a comment — mirroring it keeps the fast path byte-identical
_COMMENT_CLOSE = re.compile(r"--\s*>")


def _extract_text_fast(s: str) -> str | None:
    """Returns the extracted text, or None if the doc needs the reference
    parser (never wrong, only conservative)."""
    if "&" in s or "<?" in s:
        return None
    blocks: list[str] = []
    current: list[str] = []
    skip_depth = 0
    block_depth = 0
    pos = 0
    n = len(s)
    find = s.find
    match = _TAG_RE.match
    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            if skip_depth == 0 and block_depth > 0:
                current.append(s[pos:])
            break
        if lt > pos and skip_depth == 0 and block_depth > 0:
            current.append(s[pos:lt])
        if s.startswith("<!--", lt):
            # well-formed comment: no data, no state change; resume after the
            # close (HTMLParser's own close pattern, which accepts '-- >')
            mc = _COMMENT_CLOSE.search(s, lt + 4)
            if mc is None:
                return None  # unclosed comment: HTMLParser EOF handling varies
            pos = mc.end()
            continue
        if s.startswith("<!", lt):
            return None  # doctype / bogus comment — delegate
        m = match(s, lt)
        if m is None:
            return None  # stray '<' — tokenization may diverge
        closing, tag, attrs, selfclose = m.groups()
        tag = tag.lower()
        if closing and (attrs.strip() or selfclose):
            return None  # '</p attr>' / '</p/>' are bogus tags to HTMLParser
        if not closing and ("'" in attrs or '"' in attrs):
            # quotes must pair up, else the real tag swallowed a '>' we split on
            if attrs.count("'") % 2 or attrs.count('"') % 2:
                return None
        if selfclose and not closing and attrs and not (
            attrs[-1].isspace() or attrs[-1] in "\"'"
        ):
            # '<p att=x/>': html.parser folds the '/' into the unquoted
            # attribute value and emits a START tag; our regex split it off as
            # self-closing. Only a '/' preceded by whitespace or a closing
            # quote is unambiguously self-closing — anything else delegates.
            return None
        pos = m.end()
        starts = [] if closing else [tag]
        ends = [tag] if (closing or selfclose) else []
        for t in starts:
            if t in _SKIP_TAGS:
                skip_depth += 1
            elif t in _BLOCK_TAGS and skip_depth == 0:
                if block_depth == 0:
                    current = []
                block_depth += 1
        for t in ends:
            if t in _SKIP_TAGS:
                skip_depth = max(0, skip_depth - 1)
            elif t in _BLOCK_TAGS and skip_depth == 0 and block_depth > 0:
                block_depth -= 1
                if block_depth == 0:
                    block = "".join(current).strip()
                    if block:
                        blocks.append(block)
        if tag in _CDATA_CLOSE and not closing and not selfclose:
            # content is opaque to HTMLParser until the literal close tag
            mc = _CDATA_CLOSE[tag].search(s, pos)
            if mc is None:
                break  # unclosed CDATA: rest of doc is (skipped) data
            skip_depth = max(0, skip_depth - 1)
            pos = mc.end()
    return "\n".join(blocks)


def extract_text(html: bytes | None) -> str | None:
    """Pinned extractor (fast scanner + reference fallback; see above).
    UTF-8 with errors='replace'; None-safe."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    out = _extract_text_fast(s)
    if out is None:
        parser = _TextExtractor()
        parser.feed(s)
        parser.close()
        return "\n".join(parser.blocks)
    return out


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
