"""Fused HTML->text+OpenIE stage must be byte-equivalent to the chained path."""

from __future__ import annotations

from kgspark import fixtures
from kgspark.extract.html import with_extracted_text
from kgspark.extract.openie import extract_doc_triples


def test_fused_equals_chained(spark):
    pages = fixtures.web_pages_spark_small(spark, 250)  # mixed text/html modes
    chained = extract_doc_triples(with_extracted_text(pages))
    fused = extract_doc_triples(pages, fused_html=True)
    a = {tuple(r) for r in chained.collect()}
    b = {tuple(r) for r in fused.collect()}
    assert a == b and a
