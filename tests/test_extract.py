"""X5 (HTML->text, byte-identical invariant), X1 (OpenIE), fixtures parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark import fixtures
from kgspark.extract import html, openie


def test_html_extractor_pinned_behavior():
    raw = (
        "<html><head><script>var x=1;</script><title>t</title></head><body>"
        "<nav>menu</nav><p> hello <b>world</b> </p><div>ignored top-level</div>"
        "<li>item1</li><footer>foot</footer></body></html>"
    ).encode()
    assert html.extract_text(raw) == "hello world\nitem1"
    assert html.extract_text(None) is None
    assert html.extract_text("<p>未闭合".encode()) == ""  # unclosed block -> no emit
    assert html.extract_text(b"\xff\xfe<p>x</p>") == "x"  # bad bytes replaced


def test_extraction_byte_identical_per_url(spark):
    """BASELINE.json per-row invariant: Spark-stage text == pinned extractor
    applied row-wise, byte for byte, per url."""
    pdf = fixtures.web_pages_pdf(200, both_cols=True)
    pages = spark.createDataFrame(pdf.assign(text=None)[["url", "warc_ts", "html", "text", "lang"]])
    extracted = {r["url"]: r["text"] for r in html.with_extracted_text(pages).collect()}
    for _, row in pdf.iterrows():
        expected = html.extract_text(row["html"])
        assert extracted[row["url"]] == expected, row["url"]
        assert extracted[row["url"]].encode() == row["text"].encode(), "fixture text convention drifted"


def test_pre_extracted_text_untouched(spark):
    pages = fixtures.web_pages_spark_small(spark, 50)
    out = html.with_extracted_text(pages)
    orig = pages.filter(F.col("text").isNotNull()).select("url", "text")
    joined = out.alias("a").join(orig.alias("b"), "url").filter(
        F.col("a.text") != F.col("b.text")
    )
    assert joined.count() == 0
    assert out.filter(F.col("text").isNull()).count() == 0


def test_openie_matches_closed_form(spark):
    n = 300
    pages = fixtures.web_pages_spark_small(spark, n, both_cols=True)
    got = {
        (r["subj"], r["subj_type"], r["pred"], r["obj"], r["obj_type"], r["url"])
        for r in openie.extract_doc_triples(pages).collect()
    }
    expected = set()
    for i in range(n):
        for t in fixtures.expected_triples_for_doc(i):
            expected.add((*t[:1], t[1], t[2], t[3], t[4], fixtures._doc_url(i)))
    assert got == expected


def test_openie_pinned_function_edge_cases():
    assert openie.extract_triples_text(None) == []
    assert openie.extract_triples_text("无模式匹配的句子。") == []
    got = openie.extract_triples_text("高血压的常见症状包括头痛、眩晕。高血压可并发脑卒中。")
    assert ("高血压", "Disease", "HAS_SYMPTOM", "头痛", "Symptom") in got
    assert ("高血压", "Disease", "HAS_COMPLICATION", "脑卒中", "Disease") in got
    # first-match-wins: 不承保 must not be parsed as 承保年龄
    got2 = openie.extract_triples_text("安心防癌险不承保糖尿病。")
    assert got2 == [("安心防癌险", "Insurance", "REFUSES_DISEASE", "糖尿病", "Disease")]


def test_dual_generators_agree(spark):
    """Distributed Column-expression generator == pandas generator, bit for bit."""
    n = 200
    a = fixtures.web_pages_pdf(n)
    b = (
        fixtures.web_pages_df(spark, n, partitions=4)
        .orderBy("url")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    a = a.sort_values("url").reset_index(drop=True)
    assert list(a["url"]) == list(b["url"])
    assert list(a["text"].fillna("∅")) == list(b["text"].fillna("∅"))
    assert list(a["lang"]) == list(b["lang"])
    assert list(a["warc_ts"]) == list(b["warc_ts"])
    ah = [x if x is None else bytes(x) for x in a["html"]]
    bh = [x if x is None else bytes(x) for x in b["html"]]
    assert ah == bh
