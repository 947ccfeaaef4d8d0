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
    applied row-wise, byte for byte, per url — and the production extractor
    (fast scanner + fallback) == the pinned HTMLParser reference."""
    pdf = fixtures.web_pages_pdf(200, both_cols=True)
    pages = spark.createDataFrame(pdf.assign(text=None)[["url", "warc_ts", "html", "text", "lang"]])
    extracted = {r["url"]: r["text"] for r in html.with_extracted_text(pages).collect()}
    for _, row in pdf.iterrows():
        expected = html.extract_text_reference(row["html"])
        assert html.extract_text(row["html"]) == expected, row["url"]
        assert extracted[row["url"]] == expected, row["url"]
        assert extracted[row["url"]].encode() == row["text"].encode(), "fixture text convention drifted"


_ADVERSARIAL_HTML = [
    b"<p>a<script>if(a<b){}</script>b</p>",
    b"<p>a<script>document.write('<p>inner</p>')</script>b</p>",
    b"<p>a &amp; b</p>",
    b'<p a="x>y">q</p>',
    b"<p/><li>i</li>",
    b"</p attr><p>x</p>",
    b"<!-- comment --><p>x</p>",
    b"<p>a<!-- mid -->b</p>",
    b"<p>a<!-- close with space -- >b</p>",
    b"<p>unclosed <!-- comment",
    b"<!--><p>tiny</p>",
    b"<!---><p>tinier</p>",
    b"<! bogus ><p>x</p>",
    b"<!doctype html><p>x</p>",
    b"<nav><!-- in nav --></nav><p>x</p>",
    b"<script><!-- in cdata --></script><p>x</p>",
    b"<P>UPPER</P>",
    b"<script>no close <p>hidden</p>",
    b"<p>text with < stray</p>",
    b"<nav><nav><p>deep</p></nav><p>still nav</p></nav><p>out</p>",
    b"<script >x</script><p>y</p>",
    b"<SCRIPT>x</SCRIPT><p>ok</p>",
    b"<script>x</script foo><p>y</p></script>",
    b"</ p><p>sp</p>",
    b"<my-tag><p>custom</p></my-tag>",
    b"\xff\xfe<p>bad utf8 \xc3</p>",
    # unquoted attribute value ending in '/': html.parser folds the '/' into
    # the value and emits a START tag, not a self-closing one (ADVICE r1)
    b"<p att=x/>y</p>",
    b"<p att=http://e.com/>y</p>",
    b"<li att=a/>z</li>",
    b"<p att=x />spaced</p>",
    b'<p att="x"/>quoted</p>',
    b"<p att='x'/>quoted2</p>",
    b"<br att=x/><p>after</p>",
    b"<p disabled/>bare</p>",
]


def test_fast_extractor_equals_reference_adversarial():
    """The fast scanner must be byte-identical to the HTMLParser reference on
    every construct class it claims to handle or delegate."""
    for case in _ADVERSARIAL_HTML:
        assert html.extract_text(case) == html.extract_text_reference(case), case


def test_fast_extractor_equals_reference_fuzz():
    """Seeded random tag-soup fuzz: production extractor == reference on 5000
    documents mixing every divergence-risk token; the fast path must actually
    fire on a nontrivial share (else the speedup claim is vacuous)."""
    import random

    rng = random.Random(1234)
    tokens = [
        "<p>", "</p>", "<li>", "</li>", "<td>", "</td>", "<script>", "</script>",
        "<style>", "</style>", "<nav>", "</nav>", "<head>", "</head>", "<p/>",
        "<p class='a'>", '<p a="b">', "<P>", "</P >", "text", "中文", " ", "&amp;",
        "&", "<", ">", "<!-- c -->", "<!doctype html>", "<?pi?>", "<div>", "</div>",
        '<p a="x>y">', "</p attr>", "<br/>", "<script>var a<b;</script>",
        "abc<def", "<script src='u'>", "</ p>", "<my-tag>", "<p  >", "'", '"', "\n",
        "<p att=x/>", "<p att=u/v/>", "<li att=x />", '<p att="x"/>', "<td a=1/>",
    ]
    n_fast = 0
    for _ in range(5000):
        s = "".join(rng.choice(tokens) for _ in range(rng.randint(1, 25)))
        raw = s.encode("utf-8")
        assert html.extract_text(raw) == html.extract_text_reference(raw), raw
        if html._extract_text_fast(s) is not None:
            n_fast += 1
    assert n_fast > 300


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
