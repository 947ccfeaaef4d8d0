"""Structured Streaming wrapper: micro-batch extraction + watermarked windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark import fixtures, streaming
from kgspark.extract.openie import extract_doc_triples


def test_stream_extract_matches_batch(spark, tmp_path):
    n = 300
    src = str(tmp_path / "pages_in")
    fixtures.web_pages_spark_small(spark, n).write.parquet(src)

    q = streaming.stream_extract_triples(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    got = spark.read.parquet(str(tmp_path / "out" / "doc_triples_stream"))
    batch = extract_doc_triples(
        fixtures.web_pages_spark_small(spark, n), fused_html=True
    )
    assert got.count() == batch.count()
    cols = ["url", "subj", "subj_type", "pred", "obj", "obj_type"]
    assert got.select(cols).exceptAll(batch.select(cols)).count() == 0


def test_stream_windowed_rates(spark, tmp_path):
    n = 400
    src = str(tmp_path / "pages_in")
    fixtures.web_pages_spark_small(spark, n).write.parquet(src)
    q = streaming.stream_windowed_rates(spark, src, query_name="rates_t")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM rates_t")
    # docs are 37s apart -> ~8 docs per 5-min window; watermark closes all but
    # the last window in availableNow mode
    assert out.count() > 0
    total = out.agg(F.sum("n_pages")).collect()[0][0]
    assert total <= n
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "zh" in langs
