"""Distributed scan variants (S1/S3/S4) over the miniature fixture files —
the order-free spark.read path with declared schemas, vs the ordered loaders."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from kgspark.sources import structured as src


def test_s1_json_array_scan(spark, mini_sources):
    df = src.read_diseases_spark(spark, mini_sources.diseases)
    ordered = src.load_diseases(spark, mini_sources.diseases)
    assert df.count() == ordered.count()
    assert dict(df.dtypes)["symptom"] == "array<string>"
    # same name multiset
    a = sorted(r["name"] for r in df.select("name").collect())
    b = sorted(r["name"] for r in ordered.select("name").collect())
    assert a == b


def test_s3_csv_scan_bom_and_blank_filter(spark, mini_sources):
    df = src.read_nursing_homes_spark(spark, mini_sources.nursing_homes)
    ordered = src.load_nursing_homes(spark, mini_sources.nursing_homes)
    assert df.count() == ordered.count()  # blank-name row dropped in both
    assert "name" in df.columns and "price" in df.columns
    # BOM stripped: the first header resolved to 城市 -> city value present
    assert df.filter(F.col("city").isNull()).count() == 0


def test_s4_json_chinese_keys_scan(spark, mini_sources):
    df = src.read_insurances_spark(spark, mini_sources.insurances)
    ordered = src.load_insurances(spark, mini_sources.insurances)
    assert df.count() == ordered.count()
    assert df.filter(F.col("description").isNull()).count() == 0  # "" default


def test_s5_raw_text_scan(spark, tmp_path):
    """S5: whole-file text scan (text_graph_builder.py:94-101 analog)."""
    p = tmp_path / "policy.txt"
    p.write_text("本产品投保年龄范围为0岁至65周岁。\n本产品覆盖恶性肿瘤。", "utf-8")
    df = spark.read.text(str(p), wholetext=True)
    content = df.collect()[0]["value"]
    assert "0岁至65周岁" in content and "\n" in content

    from kgspark.extract.openie import extract_triples_text

    triples = extract_triples_text(content)
    assert ("本产品", "Insurance", "覆盖".join([]) or "COVERS", "恶性肿瘤", "Disease") in [
        (t[0], t[1], t[2], t[3], t[4]) for t in triples
    ]


def test_s10_append_mode_sink(spark, tmp_path):
    """S10: append-with-header-once analog — parquet append sink."""
    out = str(tmp_path / "sink")
    d1 = spark.range(5).select(F.col("id"), F.lit("a").alias("tag"))
    d2 = spark.range(5, 8).select(F.col("id"), F.lit("b").alias("tag"))
    d1.write.mode("append").parquet(out)
    d2.write.mode("append").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == 8
    assert back.select("tag").distinct().count() == 2


def test_corrupt_json_rows_quarantined(spark, tmp_path):
    """Malformed source rows must be quarantined with their raw text, not
    fail the scan or silently vanish (row-granular version of the
    reference's swallowed per-batch errors, neo4j_loader.py:280-282)."""
    from pyspark.sql import types as T

    from kgspark.sources.structured import read_json_quarantined

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"name": "糖尿病", "icd_code": "E11"}\n'
        "{this is not json}\n"
        '{"name": "高血压", "icd_code": "I10"}\n'
        '{"name": "截断的\n',
        encoding="utf-8",
    )
    schema = T.StructType(
        [
            T.StructField("name", T.StringType(), True),
            T.StructField("icd_code", T.StringType(), True),
        ]
    )
    good, bad = read_json_quarantined(spark, str(p), schema)
    assert {r["name"] for r in good.collect()} == {"糖尿病", "高血压"}
    bad_rows = [r["_corrupt_record"] for r in bad.collect()]
    assert len(bad_rows) == 2
    assert any("not json" in b for b in bad_rows)
