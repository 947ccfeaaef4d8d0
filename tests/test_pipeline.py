"""Flagship web pipeline: lineage, checkpoint-resume, idempotence, canonicalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark import fixtures, pipeline


def _counts(spark, out):
    nodes = spark.read.parquet(f"{out}/nodes")
    edges = spark.read.parquet(f"{out}/edges")
    return nodes.count(), edges.count()


def test_pipeline_end_to_end(spark, tmp_path):
    n = 400
    pages = fixtures.web_pages_spark_small(spark, n)
    out = str(tmp_path / "kg")
    res = pipeline.run_pipeline(spark, pages, out, n_buckets=8, run_id="r1")
    assert res.n_docs == n
    assert res.n_buckets_processed == 8
    assert res.n_buckets_skipped == 0
    assert res.n_triples > n  # several triples per doc

    nodes = spark.read.parquet(f"{out}/nodes")
    edges = spark.read.parquet(f"{out}/edges")
    assert nodes.filter("label = 'Disease'").count() > 0
    assert edges.count() > 0
    # canonicalization folded '-重度' variants into base names
    assert nodes.filter(F.col("name").endswith("-重度")).count() == 0

    lin = spark.read.parquet(f"{out}/lineage")
    assert lin.select("bucket").distinct().count() == 8
    assert lin.agg(F.sum("n_docs")).collect()[0][0] == n


def test_pipeline_resume_skips_done_buckets(spark, tmp_path):
    """Kill/rerun semantics: a partial run (subset of buckets) followed by a
    resumed full run must produce exactly the same graph as one clean run,
    with no double-counted lineage."""
    n = 300
    pages = fixtures.web_pages_spark_small(spark, n)
    out_a = str(tmp_path / "resumed")
    out_b = str(tmp_path / "clean")

    # simulated failure: first run only sees buckets 0-3's documents
    partial = pages.filter(
        F.pmod(F.xxhash64("url"), F.lit(8)).cast("int") < 4
    )
    pipeline.extract_stage(spark, partial, out_a, n_buckets=8, run_id="r1", run_seq=1)

    # resumed run over the full input: must skip the 4 finished buckets
    processed, skipped = pipeline.extract_stage(
        spark, pages, out_a, n_buckets=8, run_id="r2", run_seq=2, resume=True
    )
    assert skipped == 4
    assert processed == 4
    pipeline.graph_stage(spark, out_a, n_buckets=8)

    res_b = pipeline.run_pipeline(spark, pages, out_b, n_buckets=8, run_id="clean")
    assert res_b.n_docs == n

    na, ea = _counts(spark, out_a)
    nb, eb = _counts(spark, out_b)
    assert (na, ea) == (nb, eb)
    # content-identical, not just count-identical
    for t in ["nodes", "edges"]:
        a = spark.read.parquet(f"{out_a}/{t}").drop("bucket")
        b = spark.read.parquet(f"{out_b}/{t}").drop("bucket")
        if "props" in a.columns:  # set ops can't compare map columns
            a = a.withColumn("props", F.to_json("props"))
            b = b.withColumn("props", F.to_json("props"))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # lineage: latest row per bucket sums to exactly n docs (no double count)
    lin = spark.read.parquet(f"{out_a}/lineage")
    latest = lin.groupBy("bucket").agg(F.max_by("n_docs", "run_seq").alias("n_docs"))
    assert latest.agg(F.sum("n_docs")).collect()[0][0] == n


def test_rerun_is_idempotent(spark, tmp_path):
    n = 200
    pages = fixtures.web_pages_spark_small(spark, n)
    out = str(tmp_path / "idem")
    r1 = pipeline.run_pipeline(spark, pages, out, n_buckets=4, run_id="a", run_seq=1)
    # second full run with resume: everything skipped, same totals
    r2 = pipeline.run_pipeline(spark, pages, out, n_buckets=4, run_id="b", run_seq=2)
    assert r2.n_buckets_skipped == 4
    assert r2.n_buckets_processed == 0
    assert (r1.n_docs, r1.n_triples) == (r2.n_docs, r2.n_triples)
