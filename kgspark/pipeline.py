"""Flagship web-scale pipeline: web pages -> triples -> graph, resumable.

The reference's text path is one LLM call per document and one Cypher
round-trip per triple (text_graph_builder.py:23-91) — the scalability
anti-pattern the north rule replaces. Here the same semantics run as two
stages over an (url, warc_ts, html, text, lang) corpus:

Stage 1 — per-bucket, checkpoint-resumable (the expensive scan):
  bucket = pmod(xxhash64(url), n_buckets)   (Iceberg-style hidden partition)
  HTML->text (X5, Arrow UDF) -> OpenIE triples (X1, mapInPandas)
  -> triples written with dynamic partition overwrite per bucket
  -> one lineage row per bucket (url range, doc/triple counts, run id).
  On rerun, buckets with status='done' are anti-joined away before any
  extraction work happens; re-processing a bucket overwrites exactly its
  own partition (idempotent).

Stage 2 — global, cheap, idempotent (runs on the columnar triple store):
  surface-form canonicalization (X7 connected components)
  -> nodes/edges canonicalization + dedup -> bucketed graph tables.

At 10^12 documents stage 1 dominates; its unit of retry/skip is the bucket,
so a failed cluster loses at most one bucket's work. Stage 2 is a full
recompute over extracted triples — deliberately: triples are ~10^-3 the
corpus bytes, and an idempotent overwrite is simpler and safer than
incremental graph maintenance.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark.construct import graph as g
from kgspark.extract import components, openie

_SKETCH_K = 64  # per-bucket KMV url-sketch size (rse ~ 1/sqrt(k-2) ~ 13%)


@dataclass
class PipelineResult:
    n_docs: int
    n_triples: int
    n_buckets_processed: int
    n_buckets_skipped: int


def _lineage_done_buckets(spark: SparkSession, lineage_path: str) -> DataFrame | None:
    try:
        lin = spark.read.parquet(lineage_path)
    except Exception:
        return None
    # latest row per bucket wins (a bucket reprocessed after a failed run)
    latest = lin.groupBy("bucket").agg(F.max_by("status", "run_seq").alias("status"))
    return latest.filter(F.col("status") == "done").select("bucket")


def extract_stage(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    run_id: str = "run-0",
    run_seq: int = 0,
    resume: bool = True,
) -> tuple[int, int]:
    """Stage 1. Returns (buckets_processed, buckets_skipped)."""
    triples_path = f"{out_dir}/doc_triples"
    lineage_path = f"{out_dir}/lineage"

    pages = pages.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))

    skipped = 0
    if resume:
        done = _lineage_done_buckets(spark, lineage_path)
        if done is not None:
            done_ids = [r["bucket"] for r in done.collect()]  # <= n_buckets ints
            skipped = len(done_ids)
            if done_ids:
                pages = pages.filter(~F.col("bucket").isin(done_ids))

    # fused single Python stage: HTML->text + OpenIE in one Arrow round-trip
    doc_triples = openie.extract_doc_triples(pages, fused_html=True)
    # mapInPandas consumes declared columns only; re-derive bucket from url so
    # the triple store partitions identically to the input split.
    doc_triples = doc_triples.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    doc_triples.write.mode("overwrite").partitionBy("bucket").parquet(triples_path)

    # lineage from what was actually written (columnar re-read, cheap) plus
    # per-bucket doc counts from the input split (url column only — the scan
    # prunes html/text, so no extraction re-runs here).
    written = spark.read.parquet(triples_path)
    processed = pages.select(
        "url", "bucket", F.col("text").isNull().cast("long").alias("from_html")
    )
    doc_stats = processed.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.min("url").alias("url_min"),
        F.max("url").alias("url_max"),
        F.sum("from_html").alias("n_html_extracted"),
    )
    # per-bucket KMV url sketch (<= _SKETCH_K hashes): lineage rows double as
    # mergeable cardinality summaries — corpus-level distinct-url questions
    # are answered from lineage alone, no rescan (corpus_url_cardinality).
    # kmv_sketch's sort-based plan bounds per-group state at k rows.
    from kgspark.ops.sketch import kmv_sketch

    url_sketches = kmv_sketch(processed, "url", ["bucket"], k=_SKETCH_K).withColumnRenamed(
        "sketch", "url_sketch"
    )
    doc_stats = doc_stats.join(url_sketches, "bucket", "left")
    triple_stats = written.groupBy("bucket").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("pred").alias("n_preds"),
        F.countDistinct("subj").alias("n_subjects"),
    )
    lineage = (
        doc_stats.join(triple_stats, "bucket", "left")
        .select(
            "bucket",
            F.lit(run_id).alias("run_id"),
            F.lit(run_seq).cast("long").alias("run_seq"),
            "url_min",
            "url_max",
            "n_docs",
            F.coalesce("n_html_extracted", F.lit(0)).alias("n_html_extracted"),
            F.coalesce("n_triples", F.lit(0)).alias("n_triples"),
            F.coalesce("n_preds", F.lit(0)).alias("n_preds"),
            F.coalesce("n_subjects", F.lit(0)).alias("n_subjects"),
            "url_sketch",
            F.lit("done").alias("status"),
        )
    )
    lineage.write.mode("append").parquet(lineage_path)
    return (lineage.count(), skipped)


def graph_stage(
    spark: SparkSession,
    out_dir: str,
    n_buckets: int = 64,
    canonicalize: bool = True,
    min_support: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Stage 2: triple store -> canonicalized, deduplicated graph tables.

    ``min_support``: keep only assertions whose (subj, pred, obj) was
    extracted from at least this many documents — the provenance-count
    noise gate (single-document extraction errors disappear; repeated
    facts survive). Applied BEFORE canonicalization so spurious surface
    forms don't seed alias components either.
    """
    triples = spark.read.parquet(f"{out_dir}/doc_triples").drop("bucket")
    if min_support and min_support > 1:
        key = ["subj", "subj_type", "pred", "obj", "obj_type"]
        # distinct docs, not assertion rows: one document repeating a triple
        # must not satisfy the gate (it exists to kill single-document errors)
        support = (
            triples.select(*key, "url").distinct()
            .groupBy(*key).agg(F.count("*").alias("n_sup"))
            .where(F.col("n_sup") >= min_support).drop("n_sup")
        )
        triples = triples.join(support, key, "left_semi")
    if canonicalize:
        names = (
            triples.select(F.col("subj_type").alias("label"), F.col("subj").alias("name"))
            .union(triples.select(F.col("obj_type"), F.col("obj")))
            .filter(F.col("label") == "Disease")
            .distinct()
        )
        mapping = components.canonical_surface_forms(names).filter(
            F.col("name") != F.col("canonical")
        )
        triples = components.apply_canonicalization(triples, mapping, types=("Disease",))

    tr = triples.select("subj", "subj_type", "pred", "obj", "obj_type")
    nodes, edges = g.build_graph(
        [spark.createDataFrame([], schema="label string, name string, props map<string,string>, seq long")],
        tr,
    )
    g.save_graph(nodes, edges, out_dir, n_buckets=n_buckets)
    return nodes, edges


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 64,
    run_id: str = "run-0",
    run_seq: int = 0,
    resume: bool = True,
    canonicalize: bool = True,
    min_support: int | None = None,
) -> PipelineResult:
    processed, skipped = extract_stage(
        spark, pages, out_dir, n_buckets, run_id, run_seq, resume
    )
    nodes, edges = graph_stage(spark, out_dir, n_buckets, canonicalize, min_support)
    lin = spark.read.parquet(f"{out_dir}/lineage")
    latest = lin.groupBy("bucket").agg(
        F.max_by(F.struct("n_docs", "n_triples"), "run_seq").alias("s")
    )
    totals = latest.agg(
        F.sum("s.n_docs").alias("docs"), F.sum("s.n_triples").alias("triples")
    ).collect()[0]
    return PipelineResult(
        n_docs=totals["docs"] or 0,
        n_triples=totals["triples"] or 0,
        n_buckets_processed=processed,
        n_buckets_skipped=skipped,
    )


def corpus_url_cardinality(spark: SparkSession, out_dir: str, k: int = _SKETCH_K) -> int:
    """Approximate distinct-url count of everything this pipeline has
    processed, answered FROM THE LINEAGE TABLE ALONE — no corpus or triple
    rescan. Latest lineage row per bucket (resume semantics) -> merge the
    per-bucket KMV sketches -> estimate. The url-hash bucketing makes the
    per-bucket sketches disjoint-domain, but KMV merge does not need that
    property; it is correct for arbitrary overlap (ops/sketch.py)."""
    from kgspark.ops.sketch import kmv_estimate, kmv_merge

    lin = spark.read.option("mergeSchema", "true").parquet(f"{out_dir}/lineage")
    latest = (
        lin.groupBy("bucket")
        .agg(F.max_by(F.col("url_sketch"), F.col("run_seq")).alias("sketch"))
        .where(F.col("sketch").isNotNull())
        .withColumn("all", F.lit(1))
    )
    merged = kmv_merge(latest, ["all"], k=k)
    rows = kmv_estimate(merged, k=k).collect()
    return int(rows[0]["est_distinct"]) if rows else 0
