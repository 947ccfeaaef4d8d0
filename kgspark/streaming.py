"""Structured Streaming wrapper for the extraction pipeline (optional layer).

The reference is pure batch (SURVEY §2.10) and the north rule asks for
checkpoint-resumable *batch*; this module is the forward path for continuous
ingestion: the same extraction stages wrapped in readStream/foreachBatch so
each micro-batch reuses the batch pipeline's bucket-idempotent writes, plus a
windowed event-rate monitor with watermarked late-data handling.

Both entry points run against file sources so they are drivable in tests via
``processAllAvailable()`` (no Kafka in the sandbox; swap ``format`` on a real
cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark import schemas
from kgspark.extract.html import with_extracted_text
from kgspark.extract.openie import extract_doc_triples


def stream_extract_triples(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Continuous corpus -> triples: file-source stream, per-micro-batch
    extraction via foreachBatch (exactly-once with the checkpoint dir;
    idempotent append since doc triples are keyed by url)."""
    pages = (
        spark.readStream.schema(schemas.WEB_PAGES).parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        triples = extract_doc_triples(with_extracted_text(batch_df))
        triples.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            f"{out_dir}/doc_triples_stream"
        )

    writer = (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_update_graph(
    spark: SparkSession,
    input_dir: str,
    graph_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 32,
    trigger_once: bool = True,
):
    """Continuous corpus -> LIVE graph: each micro-batch is extracted and
    folded into the saved graph via incremental bucket maintenance
    (``construct.graph.merge_into_graph``) — only the entity-id buckets the
    batch touches are rewritten, so steady-state cost tracks batch size, not
    graph size. Exactly-once per micro-batch via the stream checkpoint;
    the merge itself is idempotent (re-merging a batch is a no-op: LWW with
    identical values + distinct edges)."""
    from kgspark.construct.graph import merge_into_graph

    pages = spark.readStream.schema(schemas.WEB_PAGES).parquet(input_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        triples = extract_doc_triples(with_extracted_text(batch_df)).select(
            "subj", "subj_type", "pred", "obj", "obj_type"
        )
        merge_into_graph(spark, graph_dir, [], triples, n_buckets=n_buckets)

    writer = (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_first_seen_urls(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "first_seen",
):
    """Custom stateful operator: emit each url only the first time it is seen
    across micro-batches (streaming exact-dedup by key).

    applyInPandasWithState keeps one boolean per url group in the state
    store; re-crawled pages in later batches are dropped. This is the
    streaming counterpart of ops.dedup.exact_dedup for continuous ingestion.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    pages = spark.readStream.schema(schemas.WEB_PAGES).parquet(input_dir)

    def dedup_fn(key, pdf_iter, state: GroupState):
        if state.exists:
            return iter([])  # seen before -> drop everything
        state.update((True,))
        first = next(pdf_iter)
        return iter([pd.DataFrame({"url": [key[0]], "lang": [first["lang"].iloc[0]]})])

    out = (
        pages.groupBy("url")
        .applyInPandasWithState(
            dedup_fn,
            outputStructType="url string, lang string",
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_rates(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "page_rates",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
):
    """Watermarked tumbling-window ingest monitor: pages/sec per lang.

    Late rows beyond the watermark are dropped (state bounded); append mode
    emits a window only once it is final — the standard production shape.
    """
    pages = spark.readStream.schema(schemas.WEB_PAGES).parquet(input_dir)
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages")
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    query_name: str = "sessions",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
):
    """Event-time session windows per user via the NATIVE session_window
    operator (no UDF, state managed by the streaming engine): a session
    closes after ``gap`` of inactivity and is emitted once the watermark
    passes its end — the standard clickstream-sessionization shape."""
    events = spark.readStream.schema(schemas.EVENTS).parquet(input_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_within_watermark(
    spark: SparkSession,
    input_dir: str,
    delay: str = "1 hour",
    query_name: str = "dedup_wm",
):
    """Native streaming dedup: ``dropDuplicatesWithinWatermark`` on url.

    The state-bounded counterpart of ``stream_first_seen_urls``: that
    operator keeps one state entry per url FOREVER (exact first-seen over
    the whole stream — unbounded state at crawl scale), while this one
    guarantees dedup only among events whose times fall within the
    watermark delay and lets the state store EVICT urls older than the
    watermark. For continuous crawl ingestion, re-fetches cluster within
    hours, so a bounded window catches them with state proportional to the
    delay, not the corpus — choose per retention requirement.
    """
    pages = (
        spark.readStream.schema(schemas.WEB_PAGES)
        .parquet(input_dir)
        .withWatermark("warc_ts", delay)
        .dropDuplicatesWithinWatermark(["url"])
        .select("url", "warc_ts", "lang")
    )
    return (
        pages.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_publish_graph(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    publish_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 32,
    trigger_once: bool = True,
):
    """Continuous corpus -> ATOMICALLY VERSIONED graph: like
    ``stream_update_graph``, but after each micro-batch's incremental merge
    the working graph is committed as a new snapshot
    (``construct.graph.publish_graph``). Readers on ``publish_dir`` get
    snapshot isolation — they never see a half-merged batch, only the last
    committed version — while the merge keeps its batch-sized incremental
    cost. The stream checkpoint + the publish pointer together give
    effectively-once visibility: a crash between merge and publish re-runs
    the (idempotent) merge and publishes once.
    """
    from kgspark.construct.graph import merge_into_graph, publish_graph

    pages = spark.readStream.schema(schemas.WEB_PAGES).parquet(input_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        triples = extract_doc_triples(with_extracted_text(batch_df)).select(
            "subj", "subj_type", "pred", "obj", "obj_type"
        )
        merge_into_graph(spark, work_dir, [], triples, n_buckets=n_buckets)
        nodes = spark.read.parquet(f"{work_dir}/nodes").drop("bucket")
        edges = spark.read.parquet(f"{work_dir}/edges").drop("bucket")
        publish_graph(nodes, edges, publish_dir, n_buckets=n_buckets)

    writer = (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_curate(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    eval_docs: DataFrame | None = None,
    lang: str | None = "en",
    min_quality: float = 0.3,
    dedup_delay: str = "1 hour",
    decontam_n: int = 13,
    trigger_once: bool = True,
):
    """Continuous corpus curation: the batch gates of
    ``ops.curation.build_training_shards`` wrapped for a file-source stream.

    Upstream of the batch reuse, re-fetch dedup runs NATIVELY in the
    stream (``dropDuplicatesWithinWatermark`` on url — state bounded by
    the watermark delay, not the corpus); each micro-batch then applies
    the verified batch operators via foreachBatch — language gate, quality
    gate, and (when ``eval_docs`` is given) benchmark decontamination
    against the STATIC eval set — and appends survivors to
    ``out_dir/docs`` plus one lineage row per epoch to ``out_dir/_curate_log``
    (epoch, docs_in, docs_kept). Exactly-once with the checkpoint dir;
    the append is idempotent per epoch because replays rewrite the same
    epoch id and downstream consumers dedup on (url, epoch) — the same
    contract as ``stream_extract_triples``.

    The near-dup/packing stages stay batch-side (they need corpus-global
    state); this stream is the INGEST half: it keeps the raw firehose from
    ever being re-scanned by the batch curator.
    """
    from kgspark.ops.curation import decontaminate
    from kgspark.ops.textstats import lang_id, quality_features

    pages = (
        spark.readStream.schema(schemas.WEB_PAGES)
        .parquet(input_dir)
        .withWatermark("warc_ts", dedup_delay)
        .dropDuplicatesWithinWatermark(["url"])
        .select(F.col("url").alias("doc_id"), "warc_ts", "text")
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        n_in = batch_df.count()
        d = batch_df.filter(F.col("text").isNotNull())
        if lang is not None:
            d = lang_id(d).filter(F.col("lang_pred") == lang).drop("lang_pred")
        d = quality_features(d).filter(F.col("quality_score") >= min_quality)
        d = d.select("doc_id", "warc_ts", "text")
        if eval_docs is not None:
            d = (
                decontaminate(d, eval_docs, n=decontam_n)
                .filter(~F.col("is_contaminated"))
                .select("doc_id", "warc_ts", "text")
            )
        # one gate pass per micro-batch: materialize before write + count
        kept = d.withColumn("epoch", F.lit(epoch_id)).localCheckpoint(eager=True)
        kept.write.mode("append").parquet(f"{out_dir}/docs")
        spark.createDataFrame(
            [(int(epoch_id), int(n_in), int(kept.count()))],
            "epoch long, docs_in long, docs_kept long",
        ).write.mode("append").parquet(f"{out_dir}/_curate_log")

    writer = pages.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
