"""Structured Streaming wrapper: micro-batch extraction + watermarked windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark import fixtures, schemas, streaming
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


def test_stream_first_seen_urls_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState: a url arriving in a later micro-batch must be
    dropped; distinct urls pass exactly once."""
    src = str(tmp_path / "pages_in")
    batch1 = fixtures.web_pages_spark_small(spark, 100)
    batch1.write.parquet(src)
    q = streaming.stream_first_seen_urls(spark, src, query_name="fs1")
    q.awaitTermination(120)
    n1 = spark.sql("SELECT count(*) AS n FROM fs1").collect()[0]["n"]
    assert n1 == 100

    # second file: 50 repeats + 50 new urls
    repeats = fixtures.web_pages_pdf(150)
    df2 = spark.createDataFrame(repeats.iloc[50:150])
    df2.write.mode("append").parquet(src)
    q2 = streaming.stream_first_seen_urls(spark, src, query_name="fs2")
    q2.awaitTermination(120)
    # fresh query (fresh state): sees 150 distinct urls once each
    n2 = spark.sql("SELECT count(*) AS n FROM fs2").collect()[0]["n"]
    urls = spark.sql("SELECT url FROM fs2").collect()
    assert n2 == 150
    assert len({r["url"] for r in urls}) == 150


def test_stream_update_graph_incremental(spark, tmp_path):
    """Streaming -> live graph: two micro-batch waves of pages produce the
    same graph as batch extraction over the union of pages."""
    from kgspark import fixtures
    from kgspark.construct.graph import build_graph, edges_from_triples
    from kgspark.extract.html import with_extracted_text
    from kgspark.extract.openie import extract_doc_triples
    from kgspark.streaming import stream_update_graph

    inp = str(tmp_path / "in")
    graph = str(tmp_path / "graph")
    ckpt = str(tmp_path / "ckpt")
    all_pages = fixtures.web_pages_df(spark, 600)
    all_pages.filter("url LIKE '%/page/1%'").write.mode("append").parquet(inp)

    q = stream_update_graph(spark, inp, graph, ckpt, n_buckets=8)
    q.awaitTermination(120)
    all_pages.filter("url NOT LIKE '%/page/1%'").write.mode("append").parquet(inp)
    q2 = stream_update_graph(spark, inp, graph, ckpt, n_buckets=8)
    q2.awaitTermination(120)

    got_edges = {
        (r["src_id"], r["rel"], r["dst_id"])
        for r in spark.read.parquet(f"{graph}/edges").collect()
    }
    triples = extract_doc_triples(with_extracted_text(all_pages)).select(
        "subj", "subj_type", "pred", "obj", "obj_type"
    )
    exp_edges = {
        (r["src_id"], r["rel"], r["dst_id"])
        for r in edges_from_triples(triples).collect()
    }
    assert got_edges == exp_edges and len(exp_edges) > 0


def test_stream_sessionize_native_session_window(spark, tmp_path):
    """Streaming session_window result == batch session_window over the same
    events once the stream is drained (availableNow)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kgspark.streaming import stream_sessionize

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for user in range(3):
        t = base + dt.timedelta(minutes=user)
        for burst in range(3):
            for i in range(4):
                rows.append((eid, t, user, "click", 1.0, "{}"))
                eid += 1
                t += dt.timedelta(minutes=5)
            t += dt.timedelta(hours=2)  # close the session
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    inp = str(tmp_path / "events_in")
    events.write.mode("overwrite").parquet(inp)

    q = stream_sessionize(spark, inp, query_name="t_sessions", gap="30 minutes")
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM t_sessions").collect()
    }
    exp = {
        (r["user_id"], r["w"]["start"], r["n"])
        for r in events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(exp) == 9  # 3 users x 3 sessions in batch mode
    # Append mode only emits sessions the watermark has CLOSED: the last
    # session per user ends after (max event ts - 1h watermark), so it stays
    # in state when the availableNow drain finishes — correct streaming
    # semantics, it would flush on the next batch of later data.
    last_per_user = {}
    for u, start, n in exp:
        if u not in last_per_user or start > last_per_user[u][1]:
            last_per_user[u] = (u, start, n)
    exp_closed = exp - set(last_per_user.values())
    assert got == exp_closed and len(got) == 6


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Re-crawled urls inside the watermark window are dropped; each url
    survives exactly once (all fixture re-crawls land within the delay)."""
    from kgspark import fixtures, streaming

    src = str(tmp_path / "wm_src")
    pages = fixtures.web_pages_spark_small(spark, 40)
    dup = pages.limit(15)  # same urls + same warc_ts -> in-window duplicates
    pages.unionByName(dup).write.parquet(src)

    q = streaming.stream_dedup_within_watermark(spark, src, query_name="dedup_wm_t")
    q.awaitTermination(120)
    out = spark.sql("SELECT url FROM dedup_wm_t").collect()
    urls = [r["url"] for r in out]
    assert len(urls) == 40 and len(set(urls)) == 40


def test_stream_publish_graph_versions(spark, tmp_path):
    """Each micro-batch commits one snapshot: after two batches the publish
    dir holds versions [1, 2], the current snapshot equals the working
    graph, and time travel to v1 shows only batch 1's entities."""
    from kgspark import fixtures, streaming
    from kgspark.construct.graph import current_graph_version, load_graph

    src = str(tmp_path / "pub_src")
    fixtures.web_pages_spark_small(spark, 10).write.parquet(src)

    kw = dict(
        work_dir=str(tmp_path / "work"),
        publish_dir=str(tmp_path / "pub"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_buckets=4,
    )
    q = streaming.stream_publish_graph(spark, src, **kw)
    q.awaitTermination(180)
    assert current_graph_version(kw["publish_dir"]) == 1
    v1_nodes, _ = load_graph(spark, kw["publish_dir"])
    n1 = v1_nodes.count()
    assert n1 > 0

    # second batch: new docs with new entities
    fixtures.web_pages_spark_small(spark, 30).filter(
        "url NOT IN (SELECT url FROM parquet.`" + src + "`)"
    ).write.mode("append").parquet(src)
    q2 = streaming.stream_publish_graph(spark, src, **kw)
    q2.awaitTermination(180)
    assert current_graph_version(kw["publish_dir"]) == 2
    v2_nodes, _ = load_graph(spark, kw["publish_dir"])
    assert v2_nodes.count() > n1
    old_nodes, _ = load_graph(spark, kw["publish_dir"], version=1)
    assert old_nodes.count() == n1  # time travel unaffected by the merge


def test_stream_curate_gates_and_log(spark, tmp_path):
    """Continuous curation ingest: in-window url re-fetches dedup natively,
    the micro-batch applies lang/quality gates plus decontamination against
    a static eval set, survivors land in docs/ and the per-epoch lineage
    row records in/kept counts."""
    import datetime as dt

    from kgspark import streaming

    ts = dt.datetime(2026, 1, 1, 12, 0, 0)
    good = (
        "the document number {i} talks about spark joins and the shuffles "
        "and the aggregation strategies in detail across many more sentences "
        "covering the methodology and the conclusions"
    )
    rows = [(f"https://ex.com/{i}", ts, None, good.format(i=i), "en") for i in range(25)]
    rows += rows[:5]  # same url + same warc_ts -> in-window re-fetches
    rows.append(("https://ex.com/lowq", ts, None, "!!! ??? ...", "en"))
    rows.append((
        "https://ex.com/contam", ts, None,
        "the secret eval benchmark passage tokens appear and the rest of the "
        "discussion continues in fluent prose about the findings and the methods",
        "en",
    ))
    src = str(tmp_path / "cur_src")
    spark.createDataFrame(rows, schemas.WEB_PAGES).write.parquet(src)

    ev = spark.createDataFrame(
        [(0, "secret eval benchmark passage tokens appear")],
        "doc_id long, text string",
    )
    out = str(tmp_path / "cur_out")
    q = streaming.stream_curate(
        spark, src, out, str(tmp_path / "cur_ckpt"),
        eval_docs=ev, decontam_n=5,
    )
    q.awaitTermination(180)

    docs = spark.read.parquet(f"{out}/docs")
    urls = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert len(urls) == 25 and len(set(urls)) == 25  # dup/lowq/contam all gone
    assert "https://ex.com/lowq" not in urls
    assert "https://ex.com/contam" not in urls

    log = spark.read.parquet(f"{out}/_curate_log").collect()
    assert sum(r["docs_in"] for r in log) == 27  # post-watermark-dedup
    assert sum(r["docs_kept"] for r in log) == 25
