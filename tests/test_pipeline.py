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


def test_merge_into_graph_equals_full_rebuild(spark, tmp_path):
    """Incremental maintenance contract: save(batch1) + merge(batch2) must
    equal build(batch1 + batch2) bit-for-bit — including cross-batch
    last-write-wins, null-deletes-key, stubs, and edge dedup — while only
    rewriting the buckets batch2 touches."""
    from kgspark.construct import graph as g
    from pyspark.sql import functions as F

    rec_schema = "label string, name string, props map<string,string>, seq long"
    tri_schema = "subj string, subj_type string, pred string, obj string, obj_type string"
    b1_records = spark.createDataFrame(
        [
            ("Disease", "糖尿病", {"icd": "E11", "desc": "old"}, 0),
            ("Disease", "高血压", {"icd": "I10"}, 1),
            ("Drug", "二甲双胍", {"form": "片剂"}, 2),
        ],
        rec_schema,
    )
    b1_triples = spark.createDataFrame(
        [
            ("糖尿病", "Disease", "TREATED_BY", "二甲双胍", "Drug"),
            ("糖尿病", "Disease", "HAS_SYMPTOM", "乏力", "Symptom"),
        ],
        tri_schema,
    )
    b2_records = spark.createDataFrame(
        [
            ("Disease", "糖尿病", {"icd": "E11.9", "desc": None}, 0),  # LWW + null-delete
            ("Disease", "冠心病", {"icd": "I25"}, 1),                   # new node
        ],
        rec_schema,
    )
    b2_triples = spark.createDataFrame(
        [
            ("糖尿病", "Disease", "TREATED_BY", "二甲双胍", "Drug"),   # dup edge
            ("冠心病", "Disease", "HAS_SYMPTOM", "胸痛", "Symptom"),   # new edge
        ],
        tri_schema,
    )

    out = str(tmp_path / "graph")
    nodes1, edges1 = g.build_graph([b1_records], b1_triples)
    g.save_graph(nodes1, edges1, out, n_buckets=8)
    report = g.merge_into_graph(spark, out, [b2_records], b2_triples, n_buckets=8)
    assert 0 < report["affected_buckets"] <= 8

    got_nodes = {
        (r["label"], r["name"]): dict(r["props"])
        for r in spark.read.parquet(f"{out}/nodes").collect()
    }
    got_edges = {
        (r["src_id"], r["rel"], r["dst_id"])
        for r in spark.read.parquet(f"{out}/edges").collect()
    }

    # full rebuild: batch2 records sequenced strictly after batch1
    full_records = b1_records.unionByName(b2_records.withColumn("seq", F.col("seq") + 100))
    fnodes, fedges = g.build_graph([full_records], b1_triples.unionByName(b2_triples))
    exp_nodes = {(r["label"], r["name"]): dict(r["props"]) for r in fnodes.collect()}
    exp_edges = {(r["src_id"], r["rel"], r["dst_id"]) for r in fedges.collect()}

    assert got_nodes == exp_nodes
    assert got_edges == exp_edges
    assert got_nodes[("Disease", "糖尿病")] == {"icd": "E11.9"}  # desc deleted
    report2 = g.validate_graph(
        spark.read.parquet(f"{out}/nodes"), spark.read.parquet(f"{out}/edges")
    )
    assert report2 == {"id_collisions": 0, "dup_keys": 0, "dangling_edges": 0}


def test_merge_into_graph_leaves_untouched_buckets_alone(spark, tmp_path):
    """Scale contract: dynamic partition overwrite must not rewrite bucket
    partitions the batch does not touch (file listing identical)."""
    import os

    from kgspark.construct import graph as g

    rec_schema = "label string, name string, props map<string,string>, seq long"
    tri_schema = "subj string, subj_type string, pred string, obj string, obj_type string"
    base = spark.createDataFrame(
        [("Disease", f"病{i}", {"k": str(i)}, i) for i in range(40)], rec_schema
    )
    tri = spark.createDataFrame(
        [(f"病{i}", "Disease", "HAS_SYMPTOM", f"症{i}", "Symptom") for i in range(40)],
        tri_schema,
    )
    out = str(tmp_path / "graph")
    nodes, edges = g.build_graph([base], tri)
    g.save_graph(nodes, edges, out, n_buckets=16)

    def files(sub):
        found = {}
        for root, _, names in os.walk(f"{out}/{sub}"):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    found[p] = os.path.getmtime(p)
        return found

    before_nodes, before_edges = files("nodes"), files("edges")
    one = spark.createDataFrame(
        [("Disease", "病0", {"k": "updated"}, 0)], rec_schema
    )
    one_tri = spark.createDataFrame(
        [("病0", "Disease", "HAS_SYMPTOM", "新症", "Symptom")], tri_schema
    )
    report = g.merge_into_graph(spark, out, [one], one_tri, n_buckets=16)
    assert report["affected_buckets"] < 16  # strictly partial rewrite

    after_nodes, after_edges = files("nodes"), files("edges")
    changed_n = {p for p in before_nodes if after_nodes.get(p) != before_nodes[p]}
    changed_e = {p for p in before_edges if after_edges.get(p) != before_edges[p]}
    # only affected bucket dirs may change; at least one untouched bucket file
    # must survive byte-untouched on both tables
    untouched_n = [p for p in before_nodes if p in after_nodes and p not in changed_n]
    untouched_e = [p for p in before_edges if p in after_edges and p not in changed_e]
    assert len(untouched_n) > 0 and len(untouched_e) > 0


def test_compact_graph_reduces_files_preserves_content(spark, tmp_path):
    """After several incremental merges, compaction must cut the per-bucket
    file count to 1 while leaving the graph content identical."""
    import os

    from kgspark.construct import graph as g

    rec_schema = "label string, name string, props map<string,string>, seq long"
    tri_schema = "subj string, subj_type string, pred string, obj string, obj_type string"
    out = str(tmp_path / "graph")
    # AQE coalescing normally collapses tiny test writes to one file per
    # bucket; disable it so each bucket dir collects one file per shuffle
    # task — the fragmentation shape a real many-task write produces
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        for wave in range(4):
            recs = spark.createDataFrame(
                [("Disease", f"病{wave}_{i}", {"w": str(wave)}, i) for i in range(10)],
                rec_schema,
            )
            tris = spark.createDataFrame(
                [(f"病{wave}_{i}", "Disease", "HAS_SYMPTOM", f"症{i}", "Symptom") for i in range(10)],
                tri_schema,
            )
            g.merge_into_graph(spark, out, [recs], tris, n_buckets=4)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    def n_files(sub):
        return sum(
            1
            for root, _, names in os.walk(f"{out}/{sub}")
            for n in names
            if n.endswith(".parquet")
        )

    before_rows = {
        (r["label"], r["name"]) for r in spark.read.parquet(f"{out}/nodes").collect()
    }
    before_files = n_files("nodes")
    stats = g.compact_graph(spark, out)
    after_rows = {
        (r["label"], r["name"]) for r in spark.read.parquet(f"{out}/nodes").collect()
    }
    assert after_rows == before_rows
    assert stats["nodes"] == len(after_rows)
    assert n_files("nodes") <= 4 < before_files


def test_corpus_cardinality_from_lineage(spark, tmp_path):
    """Lineage sketches answer corpus-level distinct-url questions without
    rescanning: estimate within KMV error of the true count, and stable
    across a resume (latest row per bucket wins, no double counting)."""
    import math

    from kgspark import fixtures
    from kgspark.pipeline import _SKETCH_K, corpus_url_cardinality, run_pipeline

    out = str(tmp_path / "card")
    pages = fixtures.web_pages_df(spark, 1200)
    run_pipeline(spark, pages, out, n_buckets=8)
    est = corpus_url_cardinality(spark, out)
    rse = 1.0 / math.sqrt(_SKETCH_K - 2)
    assert abs(est - 1200) <= 4 * rse * 1200, est

    # a rerun (everything skipped) and a forced re-run of one bucket must
    # not inflate the estimate
    run_pipeline(spark, pages, out, n_buckets=8, run_id="r2", run_seq=2)
    assert corpus_url_cardinality(spark, out) == est


def test_edges_with_provenance(spark):
    """Support counts every assertion; sample_urls are the deterministic
    lexicographic-first urls, capped (bounded per-group state)."""
    from kgspark.construct.graph import edges_with_provenance, entity_id

    rows = [(f"u{i % 5}", "甲", "Disease", "REL", "乙", "Symptom") for i in range(9)]
    rows.append(("ux", "甲", "Disease", "OTHER", "丙", "Drug"))
    dt = spark.createDataFrame(
        rows, "url string, subj string, subj_type string, pred string, obj string, obj_type string"
    )
    got = {
        (r["rel"]): (r["support"], r["sample_urls"])
        for r in edges_with_provenance(dt, max_urls=3).collect()
    }
    assert got["REL"] == (9, ["u0", "u1", "u2"])  # 9 assertions, 5 distinct urls capped at 3
    assert got["OTHER"] == (1, ["ux"])


def test_min_support_noise_gate(spark, tmp_path):
    """min_support=2 drops facts asserted by a single document while
    keeping facts repeated across documents (fixture docs share their
    hot-symptom sentences; each doc also has unique assertions)."""
    from kgspark import fixtures
    from kgspark.pipeline import run_pipeline

    pages = fixtures.web_pages_df(spark, 300)
    out_a, out_b = str(tmp_path / "all"), str(tmp_path / "gated")
    res_all = run_pipeline(spark, pages, out_a, n_buckets=4)
    res_gated = run_pipeline(spark, pages, out_b, n_buckets=4, min_support=2)
    e_all = spark.read.parquet(f"{out_a}/edges").count()
    e_gated = spark.read.parquet(f"{out_b}/edges").count()
    assert 0 < e_gated < e_all


def test_min_support_counts_distinct_docs_not_rows(spark, tmp_path):
    """A single document repeating the same triple must NOT satisfy
    min_support=2 (ADVICE r1: the gate counts distinct source docs, not
    assertion rows); the same triple from two docs must."""
    import pandas as pd

    from kgspark.pipeline import graph_stage

    rows = [
        # one doc asserts (A, REL, B) twice -> support must be 1
        {"url": "u1", "subj": "A", "subj_type": "Disease", "pred": "REL",
         "obj": "B", "obj_type": "Disease", "bucket": 0},
        {"url": "u1", "subj": "A", "subj_type": "Disease", "pred": "REL",
         "obj": "B", "obj_type": "Disease", "bucket": 0},
        # two docs assert (C, REL, D) once each -> support 2, survives
        {"url": "u1", "subj": "C", "subj_type": "Disease", "pred": "REL",
         "obj": "D", "obj_type": "Disease", "bucket": 0},
        {"url": "u2", "subj": "C", "subj_type": "Disease", "pred": "REL",
         "obj": "D", "obj_type": "Disease", "bucket": 1},
    ]
    out = str(tmp_path / "g")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(f"{out}/doc_triples")
    _, edges = graph_stage(spark, out, n_buckets=4, canonicalize=False, min_support=2)
    from kgspark.construct.graph import entity_id
    from pyspark.sql import functions as F

    kept = spark.read.parquet(f"{out}/edges")
    names = spark.createDataFrame(
        [("Disease", n) for n in "ABCD"], "label string, name string"
    ).select("name", entity_id(F.col("label"), F.col("name")).alias("eid"))
    ids = {r["name"]: r["eid"] for r in names.collect()}
    got = {(r["src_id"], r["dst_id"]) for r in kept.collect()}
    assert (ids["C"], ids["D"]) in got
    assert (ids["A"], ids["B"]) not in got
