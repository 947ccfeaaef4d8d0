#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Queries (each timed to full materialization via count/collect):
  kg_build_tpch     — full KG construction over the TPC-H-ish tables
  openie_pipeline   — web corpus synth + HTML->text + OpenIE + dedup to edges
                      (the flagship path; corpus size = KGSPARK_BENCH_DOCS)
  q1_pricing        — TPC-H Q1-style aggregate over lineitem
  minhash_dedup     — MinHash+LSH near-dup clustering over documents
  ann_topk          — brute-force cosine top-10 for 8 queries over embeddings

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), KGSPARK_BENCH_DOCS (default 120000).
Also reports triples_per_sec for the flagship path.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("KGSPARK_BENCH_DOCS", "120000"))

    from kgspark.session import get_spark

    def cpu_jiffies() -> tuple[int, int]:
        # (steal, total) jiffies from /proc/stat line 1. Steal is the
        # hypervisor-level co-tenant signal loadavg cannot separate from
        # our own 32 worker threads: it counts time the vCPUs were
        # runnable but the host gave the core to someone else.
        try:
            with open("/proc/stat") as fh:
                parts = fh.readline().split()[1:]
            vals = [int(x) for x in parts]
            steal = vals[7] if len(vals) > 7 else 0
            return steal, sum(vals)
        except OSError:  # non-Linux fallback
            return 0, 0

    load_at_start = os.getloadavg()  # co-tenant load BEFORE we add our own
    spark = get_spark("kgspark-bench", cpus=cpus)
    # sample steal from AFTER session startup: averaging over the ~40 s of
    # mostly-idle JVM/py4j boot would dilute the burst steal that actually
    # stalls the 32-wide stage barriers during the timed section
    steal0, jiff0 = cpu_jiffies()
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        fn()  # warm-up: codegen compile, parquet footers, python workers
        best = float("inf")
        for _ in range(3):  # best-of-3 steady state (local-mode GC noise)
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # --- kg_build_tpch ------------------------------------------------------
    from kgspark.tpch_graph import build_tpch_graph

    def kg_build():
        nodes, edges = build_tpch_graph(spark, sf_dir)
        extras["kg_nodes"] = nodes.count()
        extras["kg_edges"] = edges.count()

    timed("kg_build_tpch", kg_build)

    # --- openie_pipeline (flagship) ----------------------------------------
    from kgspark import fixtures
    from kgspark.construct.graph import edges_from_triples
    from kgspark.extract.openie import extract_doc_triples

    pages = fixtures.web_pages_df(spark, n_docs).localCheckpoint()  # synth off the clock
    n_pages = pages.count()
    # warm the Python UDF workers off the clock (per-JVM import cost, not throughput)
    extract_doc_triples(pages.limit(2000), fused_html=True).count()

    def openie():
        triples = extract_doc_triples(pages, fused_html=True)
        edges = edges_from_triples(triples)
        extras["openie_docs"] = n_pages
        extras["openie_edges"] = edges.count()

    timed("openie_pipeline", openie)
    # triple throughput: count triples once more outside the timed region
    n_triples = extract_doc_triples(pages, fused_html=True).count()
    extras["openie_triples"] = n_triples
    extras["triples_per_sec"] = round(n_triples / timings["openie_pipeline"], 1)
    extras["docs_per_sec"] = round(n_pages / timings["openie_pipeline"], 1)

    # --- q1_pricing ---------------------------------------------------------
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def q1():
        (
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
                F.avg("l_discount").alias("avg_disc"),
                F.count("*").alias("n"),
            )
            .collect()
        )

    timed("q1_pricing", q1)

    # --- q3_join (3-way join + broadcast dim + top-k) -----------------------
    import __spark_entry__ as entry

    q3 = entry.queries()["q3_shipping_priority"]

    def q3_join():
        q3(spark, sf_dir).collect()

    timed("q3_join", q3_join)

    # --- asof_join (point-in-time join, single-shuffle union-window) --------
    from kgspark.ops.asof import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id", "ts")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_custkey AS user_id", "o_orderdate", "o_orderkey", "o_totalprice"
    )

    def asof():
        extras["asof_rows"] = asof_join(
            ev, od, on="user_id", left_ts="ts", right_ts="o_orderdate",
            right_cols=["o_orderkey", "o_totalprice"],
        ).count()

    timed("asof_join", asof)

    # --- minhash_dedup ------------------------------------------------------
    from kgspark.ops.dedup import minhash_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def dedup():
        # repartition: documents ships as one small file -> one split; fan it
        # out so the signature stage parallelizes (no-op at corpus scale)
        out = minhash_dedup(docs, threshold=0.7, repartition=cpus)
        extras["dedup_clusters"] = out.filter("is_representative").count()

    timed("minhash_dedup", dedup)

    # --- ann_topk -----------------------------------------------------------
    from kgspark.ops.similarity import cosine_topk_arrow

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.limit(8).collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]

    def ann():
        extras["ann_rows"] = cosine_topk_arrow(emb, queries, k=10).count()

    timed("ann_topk", ann)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    # host load at measurement time: a shared box under co-tenant load has
    # inflated EVERY wall-clock number some rounds (identical outputs) —
    # recording loadavg makes load-noise vs real regression machine-
    # distinguishable instead of a prose argument (VERDICT r03 #4)
    la1, la5, la15 = os.getloadavg()
    steal1, jiff1 = cpu_jiffies()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (jiff1 - jiff0), 2)
        if jiff1 > jiff0
        else None
    )
    result = {
        "metric": "kg_construction_bench_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "loadavg_start_1m": round(load_at_start[0], 2),
        "loadavg_start_5m": round(load_at_start[1], 2),
        "loadavg_end_1m": round(la1, 2),
        "loadavg_end_15m": round(la15, 2),
        "cpu_steal_pct": steal_pct,
        **extras,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
