#!/usr/bin/env python
"""spark-submit entry point for KG-embedding training over a saved graph.

    spark-submit --py-files kgspark.zip scripts/train_embeddings.py \
        --graph /path/to/kg --out /path/to/emb \
        [--dim 16] [--epochs 5] [--n-batches 0] [--eval] [--cpus N]

Closes the embedding loop over a graph produced by run_pipeline.py /
save_graph: load edges -> deterministic fixed-point TransE
(ops/transe.py; corruptions from ops/kg_sampling.py) -> write entity +
relation embedding tables as parquet (bigint fixed-point units AND an
array<double> view for the ANN tier in ops/similarity.py). With --eval,
also runs the filtered link-prediction ranking over the training edges
and prints MRR / Hits@k. Deterministic end to end: rerunning the job
over the same graph reproduces the same vectors bit-for-bit.

Cites: the reference repo stops at graph storage + rule retrieval
(insurance_medical_kgqa/graph_retriever.py); this stage is part of the
100 TB training-data surface the Spark engine adds on top.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", required=True, help="dir with an edges/ parquet table")
    ap.add_argument("--out", required=True)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument(
        "--n-batches",
        type=int,
        default=0,
        help="deterministic hash mini-batching (0 = full batch)",
    )
    ap.add_argument("--eval", action="store_true", help="filtered MRR/Hits@k on train")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from kgspark.ops.transe import (
        embeddings_to_float,
        link_prediction_ranks,
        lp_metrics,
        transe_train,
    )
    from kgspark.session import get_spark

    spark = get_spark("kgspark-train-embeddings", cpus=args.cpus)
    edges = spark.read.parquet(f"{args.graph}/edges").select(
        "src_id", "rel", "dst_id"
    )
    ent, rel = transe_train(
        edges,
        dim=args.dim,
        epochs=args.epochs,
        n_batches=args.n_batches or None,
    )
    ent.write.mode("overwrite").parquet(f"{args.out}/entities")
    rel.write.mode("overwrite").parquet(f"{args.out}/relations")
    embeddings_to_float(ent).write.mode("overwrite").parquet(
        f"{args.out}/entities_float"
    )
    summary = {
        "entities": spark.read.parquet(f"{args.out}/entities").count(),
        "relations": spark.read.parquet(f"{args.out}/relations").count(),
        "dim": args.dim,
        "epochs": args.epochs,
    }
    if args.eval:
        ranks = link_prediction_ranks(edges, ent, rel, filter_triples=edges)
        (m,) = lp_metrics(ranks).collect()
        summary.update(
            {
                "eval_n": m["n"],
                "mrr": round(m["rr_micro_sum"] / m["n"] / 1e6, 4),
                "hits_1": m["hits_1"],
                "hits_3": m["hits_3"],
                "hits_10": m["hits_10"],
            }
        )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
