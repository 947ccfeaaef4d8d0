"""Negative sampling for KG-embedding training data.

Link-prediction training (TransE/DistMult-family) needs corrupted triples:
for each true (src, rel, dst), sample edges that are NOT in the graph by
replacing the destination. At 10^10-edge scale the sampler must be (a)
distributed, (b) deterministic — reruns and resumes must regenerate the
same training set (the engine-wide contract), and (c) verified negative —
corruptions that happen to be true edges must be filtered, not hoped away.

Design: candidate destination = the node whose dense index equals
md5(src, rel, dst, trial) mod |V| (dense indexes via row_number over
entity_id order — one window over the node table, computed once); the
corruption join is an equi-join on that index; true edges are removed with
a left-anti join. Hash-based choice means no RNG state, no partitioning
sensitivity, and an exact SQL replay (the DuckDB oracle hash-matches).

Filtered trials thin the output (~|E|/|V| of candidates hit true edges —
negligible for sparse KGs); callers needing exactly-k semantics run extra
trials and window-truncate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def negative_samples(
    edges: DataFrame,
    nodes: DataFrame,
    n_per_positive: int = 2,
    salt: str = "neg-v1",
) -> DataFrame:
    """(src_id, rel, dst_id) x nodes -> corrupted (src_id, rel, neg_dst_id)
    rows, up to ``n_per_positive`` per true edge (trials that collide with
    a true edge are dropped). ``salt`` versions the sample set — a new salt
    is a fresh deterministic draw."""
    # dense node indexes via one global-ordered window: a full sort plus a
    # single-task numbering pass. Fine for dictionary-scale node tables and
    # rare invocations (training-set generation); at 10^10 nodes swap in a
    # two-pass per-partition offset numbering behind the same (cand_dst,
    # idx) contract.
    indexed = nodes.select(
        F.col("entity_id").alias("cand_dst"),
        (F.row_number().over(Window.orderBy("entity_id")) - 1).alias("idx"),
    )
    n_nodes = indexed.count()
    trials = edges.select(
        "src_id",
        "rel",
        "dst_id",
        F.explode(F.sequence(F.lit(0), F.lit(n_per_positive - 1))).alias("trial"),
    )
    # 15 hex digits = 60 bits, exact in bigint; Spark converts via conv(),
    # the DuckDB oracle replays it with a strpos digit expansion in bigint
    # arithmetic (integer cousin of the ops/sketch.py technique)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(salt),
                    F.col("src_id"),
                    F.col("rel"),
                    F.col("dst_id"),
                    F.col("trial"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    cand = trials.withColumn("idx", F.pmod(h, F.lit(n_nodes)))
    neg = (
        cand.join(indexed, "idx")
        .select("src_id", "rel", F.col("cand_dst").alias("neg_dst_id"), "trial")
    )
    true_edges = edges.select(
        "src_id", "rel", F.col("dst_id").alias("neg_dst_id")
    ).distinct()
    return neg.join(true_edges, ["src_id", "rel", "neg_dst_id"], "left_anti").select(
        "src_id", "rel", "neg_dst_id", "trial"
    )
