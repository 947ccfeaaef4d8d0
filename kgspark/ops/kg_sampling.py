"""Negative sampling for KG-embedding training data.

Link-prediction training (TransE/DistMult-family) needs corrupted triples:
for each true (src, rel, dst), sample edges that are NOT in the graph by
replacing the destination. At 10^10-edge scale the sampler must be (a)
distributed, (b) deterministic — reruns and resumes must regenerate the
same training set (the engine-wide contract), and (c) verified negative —
corruptions that happen to be true edges must be filtered, not hoped away.

Design: candidate destination = the node whose dense index equals
md5(src, rel, dst, trial) mod |V| (dense indexes = global rank of
entity_id, computed WITHOUT a global sort: range-partition by entity_id,
number each partition in parallel, add driver-collected per-partition
offsets — no single-task stage anywhere); the corruption join is an
equi-join on that index; true edges are removed with a left-anti join.
Hash-based choice means no RNG state, no partitioning sensitivity, and an
exact SQL replay (the DuckDB oracle hash-matches).

Filtered trials thin the output (~|E|/|V| of candidates hit true edges —
negligible for sparse KGs); callers needing exactly-k semantics run extra
trials and window-truncate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_index(df: DataFrame, key_col: str, n_parts: int | None = None) -> DataFrame:
    """Assign each row its 0-based global rank of ``key_col`` (keys must be
    unique) WITHOUT a global single-task sort.

    Plan: range-partition by key (partition p's keys all precede partition
    p+1's), number each partition independently with a window partitioned by
    ``spark_partition_id()`` — every partition ranks in parallel — then add
    the cumulative size of preceding partitions, a driver-side list of one
    long per partition (bounded by task count, never by row count). The
    result equals ``row_number() OVER (ORDER BY key) - 1`` exactly; the
    oracle replays it as that SQL.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = df.select(key_col).repartitionByRange(n_parts, key_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Pin the partitioning before the driver collects per-partition counts:
    # repartitionByRange samples positionally, so recomputing `ranged` for the
    # returned plan could draw different range boundaries if the upstream is
    # nondeterministic — the collected offsets would then describe a
    # partitioning the second job no longer has (duplicated/skipped ranks).
    # localCheckpoint (the components.py pattern) makes both jobs read the
    # same materialized partitioning.
    ranged = ranged.localCheckpoint(eager=True)
    # one tiny aggregate: rows per range-partition -> cumulative offsets
    counts = {
        int(r["_pid"]): int(r["n"])
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(counts)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(counts)]),
        ),
        F.col("_pid"),
    ) if counts else F.lit(0)
    local = F.row_number().over(Window.partitionBy("_pid").orderBy(key_col))
    return ranged.select(
        F.col(key_col),
        (off_expr + local - 1).cast("long").alias("idx"),
    )


def negative_samples(
    edges: DataFrame,
    nodes: DataFrame,
    n_per_positive: int = 2,
    salt: str = "neg-v1",
    keep_positive: bool = False,
) -> DataFrame:
    """(src_id, rel, dst_id) x nodes -> corrupted (src_id, rel, neg_dst_id)
    rows, up to ``n_per_positive`` per true edge (trials that collide with
    a true edge are dropped). ``salt`` versions the sample set — a new salt
    is a fresh deterministic draw. ``keep_positive`` adds the positive
    ``dst_id`` column so margin-loss trainers (ops/transe.py) get
    (positive, corrupted) PAIRS instead of bare corruptions."""
    indexed = dense_index(nodes.select(F.col("entity_id").alias("cand_dst")), "cand_dst")
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
        .select("src_id", "rel", "dst_id", F.col("cand_dst").alias("neg_dst_id"), "trial")
    )
    true_edges = edges.select(
        "src_id", "rel", F.col("dst_id").alias("neg_dst_id")
    ).distinct()
    filtered = neg.join(true_edges, ["src_id", "rel", "neg_dst_id"], "left_anti")
    cols = ["src_id", "rel", "neg_dst_id", "trial"]
    if keep_positive:
        cols = ["src_id", "rel", "dst_id", "neg_dst_id", "trial"]
    return filtered.select(*cols)
