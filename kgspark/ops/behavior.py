"""Behavioral sequence analytics over event streams.

First-order user-journey statistics: the empirical Markov transition
matrix over per-user event sequences — the batch companion to
``streaming.sessionize`` (funnel analysis, anomalous-path detection,
and the transition graph that pagerank/HITS then rank). At 100 TB of
events this is the canonical "one window + one aggregate" shape: the
only full shuffle is the per-user repartition the window needs, then
transition counts combine map-side and the per-source totals are a
second tiny aggregate over the (types x types)-bounded count table.

Probabilities are exact integer ppm (``(10**6 * n) div total``), so
rows are partitioning-invariant and the DuckDB oracle replays them
digit for digit. Event order within a user must be TOTAL for
determinism: ties on the timestamp are broken by ``tiebreak_col``
(the event id) — the w1/cap_per_group never-rand discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    *,
    min_count: int = 1,
) -> DataFrame:
    """Per-user event sequences -> first-order transition matrix
    ``(src_event, dst_event, n_transitions, n_from_src, p_ppm)``:
    counts of consecutive (src -> dst) pairs, the total out of each
    src, and the empirical probability in exact integer ppm.

    Rows with a NULL user, timestamp, or type are dropped (no sequence
    position); each user's first event has no predecessor and anchors
    no transition. ``min_count`` floors reported transitions (rare
    pairs are noise in funnel analysis — same floor as entity PMI).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    e = events.filter(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(type_col).alias("_ty"),
    )
    w = Window.partitionBy("_u").orderBy("_ts", "_tb")
    pairs = (
        e.withColumn("_prev", F.lag("_ty").over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("src_event"), F.col("_ty").alias("dst_event")
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = pairs.groupBy("src_event").agg(
        F.sum("n_transitions").alias("n_from_src")
    )
    return (
        pairs.join(totals, "src_event")
        .filter(F.col("n_transitions") >= min_count)
        .selectExpr(
            "src_event",
            "dst_event",
            "n_transitions",
            "n_from_src",
            "((1000000 * n_transitions) div n_from_src)::bigint AS p_ppm",
        )
    )
