"""Multi-source attribute fusion: majority / weighted vote per (entity,
attribute) with deterministic tie-breaks.

The conflict-resolution step between extraction and canonicalization:
when several sources assert different values for the same entity
attribute (the reference's loaders simply last-write-win per file order —
``canonicalize_nodes``' A1 semantics), voting picks the value most sources
agree on, the standard data-fusion baseline (Dong & Naumann, "Data fusion
— resolving data conflicts for integration", VLDB 2009 tutorial lineage).
LWW stays the right call for single-feed updates; fusion is for the
web-scale case where the same fact arrives from thousands of independent
pages.

Execution shape (SCALE.md discipline): one HashAggregate keyed by
(entity, attr, value) with map-side partial counts — the only pass over
the assertion table — then a window top-1 and a support aggregate over
the vote table, which is bounded by distinct (entity, attr, value), not
by assertions. Weights are integer units (``weight_col`` bigint, e.g.
source-reliability millis): bigint sums keep the vote, and therefore the
winner, bit-identical under any partitioning — float weights would make
ties partition-order-dependent. Tie-break is (votes DESC, value ASC),
total order, engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuse_attributes(
    assertions: DataFrame,
    entity_col: str = "entity_id",
    attr_col: str = "attr",
    value_col: str = "value",
    weight_col: str | None = None,
) -> DataFrame:
    """(entity, attr, value[, weight]) assertion rows -> one fused row per
    (entity, attr): the majority value plus an audit trail.

    Returns columns: entity/attr as given, ``value`` (the winner),
    ``votes`` (bigint vote mass for the winner), ``total_votes``,
    ``n_values`` (distinct values asserted — disagreement breadth),
    ``support_ppm`` (winner share of the vote in integer ppm).

    With ``weight_col`` (bigint, e.g. per-source reliability in milli
    units) votes are weighted sums; otherwise each assertion counts 1.
    Ties break deterministically on the lexicographically smallest value.
    NULL values are not votes (a source that says nothing abstains) and
    are filtered out.
    """
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    votes = (
        assertions.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(entity_col).alias("_e"),
            F.col(attr_col).alias("_a"),
            F.col(value_col).alias("value"),
        )
        .agg(F.sum(w).alias("votes"))
    )
    per_key = Window.partitionBy("_e", "_a")
    ranked = votes.select(
        "_e",
        "_a",
        "value",
        "votes",
        F.sum("votes").over(per_key).alias("total_votes"),
        F.count(F.lit(1)).over(per_key).alias("n_values"),
        F.row_number()
        .over(per_key.orderBy(F.col("votes").desc(), F.col("value").asc()))
        .alias("_rk"),
    )
    return ranked.filter(F.col("_rk") == 1).select(
        F.col("_e").alias(entity_col),
        F.col("_a").alias(attr_col),
        "value",
        "votes",
        "total_votes",
        "n_values",
        F.expr("(votes * 1000000) div total_votes").alias("support_ppm"),
    )
