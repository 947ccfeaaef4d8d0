"""Graph statistics: the operational dashboard queries every KG deployment
runs (the reference hardcodes its sidebar counts — frontend/app.py:24-46 —
instead of computing them; A4 generalized).

All plan-cheap aggregates: label/relation histograms and degree moments are
two-phase hash aggregates over the nodes/edges tables; nothing here scans
payload columns (column pruning keeps the scans to ids + group keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_histogram(
    edges: DataFrame, direction: str = "out", key: str | None = None
) -> DataFrame:
    """(degree, n_nodes): how many nodes have each out/in-degree.
    The shape diagnostic for skew decisions (SCALE.md §3): a heavy tail
    here is what makes salting/AQE-skew-split worth enabling for
    downstream expands."""
    col = key or ("src_id" if direction == "out" else "dst_id")
    deg = edges.groupBy(col).agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


def graph_summary(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """One-row summary: node/edge/label/relation counts, degree extremes,
    dangling-node count (nodes with no out-edge; fine for a dashboard —
    use validate_graph for the integrity contract)."""
    out_deg = edges.groupBy("src_id").agg(F.count("*").alias("d"))
    deg_stats = out_deg.agg(
        F.max("d").alias("max_out_degree"),
        F.round(F.avg("d"), 4).alias("avg_out_degree"),
    )
    n_dangling = nodes.join(
        out_deg.withColumnRenamed("src_id", "entity_id"), "entity_id", "left_anti"
    ).count()
    base = nodes.agg(
        F.count("*").alias("n_nodes"),
        F.countDistinct("label").alias("n_labels"),
    ).crossJoin(
        edges.agg(
            F.count("*").alias("n_edges"),
            F.countDistinct("rel").alias("n_rels"),
        )
    )
    return base.crossJoin(deg_stats).withColumn("n_dangling", F.lit(n_dangling))


def register_graph_views(
    spark, nodes: DataFrame, edges: DataFrame, prefix: str = "kg"
) -> tuple[str, str]:
    """Expose the graph to plain ``spark.sql``: temp views ``{prefix}_nodes``
    / ``{prefix}_edges``. The SQL surface costs nothing — views are lazy
    plans — and lets migrated users keep their BI/SQL tooling."""
    nv, ev = f"{prefix}_nodes", f"{prefix}_edges"
    nodes.createOrReplaceTempView(nv)
    edges.createOrReplaceTempView(ev)
    return nv, ev
