"""Motif / path-pattern queries over the edge table (GraphFrames-style
``find``, reduced to the fixed-relation chains a KG actually asks for).

The reference's retrieval is exactly such chains — Cypher patterns like
``(i:Insurance)-[:COVERS_DISEASE]->(d)`` (graph_retriever.py:78-82) and
``(start)-[*1..h]-(related)`` (graph_retrieval.py:42-50). ``paths`` compiles
a relation chain into k-1 equi-joins that Catalyst plans like any other
join tree: each hop filters ``rel`` first (predicate pushdown into the
bucketed edge scan), AQE picks broadcast vs sort-merge per hop from runtime
sizes, and on `save_graph_tables` bucketed layouts the hop joins are
exchange-free (src_id bucketing, see tests/test_skew_and_plans.py).

Variable-length / undirected traversal stays in query/subgraph.py (BFS with
visited-set anti-joins); this module is the fixed-shape complement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def paths(
    edges: DataFrame,
    rels: list[str],
    src: str = "src_id",
    rel: str = "rel",
    dst: str = "dst_id",
    node_distinct: bool = True,
) -> DataFrame:
    """Relation-chain motif: ``rels = [r1, ..., rk]`` matches
    n0 -r1-> n1 -r2-> ... -rk-> nk and returns columns n0..nk (entity ids).

    ``node_distinct`` drops paths revisiting a node (the Cypher trail
    semantics the reference's queries assume) — pairwise inequality filters,
    fine for the short fixed chains this targets (k(k+1)/2 predicates).
    """
    if not rels:
        raise ValueError("rels must name at least one relation")
    out = edges.filter(F.col(rel) == rels[0]).select(
        F.col(src).alias("n0"), F.col(dst).alias("n1")
    )
    for i, r in enumerate(rels[1:], start=1):
        hop = edges.filter(F.col(rel) == r).select(
            F.col(src).alias(f"n{i}"), F.col(dst).alias(f"n{i + 1}")
        )
        out = out.join(hop, f"n{i}")
    if node_distinct:
        n = len(rels) + 1
        for i in range(n):
            for j in range(i + 1, n):
                out = out.filter(F.col(f"n{i}") != F.col(f"n{j}"))
    return out.select(*[f"n{i}" for i in range(len(rels) + 1)])


def paths_with_names(nodes: DataFrame, path_df: DataFrame) -> DataFrame:
    """Resolve every n{i} id column to its node name (broadcast-friendly
    dictionary joins; names keep the n{i} column positions)."""
    out = path_df
    for c in path_df.columns:
        names = nodes.select(
            F.col("entity_id").alias(c), F.col("name").alias(f"{c}_name")
        )
        out = out.join(names, c)
    return out.select(*[F.col(f"{c}_name").alias(c) for c in path_df.columns])
