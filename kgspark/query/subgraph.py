"""J4: variable-length path retrieval (1..h hops) as iterated frontier joins.

Reference: ``graph_retrieval.py:42-50`` — undirected ``[*1..h]`` expansion
from seed entities, default 2 hops, bounded result set. Cypher's path
enumeration is exponential; what the RAG layer actually consumes is the set
of distinct nodes/edges reached (it dedups immediately, :58-75), so the
Spark plan is BFS with a visited-set anti-join — linear in edges touched,
not paths.

Scale: each hop is one shuffle join frontier x edges; visited stays small
relative to the corpus (bounded expansion), frontier is broadcast when tiny.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Subgraph:
    nodes: DataFrame  # (entity_id, label, name, hop)
    triples: DataFrame  # (subj, subj_type, pred, obj, obj_type)


def retrieve_subgraph(
    nodes: DataFrame,
    edges: DataFrame,
    entities: list[str],
    hops: int = 2,
    limit: int = 50,
    ranks: DataFrame | None = None,
) -> Subgraph:
    """Undirected h-hop neighborhood of the named seed entities.

    Returns reached nodes (with hop distance) and the distinct triples among
    reached nodes, capped at ``limit`` triples (deterministic order).

    ``ranks``: optional (name, rank) importance table (ops/graph_algs
    pagerank over node names). When given, the triple cap keeps the
    HIGHEST-RANKED triples (max of endpoint ranks, name tiebreak) instead
    of alphabetical-first — the reference caps at 50 *arbitrary* paths
    (graph_retrieval.py:48); rank makes the cap keep what matters.
    """
    und = edges.select(F.col("src_id").alias("a"), F.col("dst_id").alias("b")).union(
        edges.select(F.col("dst_id").alias("a"), F.col("src_id").alias("b"))
    )
    seeds = (
        nodes.filter(F.col("name").isin(entities))
        .select("entity_id")
        .withColumn("hop", F.lit(0))
    )
    visited = seeds.localCheckpoint()
    frontier = visited
    # broadcast the frontier only while it is dictionary-sized: a dense graph
    # can blow a frontier past broadcast limits within 2 hops, at which point
    # the hint must fall away and let AQE pick shuffle vs broadcast
    broadcast_limit = 1_000_000
    frontier_n = 1
    for h in range(1, hops + 1):
        fr = frontier.select(F.col("entity_id").alias("a"))
        if frontier_n <= broadcast_limit:
            fr = F.broadcast(fr)
        nxt = (
            und.join(fr, "a")
            .select(F.col("b").alias("entity_id"))
            .distinct()
            .join(visited.select("entity_id"), "entity_id", "left_anti")
            .withColumn("hop", F.lit(h))
        )
        frontier = nxt.localCheckpoint()
        visited = visited.union(frontier).localCheckpoint()
        frontier_n = frontier.count()
        if frontier_n == 0:
            break

    reached = visited.join(nodes, "entity_id").select("entity_id", "label", "name", "hop")
    n = reached.select("entity_id", "label", "name")
    sub_triples = (
        edges.join(n.alias("s"), F.col("src_id") == F.col("s.entity_id"))
        .join(n.alias("o"), F.col("dst_id") == F.col("o.entity_id"))
        .select(
            F.col("s.name").alias("subj"),
            F.col("s.label").alias("subj_type"),
            F.col("rel").alias("pred"),
            F.col("o.name").alias("obj"),
            F.col("o.label").alias("obj_type"),
        )
    )
    if ranks is not None:
        rs = F.broadcast(ranks.select(F.col("name").alias("subj"), F.col("rank").alias("r_s")))
        ro = F.broadcast(ranks.select(F.col("name").alias("obj"), F.col("rank").alias("r_o")))
        sub_triples = (
            sub_triples.join(rs, "subj", "left")
            .join(ro, "obj", "left")
            .withColumn(
                "score",
                F.greatest(F.coalesce("r_s", F.lit(0.0)), F.coalesce("r_o", F.lit(0.0))),
            )
            .orderBy(F.desc("score"), "subj", "pred", "obj")
            .limit(limit)
            .select("subj", "subj_type", "pred", "obj", "obj_type")
        )
    else:
        sub_triples = sub_triples.orderBy("subj", "pred", "obj").limit(limit)
    return Subgraph(nodes=reached, triples=sub_triples)


def subgraph_to_text(sub: Subgraph, max_triples: int = 30) -> str:
    """Serialize for prompt context (graph_retrieval.py:90-106)."""
    rows = sub.triples.limit(max_triples).collect()
    if not rows:
        names = sub.nodes.orderBy("name").limit(20).collect()
        if not names:
            return "（未检索到相关图谱信息。）"
        return "\n".join(f"实体: {r['name']} (类型: {r['label']})" for r in names)
    lines = ["三元组："]
    lines += [f"  ({r['subj']}) -[{r['pred']}]-> ({r['obj']})" for r in rows]
    return "\n".join(lines)
