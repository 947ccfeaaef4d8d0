"""Graph analytics over the constructed KG: join-based PageRank.

Entity importance ranks canonical-name candidates (X7 picks the shortest
surface form today; rank is the principled upgrade), orders subgraph
retrieval (graph_retrieval.py's LIMIT-bounded paths — reference caps at 50
arbitrary paths, rank makes the cap keep the *important* ones), and feeds
curation (keep documents mentioning high-rank entities).

No GraphFrames dependency — same design stance as extract/components.py:
each iteration is two shuffles (contribution join on src, sum by dst), the
edge list and degree table are computed once and localCheckpoint'd, rank
lineage is cut per iteration.

Two arithmetic modes:

- float (default, production): IEEE doubles, convergence-checked on the L1
  delta. Fast, but distributed float sums are partition-order dependent in
  the final ulps — fine for ranking, not for bit-reproducibility.
- integer (``scale`` set): rank is a bigint in fixed-point units of
  1/scale, every operation is integer add / multiply / floor-div — the
  result is BIT-IDENTICAL under any partitioning, cluster size, or engine
  (the DuckDB oracle `pagerank_tpch` replays it exactly with unrolled SQL).
  Truncation loses < n_edges + n ulp-units of mass per iteration, i.e.
  relative error ~ n/scale — negligible at scale=10^12. This is the same
  determinism-under-parallelism contract the rest of the engine makes
  (SURVEY §7 risk register), extended to an iterative algorithm.

Dangling nodes (no out-edges) redistribute their mass uniformly, the
standard correction keeping total mass ~ 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 10,
    tol: float | None = 1e-6,
    scale: int | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """(src, dst) edge list -> (name, rank). With ``scale`` set, returns
    (name, rank_units) as bigint fixed-point (deterministic integer mode,
    ``damping`` must then be a percentage-expressible value like 0.85) and
    runs exactly ``max_iter`` iterations (no convergence action, so the
    plan is identical everywhere).

    ``seeds`` switches to PERSONALIZED PageRank: the teleport vector (and
    dangling-mass redistribution) concentrates uniformly on the seed set
    instead of all nodes — rank becomes proximity to the seeds, the
    GraphRAG retrieval ranker (order a question's expanded subgraph by
    relevance to its detected entities, not by global importance). Both
    cases run ONE code path: classic PageRank is PPR with seeds = every
    node, so the uniform default costs nothing and the integer mode's
    bit-exactness contract carries over to PPR unchanged."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("name"))
        .union(e.select(F.col("dst").alias("name")))
        .distinct()
    )
    if seeds is not None:
        sd = (
            seeds.select(F.col(seeds.columns[0]).alias("name"))
            .distinct()
            .join(nodes, "name", "left_semi")
            .withColumn("_seed", F.lit(True))
        )
        nodes = (
            nodes.join(sd, "name", "left")
            .withColumn("_seed", F.coalesce("_seed", F.lit(False)))
            .localCheckpoint()
        )
        ns = nodes.filter("_seed").count()
        if ns == 0:
            raise ValueError("no seed appears in the graph")
    else:
        nodes = nodes.withColumn("_seed", F.lit(True)).localCheckpoint()
        ns = nodes.count()
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint()

    if scale is not None:
        return _pagerank_int(e, nodes, outdeg, ns, damping, max_iter, scale)

    ranks = nodes.select(
        "name", F.when(F.col("_seed"), F.lit(1.0 / ns)).otherwise(F.lit(0.0)).alias("rank")
    )
    for _ in range(max_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("name", "src"), "src")
            .join(outdeg, "src")
            .select(F.col("dst").alias("name"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("name")
            .agg(F.sum("c").alias("s"))
        )
        # dangling mass as a broadcast 1-row aggregate folded into the plan:
        # no driver action per iteration — the localCheckpoint below is the
        # iteration's ONLY job
        dangling = (
            ranks.join(outdeg.withColumnRenamed("src", "name"), "name", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        )
        new_ranks = (
            nodes.join(contribs, "name", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "name",
                (
                    F.when(F.col("_seed"), F.lit((1.0 - damping) / ns)).otherwise(F.lit(0.0))
                    + F.lit(damping)
                    * (
                        F.coalesce("s", F.lit(0.0))
                        + F.when(F.col("_seed"), F.col("_dangling") / F.lit(float(ns))).otherwise(F.lit(0.0))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        if tol is not None:
            delta = (
                new_ranks.withColumnRenamed("rank", "new")
                .join(ranks, "name")
                .agg(F.sum(F.abs(F.col("new") - F.col("rank"))))
                .first()[0]
            )
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks


def _pagerank_int(e, nodes, outdeg, ns, damping, max_iter, scale):
    # ns = size of the teleport set: all nodes (classic) or the seed set
    # (personalized); the teleport base and the dangling redistribution
    # land only on `_seed` rows — identical arithmetic in both cases
    d_pct = int(round(damping * 100))
    base = (
        f"(CASE WHEN _seed THEN ({100 - d_pct}::bigint * {scale}) div (100 * {ns})"
        " ELSE 0 END)"
    )
    ranks = nodes.selectExpr(
        "name", "_seed", f"(CASE WHEN _seed THEN {scale} div {ns} ELSE 0 END)::bigint AS r"
    )
    for _ in range(max_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("name", "src"), "src")
            .join(outdeg, "src")
            .selectExpr("dst AS name", "(r div deg) AS c")
            .groupBy("name")
            .agg(F.sum("c").alias("s"))
        )
        # same fold as the float path: 1-row broadcast aggregate, exact
        # bigint sum, no per-iteration driver action
        dangling = (
            ranks.join(outdeg.withColumnRenamed("src", "name"), "name", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("bigint").alias("_dangling"))
        )
        ranks = (
            nodes.join(contribs, "name", "left")
            .crossJoin(F.broadcast(dangling))
            .selectExpr(
                "name",
                "_seed",
                f"({base} + ({d_pct} * (coalesce(s, 0)"
                f" + (CASE WHEN _seed THEN _dangling div {ns} ELSE 0 END))) div 100"
                ")::bigint AS r",
            )
            .localCheckpoint()
        )
    return ranks.select("name", F.col("r").alias("rank_units"))


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    until_stable: bool = True,
) -> DataFrame:
    """Nodes of the k-core (the maximal subgraph where every node has
    degree >= ``k`` within the subgraph) with their in-core degree:
    ``(node, degree)``.

    Iterative peeling: drop nodes whose current degree is below ``k``,
    restrict the edge set to survivors, repeat. Each round is one degree
    aggregation plus two semi-joins, all on node-id shuffle keys;
    ``localCheckpoint`` cuts lineage per round (the components.py /
    pagerank discipline). With ``until_stable`` (default) the loop exits
    early when a round removes nothing — one driver-side count per round,
    the same trade as float-PageRank's ``tol``. With
    ``until_stable=False`` it runs exactly ``max_iter`` rounds with no
    per-round driver action and a partitioning-independent result either
    way (set semantics end to end) — the mode the unrolled-SQL oracle
    replays.

    100 TB lens: peeling converges in few rounds on power-law graphs
    (most sub-k nodes fall in the first 2-3 rounds); per-round cost
    shrinks with the surviving edge set. Degree-0 isolates never appear
    (edge-list input), matching the k>=1 contract.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    prev_n = None
    stable = False
    for _ in range(max_iter):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.filter(F.col("degree") >= k)
        e = (
            e.join(keep.select(F.col("node").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
            .localCheckpoint()
        )
        if until_stable:
            n = e.count()
            if n == prev_n:
                stable = True
                break
            prev_n = n
    if until_stable and not stable:
        # peeling still in flight at the iteration cap: the survivor set is
        # an intermediate peel, NOT the k-core (e.g. a long chain peels one
        # node per round at k=2) — returning it silently would be wrong
        raise RuntimeError(
            f"kcore(k={k}) did not reach fixpoint within max_iter={max_iter} "
            "peeling rounds; raise max_iter (each round is one degree "
            "aggregate + two semi-joins) or use until_stable=False for a "
            "fixed-round intermediate peel"
        )
    return (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 5,
) -> DataFrame:
    """Synchronous label-propagation communities: ``(node, label)`` after
    exactly ``max_iter`` rounds, labels initialised to the node's own id.

    Each round every node adopts the most frequent label among its
    neighbors (undirected), ties broken by the SMALLEST label — a total
    order, so the result is deterministic under any partitioning (plain
    LPA's random tie-break makes runs non-reproducible; this variant is
    the one an unrolled-SQL oracle can replay bit-for-bit). Isolated
    endpoints keep their current label.

    Plan per round: one shuffle to join labels onto edge endpoints, one
    partial-aggregating count by (node, label), one ``min_by`` over a
    (-count, label) struct — no window, no sort, no driver action;
    ``localCheckpoint`` per round cuts lineage. Runs a FIXED round count:
    synchronous LPA can oscillate on bipartite structures, so "until
    stable" is not well-defined; fixed rounds keep the contract exact.

    100 TB lens: the count aggregate is map-side combinable on
    (node, label); hub nodes aggregate rather than explode. Labels
    monotonically coarsen toward community minima.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().localCheckpoint()
    nodes = und.select(F.col("u").alias("node")).distinct().localCheckpoint()
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(max_iter):
        nbr = (
            und.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "label")
        )
        counts = nbr.groupBy("node", "label").agg(F.count(F.lit(1)).alias("c"))
        best = counts.groupBy("node").agg(
            F.min_by("label", F.struct((-F.col("c")).alias("nc"), F.col("label"))).alias("new_label")
        )
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("new_label", "label").alias("label"))
            .localCheckpoint()
        )
    return labels


def random_walks(
    edges: DataFrame,
    walk_length: int,
    num_walks: int = 1,
    salt: str = "walk-v1",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """DeepWalk-style deterministic random-walk corpus over a directed
    edge list: ``(walk_id, step, node)`` rows, ``num_walks`` walks of up
    to ``walk_length`` steps started from every node with out-edges.

    The "random" choice is a salted md5 draw — at step ``t`` the walk
    picks out-neighbor rank ``1 + md5_15(walk_id|t|salt) % outdeg`` where
    neighbors are ranked by ``row_number`` over dst order. That makes the
    corpus rerun/partitioning-stable, redrawable via ``salt``, and
    engine-portable (the DuckDB oracle replays every hop bit-for-bit) —
    never ``rand()``, the same contract as ``cap_per_group`` /
    ``split_assign``. Walks stop early at sink nodes (no out-edges).

    Plan: the ranked-neighbor table ``(cur, rank, nxt)`` and the degree
    table are built once (one window per src group — no global sort) and
    checkpointed; each step is two equi-joins — frontier × degrees to
    turn the draw into a neighbor rank, then frontier × neighbors on
    ``(cur, rank)``. Rank is part of the second join's key, so a hub
    node never pairs its resident walks against its whole adjacency
    list. Frontier lineage is cut per step.

    100 TB lens: walk state is O(nodes × num_walks) rows with node-id
    shuffle keys; steps are embarrassingly joinable and the output
    streams to the sink per step if materialised incrementally. This is
    the node2vec/DeepWalk corpus generator for KG-embedding training
    (walks are the "sentences" fed to a skip-gram trainer).
    """
    e = edges.select(F.col(src).alias("cur"), F.col(dst).alias("nxt")).distinct()
    w = Window.partitionBy("cur").orderBy("nxt")
    nbr = e.withColumn("rank", F.row_number().over(w)).localCheckpoint()
    degs = nbr.groupBy("cur").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    reps = F.explode(F.sequence(F.lit(0), F.lit(num_walks - 1))).alias("rep")
    frontier = (
        degs.select("cur", reps)
        .select(
            F.concat_ws("#", F.col("cur").cast("string"), F.col("rep").cast("string")).alias("walk_id"),
            "cur",
        )
        .localCheckpoint()
    )
    out = frontier.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("node"))
    walks = [out]
    for t in range(1, walk_length + 1):
        draw = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("walk_id"), F.lit(str(t)), F.lit(salt))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        # hop in two equi-joins: (1) frontier x degree table to turn the
        # draw into a concrete neighbor rank, (2) frontier x ranked-neighbor
        # table on (cur, rank) — rank IS a join key, so a hub node never
        # pairs its walks against its whole adjacency list
        frontier = (
            frontier.join(degs, "cur")
            .select("walk_id", "cur", (F.pmod(draw, F.col("deg")) + 1).alias("rank"))
            .join(nbr, ["cur", "rank"])
            .select("walk_id", F.col("nxt").alias("cur"))
            .localCheckpoint()
        )
        walks.append(frontier.select("walk_id", F.lit(t).alias("step"), F.col("cur").alias("node")))
    res = walks[0]
    for wdf in walks[1:]:
        res = res.unionAll(wdf)
    return res


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected graph: ``(node,
    triangles)`` for every node incident to at least one edge (0 for
    triangle-free nodes).

    Degree-ordered node-iterator (the MapReduce-classic Suri–Vassilvitskii
    / Cohen scheme, re-expressed as three DataFrame joins):

    1. canonicalize to distinct ``a < b`` edges (self-loops dropped);
    2. orient every edge from its lower-(degree, id) endpoint to the
       higher one — a total order, so each triangle has exactly ONE pivot
       node with both out-edges;
    3. wedges = self-join of oriented edges on the pivot with the two
       spokes ordered by the same (degree, id) key;
    4. close each wedge with an inner join against the oriented edge set.

    Why this survives 100 TB: the orientation bounds per-pivot out-degree
    by O(sqrt(m)) (a celebrity node with degree d contributes wedges only
    through neighbors of HIGHER degree, of which there are at most ~sqrt
    of the edge count), so the wedge join cannot explode on skewed
    degrees the way a naive neighbor self-join does. Every shuffle key is
    a node id / id pair; no Python, no driver state. Deterministic: set
    semantics end to end.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    withdeg = (
        e.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    )
    a_first = (F.struct("da", "a") < F.struct("db", "b"))
    oriented = withdeg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    o1 = oriented.select(F.col("u"), F.col("v").alias("x"), F.col("dv").alias("dx"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = o1.join(o2, "u").filter(F.struct("dx", "x") < F.struct("dy", "y"))
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).select("u", "x", "y")
    per_node = (
        tri.select(F.explode(F.array("u", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.select(F.col("n").alias("node"))
        .join(per_node, "node", "left")
        .select("node", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"))
    )


def landmark_distances(
    edges: DataFrame,
    landmarks: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
    until_stable: bool = False,
) -> DataFrame:
    """Multi-source BFS: exact shortest hop-distance from every landmark
    to every node within ``max_hops``: ``(landmark, node, dist)``.
    Unreached (landmark, node) combinations are absent (distance infinity).

    Landmark distances are the scalable stand-in for all-pairs shortest
    paths (ALT / landmark labeling): pick ~dozens of high-PageRank
    landmarks, precompute these rows, and answer distance / "within k
    hops of X" KG queries with a join instead of a per-query BFS — the
    batch precompute behind query/subgraph.py's per-seed expansion.

    Each round relaxes the frontier through one edge join, unions into
    the known-distance table, and keeps ``min(dist)`` per (landmark,
    node) — a map-side-combinable aggregate on the shuffle key the next
    join reuses; lineage cut per round. Default runs exactly ``max_hops``
    rounds with zero driver actions and a partitioning-invariant result
    (min over set semantics) — the mode the unrolled-SQL oracle replays.
    ``until_stable`` adds a per-round count action to stop as soon as a
    round discovers nothing (useful when diameter << max_hops).

    100 TB lens: state is |landmarks| x reached-nodes rows keyed by node
    id — bounded by design (landmarks are dozens, not millions); the edge
    table is the big side and is joined on its shuffle key every round.
    Frontier-only relaxation (joining just the newly-discovered rows)
    keeps each round's join input minimal.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not directed:
        e = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    lm_col = landmarks.columns[0]
    dist = (
        landmarks.select(F.col(lm_col).alias("landmark"))
        .distinct()
        .select("landmark", F.col("landmark").alias("node"), F.lit(0).alias("dist"))
        .localCheckpoint()
    )
    frontier = dist
    for _ in range(max_hops):
        relaxed = (
            frontier.join(e, frontier.node == e.u)
            .select("landmark", F.col("v").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        # new frontier = nodes this landmark had never reached before
        frontier = (
            relaxed.groupBy("landmark", "node")
            .agg(F.min("dist").alias("dist"))
            .join(dist.select("landmark", "node"), ["landmark", "node"], "left_anti")
            .localCheckpoint()
        )
        dist = dist.unionAll(frontier).localCheckpoint()
        if until_stable and frontier.isEmpty():
            break
    return dist.select("landmark", "node", F.col("dist").cast("long").alias("dist"))


def node2vec_walks(
    edges: DataFrame,
    walk_length: int,
    num_walks: int = 1,
    p_milli: int = 1000,
    q_milli: int = 1000,
    salt: str = "n2v-v1",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """node2vec-style biased random walks: ``(walk_id, step, node)`` rows,
    ``num_walks`` walks of up to ``walk_length`` steps from every node
    with out-edges. p/q are the return/in-out parameters in fixed-point
    millis (1000/1000 = unbiased; p>1000 discourages backtracking,
    q<1000 pushes outward/DFS-like, q>1000 keeps walks local/BFS-like).

    Second-order bias per Grover & Leskovec: from ``cur`` with
    predecessor ``prev``, candidate ``x`` weighs 1/p if x == prev, 1 if
    x is also a neighbor of prev (triangle step), 1/q otherwise —
    integer milli-weights, so the cumulative-weight draw
    ``pmod(md5(walk_id|t|salt), total)`` lands in exactly one
    candidate's [cum-w, cum) interval and the whole corpus is
    rerun/partitioning-stable and engine-replayable (the random_walks /
    cap_per_group determinism contract; never rand()). The first hop is
    the uniform rank draw (no predecessor yet), identical to
    ``random_walks`` step 1.

    Plan per hop: frontier x neighbors equi-join on cur (fan-out deg —
    inherent to node2vec, every candidate's relation to prev must be
    examined), a left join against the neighbor table on (prev, x) for
    the triangle test, ONE window over (walk_id) rows for cumulative +
    total weight, then the interval filter. Window groups are deg-sized
    per resident walk — bounded by max out-degree, not corpus size; at
    web scale cap hub degrees upstream (per-host caps / sampling) as for
    any node2vec implementation. Lineage cut per hop.
    """
    # milli-params outside [1, 1_000_000] either divide by zero or floor
    # the integer weight to 0 (a degree-1 backtrack candidate with weight 0
    # would kill the walk silently via pmod(draw, 0) = NULL)
    for pname, v in (("p_milli", p_milli), ("q_milli", q_milli)):
        if not 1 <= v <= 1_000_000:
            raise ValueError(
                f"{pname} must be in [1, 1_000_000] (fixed-point millis; "
                f"1_000_000 = weight floor 1), got {v}"
            )
    e = edges.select(F.col(src).alias("cur"), F.col(dst).alias("nxt")).filter(
        F.col(src) != F.col(dst)
    ).distinct()
    wrank = Window.partitionBy("cur").orderBy("nxt")
    nbr = e.withColumn("rank", F.row_number().over(wrank)).localCheckpoint()
    degs = nbr.groupBy("cur").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    w_ret = (1000 * 1000) // p_milli
    w_com = 1000
    w_out = (1000 * 1000) // q_milli

    def draw(t: int):
        return F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("walk_id"), F.lit(str(t)), F.lit(salt))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")

    reps = F.explode(F.sequence(F.lit(0), F.lit(num_walks - 1))).alias("rep")
    start = (
        degs.select("cur", reps)
        .select(
            F.concat_ws(
                "#", F.col("cur").cast("string"), F.col("rep").cast("string")
            ).alias("walk_id"),
            "cur",
        )
        .localCheckpoint()
    )
    walks = [start.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("node"))]
    # hop 1: uniform rank draw (no predecessor)
    frontier = (
        start.join(degs, "cur")
        .select("walk_id", "cur", (F.pmod(draw(1), F.col("deg")) + 1).alias("rank"))
        .join(nbr, ["cur", "rank"])
        .select("walk_id", F.col("cur").alias("prev"), F.col("nxt").alias("cur"))
        .localCheckpoint()
    )
    walks.append(frontier.select("walk_id", F.lit(1).alias("step"), F.col("cur").alias("node")))
    for t in range(2, walk_length + 1):
        cands = frontier.join(nbr.select("cur", F.col("nxt").alias("x")), "cur")
        tri = nbr.select(
            F.col("cur").alias("prev"), F.col("nxt").alias("x"), F.lit(True).alias("_tri")
        )
        cands = cands.join(tri, ["prev", "x"], "left").select(
            "walk_id",
            "prev",
            "cur",
            "x",
            F.when(F.col("x") == F.col("prev"), F.lit(w_ret))
            .when(F.coalesce("_tri", F.lit(False)), F.lit(w_com))
            .otherwise(F.lit(w_out))
            .alias("wt"),
        )
        wcum = (
            Window.partitionBy("walk_id")
            .orderBy("x")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wtot = Window.partitionBy("walk_id")
        scored = cands.select(
            "walk_id",
            "cur",
            "x",
            "wt",
            F.sum("wt").over(wcum).alias("cumw"),
            F.sum("wt").over(wtot).alias("tot"),
        )
        frontier = (
            scored.withColumn("dv", F.pmod(draw(t), F.col("tot")))
            .filter((F.col("dv") < F.col("cumw")) & (F.col("dv") >= F.col("cumw") - F.col("wt")))
            .select("walk_id", F.col("cur").alias("prev"), F.col("x").alias("cur"))
            .localCheckpoint()
        )
        walks.append(
            frontier.select("walk_id", F.lit(t).alias("step"), F.col("cur").alias("node"))
        )
    res = walks[0]
    for wdf in walks[1:]:
        res = res.unionAll(wdf)
    return res


def harmonic_centrality(
    edges: DataFrame,
    landmarks: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
    scale: int = 1_000_000,
) -> DataFrame:
    """Landmark-sampled harmonic centrality: for every node reached by at
    least one landmark within ``max_hops``, ``centrality_units`` =
    sum over landmarks of floor(scale / d(landmark, node)) (d > 0; the
    node's own landmark term is skipped, matching the standard
    definition's d(v,v) exclusion). With landmarks = all nodes this IS
    exact truncated harmonic centrality; with a sampled landmark set it
    is the standard unbiased-up-to-normalization estimator — multiply by
    n/|landmarks| driver-side if the absolute value matters (ranking,
    the usual use, needs no rescale).

    Exact-integer per-term floor + bigint sum -> partitioning-invariant
    and engine-replayable (rides entirely on landmark_distances, adding
    one map-side-combinable aggregate on the node key).
    """
    d = landmark_distances(
        edges, landmarks, max_hops, src=src, dst=dst, directed=directed
    )
    return (
        d.filter(F.col("dist") > 0)
        .select("node", F.expr(f"{scale} div dist").alias("h"))
        .groupBy("node")
        .agg(F.sum("h").cast("long").alias("centrality_units"))
    )


def link_prediction_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_center_degree: int | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Neighborhood-heuristic link-prediction scores — the classic
    non-learned baselines TransE is judged against (and the cheap
    first-pass candidate generator FOR it): for every non-adjacent pair
    ``(x, y)``, x < y, sharing >=1 common neighbor,

    - ``cn``          common-neighbor count (exact bigint),
    - ``ra_units``    resource allocation, sum over common neighbors z of
                      floor(scale / deg(z)) (Zhou-Lu-Zhang 2009 — the
                      RA index, the consistently strongest of the local
                      heuristics; exact-integer form),
    - ``jacc_units``  floor(scale * cn / (deg(x) + deg(y) - cn)).

    All three are exact integers -> partitioning-invariant, engine-
    replayable (the driver oracle replays them in SQL bit for bit).
    Adamic-Adar is deliberately absent: 1/ln(deg) drags IEEE logs into
    the contract; RA is its better-performing integer-friendly cousin.

    Shape: canonicalize -> degree agg -> wedge self-join on the center
    node -> (x, y) aggregate -> anti-join out existing edges -> degree
    join for Jaccard. Every shuffle key is a node id or id pair.

    100 TB honesty: the OUTPUT is inherently Omega(sum deg(z)^2) — no
    orientation trick bounds it, because every common-neighbor pair IS a
    result row. At web scale pass ``max_center_degree`` to skip
    super-hub centers (standard LP practice — a 10^6-degree hub
    contributes ~0 RA signal per pair but 10^12 wedge rows); skipped
    centers still count toward deg() (the scores stay exact, the
    candidate set is what's pruned). Audit the cut with
    ``lp_center_audit`` before trusting recall.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    adj = e.select(F.col("a").alias("z"), F.col("b").alias("n")).unionAll(
        e.select(F.col("b").alias("z"), F.col("a").alias("n"))
    )
    centers = adj.join(deg.select(F.col("n").alias("z"), F.col("d").alias("dz")), "z")
    if max_center_degree is not None:
        centers = centers.filter(F.col("dz") <= max_center_degree)
    s1 = centers.select("z", "dz", F.col("n").alias("x"))
    s2 = centers.select("z", F.col("n").alias("y"))
    wedges = s1.join(s2, "z").filter(F.col("x") < F.col("y"))
    pair_scores = (
        wedges.select("x", "y", F.expr(f"{scale} div dz").alias("ra_term"))
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum("ra_term").cast("long").alias("ra_units"),
        )
    )
    open_pairs = pair_scores.join(
        e, (pair_scores["x"] == e["a"]) & (pair_scores["y"] == e["b"]), "left_anti"
    )
    return (
        open_pairs.join(deg.select(F.col("n").alias("x"), F.col("d").alias("dx")), "x")
        .join(deg.select(F.col("n").alias("y"), F.col("d").alias("dy")), "y")
        .select(
            "x",
            "y",
            "cn",
            "ra_units",
            F.expr(f"({scale} * cn) div (dx + dy - cn)").alias("jacc_units"),
        )
    )


def lp_center_audit(
    edges: DataFrame,
    max_center_degree: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One-row audit of what a ``max_center_degree`` cut prunes from
    :func:`link_prediction_scores`: centers skipped, centers kept, and
    the wedge rows the cut avoided (sum over skipped centers of
    d*(d-1)/2 — the cost that would have been paid)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    skipped = F.col("d") > max_center_degree
    return deg.agg(
        F.sum(F.when(skipped, 1).otherwise(0)).cast("long").alias("centers_skipped"),
        F.sum(F.when(~skipped, 1).otherwise(0)).cast("long").alias("centers_kept"),
        F.sum(F.when(skipped, F.expr("d * (d - 1) div 2")).otherwise(F.lit(0)))
        .cast("long")
        .alias("wedge_rows_avoided"),
    )


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    scale: int = 1_000_000,
) -> DataFrame:
    """Local clustering coefficient per node, exact-integer:
    ``cc_units = floor(scale * 2 * triangles / (deg * (deg - 1)))`` for
    every node with degree >= 2, 0 for degree-1 nodes. Rides on
    :func:`triangle_count` (degree-ordered node-iterator — per-pivot
    fan-out O(sqrt(m)), skew-safe) plus the degree aggregate; the join
    back is a shuffle hash-join on the node id. Floor-div keeps the
    contract bigint-exact, partitioning-invariant, and SQL-replayable.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_count(e, "a", "b")
    return tri.join(deg, "node").select(
        "node",
        "triangles",
        "deg",
        F.when(
            F.col("deg") >= 2,
            F.expr(f"({scale} * 2 * triangles) div (deg * (deg - 1))"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("cc_units"),
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 5,
    scale: int = 10**6,
) -> DataFrame:
    """Kleinberg's HITS over a directed edge list: (src, dst) ->
    (name, auth_units, hub_units) in bigint fixed-point units of 1/scale.

    The web-graph companion to :func:`pagerank`: authority finds the pages
    many good hubs point AT (the canonical-entity candidates in a link
    graph), hub finds the pages that point at many good authorities (the
    directory/index pages a crawler should prioritise). Compose with
    extract/links.host_graph for host-level authority.

    Same determinism contract as the integer PageRank: every operation is
    a bigint add / multiply / floor-div, so the result is bit-identical
    under any partitioning or engine and the DuckDB oracle replays it with
    unrolled SQL. Normalization per half-step is L-infinity (divide by the
    current max, so the best score is exactly ``scale``) — unlike the
    classic L2 norm this stays inside integer arithmetic, and since HITS
    scores are scale-free the ranking is unchanged.

    Per iteration: auth(v) = sum of hub over in-neighbours, normalised;
    then hub(u) = sum of NEW auth over out-neighbours, normalised — two
    equi-joins + two aggregates + two 1-row max broadcasts, one
    localCheckpoint to cut lineage; no per-iteration driver action.

    Overflow guard: the normalise step computes raw * scale where raw <=
    max_degree * scale, so max_degree * scale**2 must stay below 2**63 —
    checked once up front against the actual graph (the semdedup_pairs
    discipline); lower ``scale`` for hub-heavy graphs.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if scale < 2:
        raise ValueError(f"scale must be >= 2, got {scale}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint()
    if e.agg(F.count(F.lit(1)).alias("m")).first()["m"] == 0:
        raise ValueError("hits() needs at least one edge")
    maxdeg = (
        e.select(F.col("src").alias("name"))
        .unionAll(e.select(F.col("dst").alias("name")))
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d").alias("d"))
        .first()["d"]
    )
    if maxdeg * scale * scale >= 2**63:
        raise ValueError(
            f"max degree {maxdeg} * scale**2 ({scale}**2) would overflow bigint; "
            "pass a smaller scale"
        )
    nodes = (
        e.select(F.col("src").alias("name"))
        .union(e.select(F.col("dst").alias("name")))
        .distinct()
        .localCheckpoint()
    )
    scores = nodes.selectExpr(
        "name", f"{scale}::bigint AS a", f"{scale}::bigint AS h"
    )
    for _ in range(max_iter):
        araw = (
            e.join(scores.selectExpr("name AS src", "h"), "src")
            .groupBy(F.col("dst").alias("name"))
            .agg(F.sum("h").alias("v"))
        )
        amax = araw.agg(F.max("v").alias("_am"))
        an = (
            nodes.join(araw, "name", "left")
            .crossJoin(F.broadcast(amax))
            .selectExpr("name", f"(coalesce(v, 0) * {scale}) div _am AS a")
        )
        hraw = (
            e.join(an.selectExpr("name AS dst", "a"), "dst")
            .groupBy(F.col("src").alias("name"))
            .agg(F.sum("a").alias("v"))
        )
        hmax = hraw.agg(F.max("v").alias("_hm"))
        scores = (
            an.join(hraw, "name", "left")
            .crossJoin(F.broadcast(hmax))
            .selectExpr("name", "a", f"(coalesce(v, 0) * {scale}) div _hm AS h")
            .localCheckpoint()
        )
    return scores.select(
        "name", F.col("a").alias("auth_units"), F.col("h").alias("hub_units")
    )


def path_features_2hop(
    edges: DataFrame,
    pairs: DataFrame | None = None,
    src: str = "src",
    rel: str = "rel",
    dst: str = "dst",
    max_mid_degree: int | None = None,
) -> DataFrame:
    """PRA-style relation-typed path features: for every (a, b) connected
    by a directed 2-hop path, the count of paths per relation sequence —
    (a, b, rel_path 'r1>r2', n_paths). The Path Ranking Algorithm's
    feature matrix (Lao & Cohen 2010) restricted to length-2 paths: each
    (rel_path, n_paths) column is a typed-connectivity feature for KB
    completion, complementing the untyped CN/RA/Jaccard heuristics of
    :func:`link_prediction_scores` with the relation semantics a KG has
    and a plain graph doesn't.

    Shape: one self-equi-join on the mid node, then a HashAggregate keyed
    by (a, b, r1, r2) with map-side combine. Self-pairs (a == b, i.e.
    round trips) are dropped. The join fan-out is Omega(sum over mids of
    indeg*outdeg) — the same hub honesty as link_prediction_scores, so
    ``max_mid_degree`` caps the TOTAL degree of mid nodes (celebrity
    entities stop manufacturing quadratic path rows; the audit query is
    the caller's job, as with lp_center_audit). ``pairs`` (a, b) narrows
    the output to a candidate set — it semi-joins the FIRST hop on `a`
    before the fan-out, then the result on (a, b), so candidates prune
    work, not just output."""
    e = edges.select(
        F.col(src).alias("_s"), F.col(rel).alias("_r"), F.col(dst).alias("_d")
    ).localCheckpoint()
    left = e.select(F.col("_s").alias("a"), F.col("_r").alias("r1"), F.col("_d").alias("mid"))
    right = e.select(F.col("_s").alias("mid"), F.col("_r").alias("r2"), F.col("_d").alias("b"))
    if max_mid_degree is not None:
        if max_mid_degree < 1:
            raise ValueError(f"max_mid_degree must be >= 1, got {max_mid_degree}")
        deg = (
            e.select(F.col("_s").alias("mid"))
            .unionAll(e.select(F.col("_d").alias("mid")))
            .groupBy("mid")
            .agg(F.count(F.lit(1)).alias("_deg"))
            .filter(F.col("_deg") <= max_mid_degree)
            .select("mid")
        )
        left = left.join(deg, "mid", "left_semi")
    if pairs is not None:
        cand = pairs.select(
            F.col(pairs.columns[0]).alias("a"), F.col(pairs.columns[1]).alias("b")
        ).distinct()
        left = left.join(cand.select("a").distinct(), "a", "left_semi")
    out = (
        left.join(right, "mid")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b", F.concat_ws(">", "r1", "r2").alias("rel_path"))
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
    if pairs is not None:
        out = out.join(cand, ["a", "b"], "left_semi")
    return out


def graph_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Whole-graph structural summary: one row
    ``(n_nodes, n_edges, n_reciprocal, reciprocity_ppm, assortativity)``
    over the distinct directed edge set (self-loops excluded).

    - ``reciprocity_ppm``: share of directed edges whose reverse also
      exists, in exact integer ppm ``(10**6 * n_reciprocal) div n_edges``
      — the link-spam / citation-ring signal on web graphs (organic link
      graphs are mostly one-way; mutual-link farms are not).
    - ``assortativity``: directed degree assortativity (Newman 2002) —
      the Pearson correlation over edges of (out-degree of source,
      in-degree of target); positive = hubs link to hubs, negative =
      hub-and-spoke. All five moment sums are EXACT bigints (the
      stats_moments discipline), one float expression at the end rounded
      to 6 dp — partitioning-invariant and replayed by the oracle; 0.0
      by convention when either variance is zero. Exactness bound:
      ``n_edges * max_degree**2 < 2**63`` (beyond that, pre-aggregate
      per degree-pair first or accept double sums — documented, not
      silently wrong: bigint overflow raises in both engines).

    Plan: distinct + self-join on the reversed key for reciprocity, two
    degree aggregates + two equi-joins for the moment row — every step
    keyed by node or edge, map-side combinable, one 1-row result.
    """
    e = (
        edges.select(
            F.col(src).cast("string").alias("_s"),
            F.col(dst).cast("string").alias("_d"),
        )
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
        .localCheckpoint()
    )
    rev = e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))
    recip = (
        e.join(rev, ["_s", "_d"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_reciprocal"))
    )
    nn = (
        e.select(F.col("_s").alias("n"))
        .unionByName(e.select(F.col("_d").alias("n")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_x"))
    indeg = e.groupBy("_d").agg(F.count(F.lit(1)).alias("_y"))
    m = (
        e.join(outdeg, "_s")
        .join(indeg, "_d")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum("_x").alias("_sx"),
            F.sum("_y").alias("_sy"),
            F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
            F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        )
    )
    num = F.col("n_edges") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    vx = F.col("n_edges") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = F.col("n_edges") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    assort = F.when((vx == 0) | (vy == 0), F.lit(0.0)).otherwise(
        F.round(
            num.cast("double")
            / F.sqrt(vx.cast("double") * vy.cast("double")),
            6,
        )
    )
    return (
        m.crossJoin(F.broadcast(recip))
        .crossJoin(F.broadcast(nn))
        .select(
            "n_nodes",
            "n_edges",
            "n_reciprocal",
            F.expr("((1000000 * n_reciprocal) div n_edges)::bigint").alias(
                "reciprocity_ppm"
            ),
            assort.alias("assortativity"),
        )
    )


def scc(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_rounds: int = 10,
    max_prop_iter: int = 30,
) -> DataFrame:
    """Strongly connected components of a directed graph -> (name, scc_id)
    with ``scc_id`` the MIN member id of each SCC (the connected-components
    canonical-id convention, so the output is algorithm-independent). On a
    web link graph SCCs are the mutual-link cores (the bowtie's center,
    link rings, citation cartels) that undirected components cannot see.

    Algorithm — distributed coloring (Orzan 2004 / Slota et al. 2014),
    all joins and aggregates, no driver loop over data:

    per outer round, on the remaining subgraph:
      1. FORWARD max-color propagation to fixpoint: color(v) = max hash
         of any node that reaches v (O(diameter) join rounds). Colors are
         md5(name), NOT raw ids: the adversarial O(n)-round case of the
         coloring algorithm is a path with ids decreasing along it, and
         hashing makes that ordering improbable for any real id scheme
         (the salting discipline). Output canonicality is unaffected.
      2. Roots (color == own hash) start a BACKWARD closure restricted to
         their color class: the nodes that also reach their root — exactly
         SCC(root), one SCC per color class per round, all in parallel.
      3. Found SCCs are emitted and removed; the next round recolors.

    Both loops carry an ``until_stable`` action per iteration (the kcore
    discipline) and RAISE on hitting their caps rather than returning a
    partial answer. ``localCheckpoint`` per iteration cuts lineage.
    """
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    if max_prop_iter < 1:
        raise ValueError(f"max_prop_iter must be >= 1, got {max_prop_iter}")
    e = (
        edges.select(
            F.col(src).cast("string").alias("src"),
            F.col(dst).cast("string").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("name"))
        .unionByName(e.select(F.col("dst").alias("name")))
        .distinct()
        .localCheckpoint()
    )
    done: DataFrame | None = None
    for _ in range(max_rounds):
        if nodes.isEmpty():
            break
        color = nodes.select("name", F.md5("name").alias("color"))
        for _ in range(max_prop_iter):
            upd = (
                e.join(color.withColumnRenamed("name", "src"), "src")
                .groupBy(F.col("dst").alias("name"))
                .agg(F.max("color").alias("_mc"))
            )
            new = (
                color.join(upd, "name", "left")
                .select(
                    "name",
                    F.greatest("color", F.coalesce("_mc", F.lit(""))).alias("color"),
                )
                .localCheckpoint()
            )
            n_changed = (
                new.join(color.withColumnRenamed("color", "_old"), "name")
                .filter(F.col("color") != F.col("_old"))
                .count()
            )
            color = new
            if n_changed == 0:
                break
        else:
            raise RuntimeError(
                f"scc: forward coloring did not converge within "
                f"max_prop_iter={max_prop_iter} rounds; raise it (each round "
                "is one join + one aggregate)"
            )
        members = color.filter(F.md5("name") == F.col("color")).select(
            "name", F.col("color").alias("_root")
        ).localCheckpoint()
        for _ in range(max_prop_iter):
            nxt = (
                e.join(
                    members.withColumnRenamed("name", "dst"), "dst"
                )  # edge u->v with v a member: u reaches the root via v
                .select(F.col("src").alias("name"), "_root")
                .join(color, "name")
                .filter(F.col("color") == F.col("_root"))  # same class only
                .select("name", "_root")
                .distinct()
                .join(members, ["name"], "left_anti")
                .localCheckpoint()
            )
            if nxt.isEmpty():
                break
            members = members.unionByName(
                nxt.select("name", "_root")
            ).localCheckpoint()
        else:
            raise RuntimeError(
                f"scc: backward closure did not converge within "
                f"max_prop_iter={max_prop_iter} rounds; raise it"
            )
        comp_id = members.groupBy("_root").agg(F.min("name").alias("scc_id"))
        found = members.join(comp_id, "_root").select("name", "scc_id")
        done = found if done is None else done.unionByName(found)
        done = done.localCheckpoint()
        nodes = nodes.join(found, "name", "left_anti").localCheckpoint()
        e = (
            e.join(nodes.withColumnRenamed("name", "src"), "src", "left_semi")
            .join(nodes.withColumnRenamed("name", "dst"), "dst", "left_semi")
            .localCheckpoint()
        )
    if not nodes.isEmpty():
        raise RuntimeError(
            f"scc: {nodes.count()} nodes unresolved after max_rounds="
            f"{max_rounds} outer rounds (long dependency chains); raise "
            "max_rounds — each round peels one SCC per color class"
        )
    assert done is not None
    return done
