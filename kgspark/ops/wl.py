"""1-WL (Weisfeiler-Leman) node-role refinement and graph signatures.

Color refinement: every node's label is iteratively replaced by a hash
of (its label, the multiset of its out-neighbors' labels, the multiset
of its in-neighbors' labels). After r rounds, two nodes share a label
iff their r-hop neighborhood structures are indistinguishable — the
classic structural-role equivalence (Weisfeiler & Leman 1968; the test
behind GIN expressiveness, Xu et al. 2019). In a KG pipeline this is
the role detector (nodes that play the same structural part across the
graph get one label) and, folded once more, a whole-(sub)graph
signature for deduplicating extracted subgraphs — near-identical
extraction outputs collapse to one canonical form.

Scale design — the multiset is hashed COMMUTATIVELY, never collected:

    term(l) = (60-bit md5 prefix of l) mod 2**32
    multiset digest = (sum of terms, count)

A sorted ``collect_list`` of neighbor labels (the textbook WL step) is
degree-sized per node — a 10^7-degree hub materializes a 10^7-element
array in one aggregation buffer. The (sum, count) digest is an ordinary
map-side-combinable aggregate: partition-order-free by integer-sum
commutativity, bounded memory at ANY degree, and exact in bigint up to
~2*10^9 in-neighbors (2^32 * 2^31 < 2^63). Collisions are the standard
multiset-hash trade-off (~2^-32 per colliding pair per round) —
acceptable for role detection, and each round's md5 re-mix keeps them
from compounding. The md5-prefix term is the repo's portable-hash
technique (kg_sampling), so the DuckDB oracle replays every round
bit-for-bit.

Per round: two (edge -> label) equi-joins + two aggregates + one
projection, ``localCheckpoint`` lineage cut — the graph_algs iterative
discipline. The reference has nothing comparable (SURVEY §2 has no
structural-role operator); this extends the graph suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MOD = 2**32


def _term(lab: Column) -> Column:
    """Portable 60-bit md5 prefix of a label string, folded to 32 bits."""
    h = F.conv(F.substring(F.md5(lab), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(_MOD))


def wl_refine(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    rounds: int = 2,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """(src, dst) edge list -> (name, wl_label) after ``rounds`` of 1-WL
    color refinement. ``init_labels`` (name, label) seeds the coloring
    (e.g. entity types); nodes absent from it — and all nodes when it is
    omitted — start from the constant label, so round 1 separates by
    (in-degree, out-degree) and round r by r-hop structure.

    Directed: out- and in-neighbor multisets are digested separately,
    so a pure source and a pure sink of equal degree differ at round 1.
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = edges.select(
        F.col(src).cast("string").alias("src"),
        F.col(dst).cast("string").alias("dst"),
    ).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("name"))
        .unionByName(e.select(F.col("dst").alias("name")))
        .distinct()
    )
    if init_labels is None:
        lab = nodes.withColumn("lab", F.lit("."))
    else:
        il = init_labels.select(
            F.col("name").cast("string").alias("name"),
            F.col("label").cast("string").alias("_l0"),
        )
        lab = nodes.join(il, "name", "left").select(
            "name", F.coalesce("_l0", F.lit(".")).alias("lab")
        )
    for _ in range(rounds):
        out_dig = (
            e.join(lab.withColumnRenamed("name", "dst"), "dst")
            .groupBy(F.col("src").alias("name"))
            .agg(
                F.sum(_term(F.col("lab"))).alias("_os"),
                F.count(F.lit(1)).alias("_oc"),
            )
        )
        in_dig = (
            e.join(lab.withColumnRenamed("name", "src"), "src")
            .groupBy(F.col("dst").alias("name"))
            .agg(
                F.sum(_term(F.col("lab"))).alias("_is"),
                F.count(F.lit(1)).alias("_ic"),
            )
        )
        lab = (
            lab.join(out_dig, "name", "left")
            .join(in_dig, "name", "left")
            .select(
                "name",
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("lab"),
                        F.coalesce(F.col("_os"), F.lit(0)).cast("string"),
                        F.coalesce(F.col("_oc"), F.lit(0)).cast("string"),
                        F.coalesce(F.col("_is"), F.lit(0)).cast("string"),
                        F.coalesce(F.col("_ic"), F.lit(0)).cast("string"),
                    )
                ).alias("lab"),
            )
            .localCheckpoint()
        )
    return lab.select("name", F.col("lab").alias("wl_label"))


def wl_signature(
    labels: DataFrame, group_col: str | None = None
) -> DataFrame:
    """(name, wl_label) [, group] -> one signature row per group (or one
    total): md5 over the commutative (sum, count) digest of the label
    multiset — two (sub)graphs get equal signatures iff refinement
    produced the same label multiset (up to digest collision). The
    subgraph-dedup key: group extracted subgraphs by signature, keep one
    representative per class."""
    keys = [group_col] if group_col else []
    agg = (labels.groupBy(*keys) if keys else labels.groupBy()).agg(
        F.sum(_term(F.col("wl_label"))).alias("_s"),
        F.count(F.lit(1)).alias("_c"),
    )
    sig = F.md5(
        F.concat_ws(
            "|", F.col("_s").cast("string"), F.col("_c").cast("string")
        )
    ).alias("wl_signature")
    return agg.select(*keys, sig)


def wl_quotient(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Quotient (summary) graph under a role labeling: collapse every
    node to its ``wl_label`` and count collapsed edges —
    ``(src_role, dst_role, n_edges, n_src_nodes, n_dst_nodes)``. After
    ``wl_refine`` this is graph summarization (Tian et al. SIGMOD'08
    SNAP-style): a billion-edge KG reduces to a role-level schema
    diagram whose size is bounded by the number of roles squared —
    the inspection artifact for "what structure did extraction build".

    Two label equi-joins + one aggregate, all map-side combinable; the
    per-role node counts join onto the (roles x roles)-bounded table,
    never the edge list.
    """
    lab = labels.select(
        F.col("name").alias("_n"), F.col("wl_label").alias("_l")
    )
    sizes = lab.groupBy(F.col("_l").alias("_r")).agg(
        F.count(F.lit(1)).alias("_sz")
    )
    q = (
        edges.select(
            F.col(src).cast("string").alias("_s"),
            F.col(dst).cast("string").alias("_d"),
        )
        .join(lab.withColumnRenamed("_n", "_s"), "_s")
        .withColumnRenamed("_l", "src_role")
        .join(lab.withColumnRenamed("_n", "_d"), "_d")
        .withColumnRenamed("_l", "dst_role")
        .groupBy("src_role", "dst_role")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    return (
        q.join(sizes.withColumnRenamed("_r", "src_role"), "src_role")
        .withColumnRenamed("_sz", "n_src_nodes")
        .join(sizes.withColumnRenamed("_r", "dst_role"), "dst_role")
        .withColumnRenamed("_sz", "n_dst_nodes")
        .select("src_role", "dst_role", "n_edges", "n_src_nodes", "n_dst_nodes")
    )
