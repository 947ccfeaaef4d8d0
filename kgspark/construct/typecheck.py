"""Ontology signature checks over a built KG: domain/range validation and
predicate-signature type inference.

The reference's ontology (kgspark.ontology rules; reference
``neo4j_loader.py``'s per-relation FOREACH blocks) fixes each predicate's
(subject-type, object-type) signature at extraction time. At web scale the
signature becomes a *contract to verify* rather than a construction
invariant: OpenIE triples, merged feeds, and resumed partial builds can
all disagree with it. ``check_edge_types`` finds the disagreements;
``infer_types`` turns the same signatures into typing evidence for
entities whose type extraction could not determine (the standard
KB-completion bootstrap: an entity used where only a Drug can stand is
probably a Drug).

Execution shape: the spec is dimension-scale and broadcast; the edge
table is touched once per check (one narrow pass + broadcast joins), and
the inference votes aggregate with map-side combine before
:func:`kgspark.construct.fusion.fuse_attributes` resolves them with its
bigint deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.construct.fusion import fuse_attributes


def _spec_df(spark, spec) -> DataFrame:
    """spec: DataFrame(rel, domain, range) or list of (rel, domain, range)."""
    if isinstance(spec, DataFrame):
        return spec.select(
            F.col(spec.columns[0]).alias("rel"),
            F.col(spec.columns[1]).alias("domain"),
            F.col(spec.columns[2]).alias("range"),
        ).distinct()
    return spark.createDataFrame(spec, "rel string, domain string, range string").distinct()


def check_edge_types(
    nodes: DataFrame,
    edges: DataFrame,
    spec,
    node_id: str = "entity_id",
    label: str = "label",
    src: str = "src_id",
    rel: str = "rel",
    dst: str = "dst_id",
) -> DataFrame:
    """Return the edges that violate the predicate signatures in ``spec``.

    ``spec`` rows are allowed (rel, domain, range) signatures; a predicate
    may carry several (e.g. IN_NATION accepts Customer and Supplier
    subjects). An edge passes if ANY spec row matches its
    (rel, src label, dst label); otherwise it is returned with
    ``violation`` = ``'unlabeled_endpoint'`` (src or dst has no row in
    ``nodes`` — a dangling reference, the classic web-extraction defect,
    reported first because a signature cannot even be evaluated without
    both labels), ``'unknown_rel'`` (the predicate has no signature at
    all) or ``'signature'`` (known predicate, wrong endpoint types).
    Dangling endpoints surface with a NULL ``src_label``/``dst_label``
    rather than silently passing, so an empty result really does mean a
    type-sound, endpoint-complete graph.

    Output: (src, rel, dst, src_label, dst_label, violation) — violations
    only; an empty result is a type-sound graph. Plan: two LEFT
    equi-joins to type the endpoints (co-located with a bucketed nodes
    table; left so dangling endpoints survive to be reported), then
    broadcast left joins against the spec — the edge table shuffles at
    most for the node joins, never for the spec."""
    sp = _spec_df(edges.sparkSession, spec).localCheckpoint()
    lab = nodes.select(F.col(node_id).alias("_nid"), F.col(label).alias("_lab"))
    typed = (
        edges.select(F.col(src).alias("src"), F.col(rel).alias("rel"), F.col(dst).alias("dst"))
        .join(lab.withColumnRenamed("_nid", "src"), "src", "left")
        .withColumnRenamed("_lab", "src_label")
        .join(lab.withColumnRenamed("_nid", "dst"), "dst", "left")
        .withColumnRenamed("_lab", "dst_label")
    )
    sig = sp.select("rel", F.col("domain").alias("src_label"), F.col("range").alias("dst_label")).withColumn("_sig_ok", F.lit(True))
    known = sp.select("rel").distinct().withColumn("_rel_known", F.lit(True))
    return (
        typed.join(F.broadcast(sig), ["rel", "src_label", "dst_label"], "left")
        .join(F.broadcast(known), ["rel"], "left")
        .filter(F.col("_sig_ok").isNull())
        .select(
            "src",
            "rel",
            "dst",
            "src_label",
            "dst_label",
            F.when(
                F.col("src_label").isNull() | F.col("dst_label").isNull(),
                F.lit("unlabeled_endpoint"),
            )
            .when(F.col("_rel_known").isNull(), F.lit("unknown_rel"))
            .otherwise(F.lit("signature"))
            .alias("violation"),
        )
    )


def infer_types(
    edges: DataFrame,
    spec,
    src: str = "src_id",
    rel: str = "rel",
    dst: str = "dst_id",
) -> DataFrame:
    """Predicate-signature voting: every edge whose rel appears in ``spec``
    votes its subject into the rel's domain type(s) and its object into
    the range type(s); :func:`fuse_attributes` resolves the votes per
    entity (majority, then lexicographically-smallest type — so ambiguous
    multi-domain predicates surface as ties with ``n_values > 1`` rather
    than flapping).

    Output: (entity_id, type, votes, total_votes, n_values, support_ppm).
    Plan: two broadcast joins edge-side (the corpus never shuffles to meet
    the spec), one vote aggregate with map-side combine, then the bounded
    fusion window."""
    sp = _spec_df(edges.sparkSession, spec).localCheckpoint()
    e = edges.select(F.col(src).alias("_s"), F.col(rel).alias("rel"), F.col(dst).alias("_d"))
    dom_votes = e.join(
        F.broadcast(sp.select("rel", F.col("domain").alias("_type")).distinct()), "rel"
    ).select(F.col("_s").alias("entity_id"), F.col("_type"))
    rng_votes = e.join(
        F.broadcast(sp.select("rel", F.col("range").alias("_type")).distinct()), "rel"
    ).select(F.col("_d").alias("entity_id"), F.col("_type"))
    assertions = dom_votes.unionByName(rng_votes).select(
        "entity_id", F.lit("type").alias("_attr"), F.col("_type").alias("_value")
    )
    fused = fuse_attributes(
        assertions, entity_col="entity_id", attr_col="_attr", value_col="_value"
    )
    return fused.select(
        "entity_id",
        F.col("value").alias("type"),
        "votes",
        "total_votes",
        "n_values",
        "support_ppm",
    )
