"""Entity co-occurrence PMI: candidate relatedness edges from co-mentions.

The classic distributional KG-enrichment signal (Church & Hanks 1990
pointwise mutual information over document co-occurrence): two entities
that appear in the same documents far more often than their individual
frequencies predict are related — the candidate-edge generator that
feeds human review or a typed link-prediction stage
(``ops/graph_algs.link_prediction_scores`` ranks WITHIN an existing
graph; this proposes edges from the corpus where no graph exists yet).
Composes directly with mention detection (``extract/mentions.py``):
detected (doc, entity) rows in, scored entity pairs out.

Determinism discipline (the token_entropy/unigram_logprob millinat
recipe): every count is an exact bigint; each logarithm is taken ONCE
per integer count and rounded to bigint millinats, so

    pmi_milli = r(n_ab) + r(N) - r(n_a) - r(n_b),   r(c) = round(1000*ln(c))

is a pure function of four bigints — partition-order-free, bit-identical
across engines, replayed term-for-term by the DuckDB oracle. NPMI
normalizes by the same rounded terms (``pmi_milli / (r(N) - r(n_ab))``,
one float division rounded to 6 dp; 1.0 by convention when the pair is
in every counted document — the p_ab -> 1 limit).

Scale shape: distinct (doc, entity) -> per-doc cap -> within-doc pair
self-join. The join is keyed by doc_id, so fan-out per document is
(entities-in-doc choose 2) and ``max_entities_per_doc`` bounds it —
entity-dense pages (link farms, index pages) are excluded ENTIRELY
(pairs AND marginals) so PMI marginals stay consistent over the counted
sub-corpus. All aggregates are map-side combinable; the corpus text
never moves (only (doc, entity) pairs shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _r(c: Column) -> Column:
    """ln of an exact integer count, rounded once to bigint millinats."""
    return F.round(F.log(c) * 1000).cast("bigint")


def entity_cooccurrence(
    mentions: DataFrame,
    id_col: str = "doc_id",
    entity_col: str = "entity",
    *,
    min_pairs: int = 2,
    max_entities_per_doc: int = 200,
) -> DataFrame:
    """(doc, entity) mention rows -> scored co-occurrence pairs
    ``(entity_a, entity_b, n_ab, n_a, n_b, n_docs, pmi_milli, npmi)``
    with ``entity_a < entity_b``, document-level co-occurrence counts,
    millinat PMI, and 6-dp NPMI in [-1, 1].

    Documents mentioning more than ``max_entities_per_doc`` distinct
    entities are excluded from counting entirely (see module doc);
    pairs co-occurring in fewer than ``min_pairs`` documents are
    dropped (PMI of rare pairs is noise — the standard floor).
    """
    if min_pairs < 1:
        raise ValueError(f"min_pairs must be >= 1, got {min_pairs}")
    if max_entities_per_doc < 2:
        raise ValueError(
            f"max_entities_per_doc must be >= 2, got {max_entities_per_doc}"
        )
    de = mentions.select(
        F.col(id_col).alias("_doc"), F.col(entity_col).alias("_ent")
    ).distinct()
    small = (
        de.groupBy("_doc")
        .agg(F.count(F.lit(1)).alias("_k"))
        .filter(F.col("_k") <= max_entities_per_doc)
        .select("_doc")
    )
    kept = de.join(small, "_doc", "left_semi")
    nd = kept.select("_doc").distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    na = kept.groupBy("_ent").agg(F.count(F.lit(1)).alias("_n"))
    a = kept.withColumnRenamed("_ent", "entity_a")
    b = kept.withColumnRenamed("_ent", "entity_b")
    pairs = (
        a.join(b, "_doc")
        .filter(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pairs)
    )
    scored = (
        pairs.join(
            na.select(
                F.col("_ent").alias("entity_a"), F.col("_n").alias("n_a")
            ),
            "entity_a",
        )
        .join(
            na.select(
                F.col("_ent").alias("entity_b"), F.col("_n").alias("n_b")
            ),
            "entity_b",
        )
        .crossJoin(F.broadcast(nd))
    )
    pmi = (
        _r(F.col("n_ab"))
        + _r(F.col("n_docs"))
        - _r(F.col("n_a"))
        - _r(F.col("n_b"))
    )
    denom = _r(F.col("n_docs")) - _r(F.col("n_ab"))
    npmi = F.when(denom == 0, F.lit(1.0)).otherwise(
        F.round(pmi / denom.cast("double"), 6)
    )
    return scored.select(
        "entity_a",
        "entity_b",
        "n_ab",
        "n_a",
        "n_b",
        "n_docs",
        pmi.alias("pmi_milli"),
        npmi.alias("npmi"),
    )
