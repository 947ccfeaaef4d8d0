"""Record -> triple generation, compiled from ontology rules.

This is the reference's ``extract_triples_from_records`` surface
(``entity_extraction.py:45-56``) made concrete: each rule from
``kgspark.ontology`` compiles to a pure ``select`` / ``explode`` / ``filter``
plan over a projected source frame, so Catalyst column-prunes the scan down
to exactly the head column + rule column and the whole stage is
whole-stage-codegen (no Python in the loop).

Output schema: ``subj, subj_type, pred, obj, obj_type`` (SURVEY §1.1),
optionally with the source ``seq`` carried for provenance.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.ontology import ContainsRule, ExplodeRule, ScalarRule

Rule = ExplodeRule | ScalarRule | ContainsRule


def _rule_plan(df: DataFrame, rule: Rule) -> DataFrame:
    head = F.col(rule.head_col).alias("subj")
    head_t = F.lit(rule.head_type).alias("subj_type")
    pred = F.lit(rule.rel).alias("pred")
    tail_t = F.lit(rule.tail_type).alias("obj_type")

    if isinstance(rule, ExplodeRule):
        # E1-E4 (neo4j_loader.py:126-147): FOREACH over the array field.
        # explode() drops null/empty arrays, matching FOREACH over [].
        return df.select(head, head_t, pred, F.explode(rule.tail_col).alias("obj"), tail_t)
    if isinstance(rule, ScalarRule):
        # P4 guard: emit only when the scalar is non-empty (:132-135)
        return (
            df.filter(F.col(rule.tail_col).isNotNull() & (F.col(rule.tail_col) != ""))
            .select(head, head_t, pred, F.col(rule.tail_col).alias("obj"), tail_t)
        )
    if isinstance(rule, ContainsRule):
        # P5/J5-J6 (:248-266): any-of substring predicate -> fixed literal tail
        cond = reduce(
            lambda a, b: a | b,
            [F.col(rule.match_col).contains(kw) for kw in rule.keywords],
        )
        return df.filter(F.col(rule.match_col).isNotNull() & cond).select(
            head, head_t, pred, F.lit(rule.tail_name).alias("obj"), tail_t
        )
    raise TypeError(f"unknown rule type: {type(rule)!r}")


def triples_from_records(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Union of all rule plans over one source frame.

    Null subjects are dropped (a Cypher ``MERGE {name: null}`` fails its whole
    batch, which the reference logs and swallows — neo4j_loader.py:280-282 —
    so null-named records never reach the graph).
    """
    plans = [_rule_plan(df, r) for r in rules]
    out = reduce(lambda a, b: a.unionByName(b), plans)
    return out.filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())


def keyword_contains_join(
    docs: DataFrame, keywords: DataFrame, text_col: str, kw_col: str = "kw"
) -> DataFrame:
    """Generalized J5: theta-join ``contains(text, kw)`` against a small
    keyword dimension via broadcast nested-loop join (dictionary ≪ corpus).

    For large dictionaries use kgspark.extract.mentions (one Aho-Corasick-style
    pass per document instead of |dict| scans).
    """
    return docs.crossJoin(F.broadcast(keywords)).filter(
        F.col(text_col).contains(F.col(kw_col))
    )
