"""X2: the reference's declared extraction interface, implemented.

``entity_extraction.py:9-56`` declares (and never implements) an
EntityExtractor with batch-first methods; this facade backs each method with
the engine's real operators so a reference user keeps their call shapes:

- extract_entities / extract_entities_batch  -> mention detection (X6)
- extract_triples_from_text                  -> pinned OpenIE (X1)
- extract_triples_from_records(records, schema) -> rule-compiled plans (the
  core construction operator, SURVEY J1/E1-E4) on a driver-side record list
  (dimension-scale; DataFrame pipelines call construct.triples directly).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from kgspark.construct.triples import triples_from_records
from kgspark.extract.mentions import AhoCorasick
from kgspark.extract.openie import extract_triples_text
from kgspark.ontology import ExplodeRule, ScalarRule

Triple = tuple[str, str, str]


class EntityExtractor:
    """Deterministic extractor with the reference's interface shape."""

    def __init__(self, alias_dict: dict[str, tuple[str, str]] | None = None):
        """alias_dict: surface form -> (label, canonical name)."""
        self.alias_dict = alias_dict or {}
        self._automaton = AhoCorasick(list(self.alias_dict)) if alias_dict else None

    def extract_entities(self, text: str) -> list[dict[str, Any]]:
        if not text or not self._automaton:
            return []
        out = []
        for end, pat in self._automaton.find_all(text):
            label, name = self.alias_dict[pat]
            out.append(
                {"type": label, "name": name, "span": (end - len(pat) + 1, end + 1), "surface": pat}
            )
        return out

    def extract_entities_batch(self, texts: list[str]) -> list[list[dict[str, Any]]]:
        return [self.extract_entities(t) for t in texts]

    def extract_triples_from_text(self, text: str) -> list[Triple]:
        return [(s, p, o) for s, _st, p, o, _ot in extract_triples_text(text)]

    def extract_triples_from_records(
        self,
        records: list[dict[str, Any]],
        schema: dict[str, tuple[str, str, str]],
        head_col: str = "name",
        head_type: str = "Entity",
        spark: SparkSession | None = None,
    ) -> list[Triple]:
        """schema: field -> (head_type, relation, tail_type). Array fields
        explode; scalar fields emit one edge when non-empty — exactly the
        loader FOREACH semantics, compiled through the same rule planner the
        DataFrame pipeline uses."""
        if not records:
            return []
        spark = spark or SparkSession.active()
        rules = []
        for field, (h_type, rel, t_type) in schema.items():
            sample = next((r[field] for r in records if r.get(field) is not None), None)
            cls = ExplodeRule if isinstance(sample, list) else ScalarRule
            rules.append(cls(h_type, head_col, rel, t_type, field))
        df = spark.createDataFrame(records)
        out = triples_from_records(df, rules)
        return [(r["subj"], r["pred"], r["obj"]) for r in out.collect()]
