"""End-to-end structured KG build (the reference's ``load_all`` as one DAG).

``neo4j_loader.py:62-77`` runs four loaders in fixed order against a mutable
graph store. Here the same semantics are one lazy Spark plan: per-source
projection frames -> rule-compiled triples -> union -> canonicalize ->
(nodes, edges). Load order survives as the ``seq`` band ordering inside the
last-write-wins aggregate, so no sequential execution is needed — the whole
build is a single shuffle-minimal DAG Catalyst can reorder.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark import ontology
from kgspark.construct import graph, triples as tr
from kgspark.sources import structured as src


@dataclass
class StructuredSources:
    diseases: str
    drugs: str
    nursing_homes: str
    insurances: str

    @classmethod
    def under(cls, data_dir: str | Path) -> "StructuredSources":
        d = Path(data_dir)
        return cls(
            diseases=str(d / "Diseases" / "diseases.json"),
            drugs=str(d / "Drugs" / "medicine.json"),
            nursing_homes=str(d / "NursingHomes" / "nursing_homes.csv"),
            insurances=str(d / "Insurance" / "insurance_info.json"),
        )


# insurance props = projected fields + description, minus the merge key
INSURANCE_PROP_FIELDS = [f for f in [*src.INSURANCE_COLMAP, "description"] if f != "name"]


def build_structured_graph(
    spark: SparkSession, sources: StructuredSources
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (nodes, edges, triples) for the four structured sources."""
    diseases = src.load_diseases(spark, sources.diseases)
    drugs = src.load_drugs(spark, sources.drugs)
    nursing = src.load_nursing_homes(spark, sources.nursing_homes)
    insurance = src.load_insurances(spark, sources.insurances)

    node_frames = [
        graph.node_records_from_source(diseases, "Disease", src.DISEASE_PROP_FIELDS),
        graph.node_records_from_source(drugs, "Drug", src.DRUG_PROP_FIELDS),
        graph.node_records_from_source(nursing, "NursingHome", list(src.NURSING_COLMAP)),
        graph.node_records_from_source(
            insurance, "Insurance", [*INSURANCE_PROP_FIELDS]
        ),
    ]

    disease_triples = tr.triples_from_records(diseases, ontology.DISEASE_RULES)
    insurance_triples = tr.triples_from_records(insurance, ontology.INSURANCE_RULES)
    all_triples = disease_triples.unionByName(insurance_triples)

    nodes, edges = graph.build_graph(node_frames, all_triples)
    return nodes, edges, all_triples


def triples_with_names(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Resolve edges back to (subj, subj_type, pred, obj, obj_type) for the
    P/R comparison surface. Both joins are equi-joins on entity_id; with the
    bucketed layout of ``save_graph`` they are co-partitioned."""
    n = nodes.select("entity_id", "label", "name")
    return (
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
