"""Structured-source KG build vs the pure-Python oracle (miniature fixture).

Covers SURVEY §2: S1-S4 scans, P1-P5 projections/filters, E1-E4 explodes,
J1 upsert-join (stub creation), J5/J6 CONTAINS linking, A1 last-write-wins
canonicalization (incl. Neo4j `+=` null-deletes-key), A2 edge dedup, U1 union.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from kgspark.construct import oracle
from kgspark.construct.reference_build import (
    StructuredSources,
    build_structured_graph,
    triples_with_names,
)

REFERENCE_DATA = Path("/root/reference/insurance_medical_kgqa/DataCleaned")


@pytest.fixture(scope="module")
def built(spark, mini_sources):
    nodes, edges, triples = build_structured_graph(spark, mini_sources)
    nodes = nodes.cache()
    edges = edges.cache()
    return nodes, edges, triples


def _node_set(nodes):
    return {(r["label"], r["name"]) for r in nodes.select("label", "name").collect()}


def _edge_set(spark_triple_names):
    return {
        (r["subj_type"], r["subj"], r["pred"], r["obj_type"], r["obj"])
        for r in spark_triple_names.collect()
    }


def test_nodes_match_oracle(built, mini_sources):
    nodes, _, _ = built
    golden_nodes, _ = oracle.replay(Path(mini_sources.diseases).parent.parent)
    assert _node_set(nodes) == set(golden_nodes)


def test_edges_match_oracle(built, mini_sources):
    nodes, edges, _ = built
    _, golden_edges = oracle.replay(Path(mini_sources.diseases).parent.parent)
    got = _edge_set(triples_with_names(nodes, edges))
    assert got == golden_edges


def test_no_duplicate_entities_or_edges(built):
    nodes, edges, _ = built
    assert nodes.groupBy("label", "name").count().filter("count > 1").count() == 0
    assert nodes.groupBy("entity_id").count().filter("count > 1").count() == 0
    assert edges.groupBy("src_id", "rel", "dst_id").count().filter("count > 1").count() == 0


def test_last_write_wins_and_null_deletes_key(built, mini_sources):
    """Fixture record 11 rewrites the first disease with intro=null: the
    winning props must be record 11's, with the null key *absent* (Neo4j
    ``SET n += {intro: null}`` deletes the key)."""
    nodes, _, _ = built
    from kgspark.fixtures import DISEASES

    row = nodes.filter(
        (F.col("label") == "Disease") & (F.col("name") == DISEASES[0])
    ).collect()[0]
    assert "intro" not in row["props"]
    assert row["props"]["cause"] == "病因11"


def test_stub_nodes_have_empty_props(built):
    """Drug stubs created by disease TREATED_BY refs (names ending 注射液 are
    never in the medicine catalog) must exist with empty props."""
    nodes, _, _ = built
    stubs = nodes.filter(
        (F.col("label") == "Drug") & F.col("name").endswith("注射液")
    ).collect()
    assert stubs, "expected stub drugs"
    assert all(r["props"] == {} for r in stubs)


def test_contains_quirk_60_substring(built):
    """'等待期160天' contains '60' -> TARGETS_POPULATION edge (bug-compatible)."""
    nodes, edges, _ = built
    pop = nodes.filter(F.col("label") == "Population").collect()
    assert [r["name"] for r in pop] == ["老年人"]
    n_target = (
        triples_with_names(*built[:2]).filter(F.col("pred") == "TARGETS_POPULATION").count()
    )
    # rows 0 ('30天-70周岁' has no 60/老年... contains '30'), 1 (老年), 2 (160天 trap),
    # plus any AGE_RANGES with '60'
    assert n_target >= 2


@pytest.mark.skipif(not REFERENCE_DATA.exists(), reason="reference data not present")
def test_golden_reference_parity(spark):
    """Full-data golden: exactly the reference's 6,303 nodes / 4,970 edges
    (BASELINE.md), P/R >= 0.95 required — exact match expected."""
    sources = StructuredSources.under(REFERENCE_DATA)
    nodes, edges, _ = build_structured_graph(spark, sources)
    golden_nodes, golden_edges = oracle.replay(REFERENCE_DATA)

    got_nodes = _node_set(nodes)
    assert len(golden_nodes) == 6303, "oracle drifted from BASELINE.md"
    assert len(golden_edges) == 4970, "oracle drifted from BASELINE.md"
    assert got_nodes == set(golden_nodes)

    got_edges = _edge_set(triples_with_names(nodes, edges))
    p, r = oracle.precision_recall(got_edges, golden_edges)
    assert p >= 0.95 and r >= 0.95
    assert got_edges == golden_edges  # exact, not just P/R


@pytest.mark.skipif(not REFERENCE_DATA.exists(), reason="reference data not present")
def test_golden_reference_label_counts(spark):
    golden_nodes, golden_edges = oracle.replay(REFERENCE_DATA)
    from collections import Counter

    by_label = Counter(label for label, _ in golden_nodes)
    assert by_label == {
        "Disease": 804, "Symptom": 1256, "Drug": 3665, "NursingHome": 469,
        "Insurance": 76, "Department": 32, "Population": 1,
    }
    by_rel = Counter(rel for _, _, rel, _, _ in golden_edges)
    assert by_rel == {
        "HAS_SYMPTOM": 2868, "HAS_COMPLICATION": 1017, "TREATED_BY": 642,
        "BELONGS_TO_DEPT": 398, "COVERS_DISEASE": 34, "TARGETS_POPULATION": 11,
    }


def test_export_for_neo4j_shape(spark, tmp_path, mini_sources):
    """The Neo4j bulk-import export must carry the :ID/:LABEL/:START_ID/
    :END_ID/:TYPE headers, round-trip the full graph row counts, and keep
    props as parseable JSON."""
    import csv
    import glob
    import json

    from kgspark.construct.graph import export_for_neo4j
    from kgspark.construct.reference_build import build_structured_graph

    nodes, edges, _ = build_structured_graph(spark, mini_sources)
    out = str(tmp_path / "neo")
    export_for_neo4j(nodes, edges, out)

    node_rows, rel_rows = [], []
    for f in glob.glob(f"{out}/neo4j_nodes/part-*.csv"):
        with open(f, newline="", encoding="utf-8") as fh:
            r = csv.DictReader(fh)
            assert r.fieldnames == ["id:ID", ":LABEL", "name", "props"]
            node_rows += list(r)
    for f in glob.glob(f"{out}/neo4j_rels/part-*.csv"):
        with open(f, newline="", encoding="utf-8") as fh:
            r = csv.DictReader(fh)
            assert r.fieldnames == [":START_ID", ":END_ID", ":TYPE"]
            rel_rows += list(r)
    assert len(node_rows) == nodes.count()
    assert len(rel_rows) == edges.count()
    withprops = next(x for x in node_rows if x["props"] not in ("", "{}"))
    assert isinstance(json.loads(withprops["props"]), dict)
    ids = {x["id:ID"] for x in node_rows}
    assert all(x[":START_ID"] in ids and x[":END_ID"] in ids for x in rel_rows)


def test_export_ntriples_roundtrip(spark, tmp_path, mini_sources):
    """N-Triples export: statement counts match the graph (1 type + 1 name
    per node + 1 per non-null prop; 1 per edge), entity IRIs agree between
    node and edge files, and ECHAR escaping round-trips hostile strings."""
    import glob
    import re

    from kgspark.construct.graph import export_ntriples
    from kgspark.construct.reference_build import build_structured_graph
    from pyspark.sql import functions as F

    nodes, edges, _ = build_structured_graph(spark, mini_sources)
    # splice in a node with every ECHAR escape case in the name
    hostile = 'a"b\\c\nd\te中'
    nodes = nodes.unionByName(
        spark.createDataFrame(
            [(123456789, "Disease", hostile, {"k y": 'v"1\n2'})],
            "entity_id long, label string, name string, props map<string,string>",
        )
    )
    out = str(tmp_path / "nt")
    export_ntriples(nodes, edges, out)

    def lines(sub):
        got = []
        for f in glob.glob(f"{out}/{sub}/part-*"):
            with open(f, encoding="utf-8") as fh:
                got += [ln for ln in fh.read().splitlines() if ln]
        return got

    node_lines, edge_lines = lines("nodes_nt"), lines("edges_nt")
    n_props = nodes.select(F.explode("props").alias("k", "v")).where(
        F.col("v").isNotNull()
    ).count()
    assert len(node_lines) == 2 * nodes.count() + n_props
    assert len(edge_lines) == edges.count()
    nt = re.compile(r"^(<[^>]+>) (<[^>]+>) (<[^>]+>|\"(?:[^\"\\]|\\.)*\") \.$")
    assert all(nt.match(ln) for ln in node_lines + edge_lines)
    # edge subjects/objects must reference exported entity IRIs
    ents = {m.group(1) for ln in node_lines if (m := nt.match(ln))}
    for ln in edge_lines:
        m = nt.match(ln)
        assert m.group(1) in ents and m.group(3) in ents
    # escaping round-trip for the hostile name
    esc = next(
        ln for ln in node_lines if "<urn:kg:entity/123456789>" in ln and "name" in ln
    )
    lit = nt.match(esc).group(3)[1:-1]
    ech = {"n": "\n", "r": "\r", "t": "\t", '"': '"', "\\": "\\"}
    unescaped = re.sub(r"\\(.)", lambda m: ech[m.group(1)], lit)
    assert unescaped == hostile


def test_rules_roundtrip_through_config(spark, mini_sources):
    """The ontology serializes to JSON and back without semantic change:
    a graph built from config-loaded rules equals the code-rule graph."""
    import json

    from kgspark.ontology import DISEASE_RULES, INSURANCE_RULES, rule_to_dict, rules_from_config

    for ruleset in (DISEASE_RULES, INSURANCE_RULES):
        blob = json.dumps([rule_to_dict(r) for r in ruleset], ensure_ascii=False)
        assert rules_from_config(blob) == ruleset

    import pytest as _pytest

    with _pytest.raises(ValueError):
        rules_from_config([{"kind": "nope"}])
    with _pytest.raises(ValueError):
        rules_from_config([{"kind": "scalar", "bogus_field": 1}])
