"""Ontology signature checks: hand-built violations (wrong domain, wrong
range, unknown predicate, multi-signature predicate), sound-graph
emptiness, type-inference votes with ambiguity, and invariance."""

from __future__ import annotations

from kgspark.construct.typecheck import check_edge_types, infer_types

NODES = [
    (1, "Disease", "flu"),
    (2, "Drug", "aspirin"),
    (3, "Symptom", "fever"),
    (4, "Department", "er"),
]
EDGES = [
    (1, "TREATED_BY", 2),     # Disease -> Drug: ok
    (1, "HAS_SYMPTOM", 3),    # Disease -> Symptom: ok
    (2, "TREATED_BY", 2),     # Drug subject: domain violation
    (1, "TREATED_BY", 3),     # Symptom object: range violation
    (3, "LOCATED_IN", 4),     # no signature at all: unknown_rel
    (2, "USED_FOR", 1),       # multi-signature rel, allowed form A
    (3, "USED_FOR", 1),       # multi-signature rel, allowed form B
    (4, "USED_FOR", 1),       # multi-signature rel, neither form
]
SPEC = [
    ("TREATED_BY", "Disease", "Drug"),
    ("HAS_SYMPTOM", "Disease", "Symptom"),
    ("USED_FOR", "Drug", "Disease"),
    ("USED_FOR", "Symptom", "Disease"),
]


def _frames(spark):
    nodes = spark.createDataFrame(NODES, ["entity_id", "label", "name"])
    edges = spark.createDataFrame(EDGES, ["src_id", "rel", "dst_id"])
    return nodes, edges


def test_violations_found_and_categorised(spark):
    nodes, edges = _frames(spark)
    got = {
        (r["src"], r["rel"], r["dst"]): r["violation"]
        for r in check_edge_types(nodes, edges, SPEC).collect()
    }
    assert got == {
        (2, "TREATED_BY", 2): "signature",
        (1, "TREATED_BY", 3): "signature",
        (3, "LOCATED_IN", 4): "unknown_rel",
        (4, "USED_FOR", 1): "signature",
    }


def test_dangling_endpoints_are_reported_not_dropped(spark):
    nodes, _ = _frames(spark)
    edges = spark.createDataFrame(
        [
            (1, "TREATED_BY", 99),   # dst not in nodes
            (98, "TREATED_BY", 2),   # src not in nodes
            (97, "NO_SUCH_REL", 96), # both missing AND unknown rel:
            (1, "TREATED_BY", 2),    # unlabeled wins (can't type-check)
        ],
        ["src_id", "rel", "dst_id"],
    )
    rows = {
        (r["src"], r["dst"]): (r["violation"], r["src_label"], r["dst_label"])
        for r in check_edge_types(nodes, edges, SPEC).collect()
    }
    assert rows == {
        (1, 99): ("unlabeled_endpoint", "Disease", None),
        (98, 2): ("unlabeled_endpoint", None, "Drug"),
        (97, 96): ("unlabeled_endpoint", None, None),
    }


def test_sound_graph_is_empty(spark):
    nodes, edges = _frames(spark)
    ok_edges = edges.filter("NOT (src_id = 2 AND dst_id = 2) AND rel != 'LOCATED_IN' "
                            "AND NOT (rel = 'TREATED_BY' AND dst_id = 3) "
                            "AND NOT (src_id = 4)")
    assert check_edge_types(nodes, ok_edges, SPEC).count() == 0


def test_infer_types_votes_and_ambiguity(spark):
    _, edges = _frames(spark)
    got = {r["entity_id"]: r for r in infer_types(edges, SPEC).collect()}
    # node 1: TREATED_BY domain x2, HAS_SYMPTOM domain -> Disease 3 votes;
    # USED_FOR range x3 -> Disease 3 more. Unambiguous.
    assert got[1]["type"] == "Disease" and got[1]["votes"] == 6
    assert got[1]["n_values"] == 1 and got[1]["support_ppm"] == 1_000_000
    # node 2: TREATED_BY range x2 (Drug) + TREATED_BY domain (Disease)
    # + USED_FOR domain votes (Drug AND Symptom — multi-signature).
    assert got[2]["type"] == "Drug" and got[2]["votes"] == 3
    assert got[2]["total_votes"] == 5 and got[2]["n_values"] == 3
    # node 3: HAS_SYMPTOM range (Symptom) + TREATED_BY range (Drug)
    # + USED_FOR domain (Drug, Symptom): tie 2-2 -> 'Drug' lexicographic.
    assert got[3]["type"] == "Drug" and got[3]["votes"] == 2
    assert got[3]["total_votes"] == 4
    # node 4 only touches LOCATED_IN (no signature) and USED_FOR as subject
    assert got[4]["total_votes"] == 2  # Drug + Symptom domain votes


def test_partitioning_invariant(spark):
    nodes, edges = _frames(spark)
    a = sorted(map(tuple, check_edge_types(nodes, edges.repartition(7), SPEC).collect()))
    b = sorted(map(tuple, check_edge_types(nodes, edges.repartition(1), SPEC).collect()))
    assert a == b
    c = sorted(map(tuple, infer_types(edges.repartition(7), SPEC).collect()))
    d = sorted(map(tuple, infer_types(edges.repartition(1), SPEC).collect()))
    assert c == d
