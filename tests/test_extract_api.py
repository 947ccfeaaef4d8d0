"""X2 facade: the reference's EntityExtractor interface, working."""

from __future__ import annotations

from kgspark.extract.api import EntityExtractor


def test_extract_entities_and_batch():
    ex = EntityExtractor({"高血压": ("Disease", "高血压"), "阿司匹林": ("Drug", "阿司匹林")})
    ents = ex.extract_entities("高血压患者可服用阿司匹林。")
    kinds = {(e["type"], e["name"]) for e in ents}
    assert kinds == {("Disease", "高血压"), ("Drug", "阿司匹林")}
    spans = {e["surface"]: e["span"] for e in ents}
    assert spans["高血压"] == (0, 3)
    batch = ex.extract_entities_batch(["高血压。", "无实体。"])
    assert len(batch[0]) == 1 and batch[1] == []


def test_extract_triples_from_text():
    ex = EntityExtractor()
    got = ex.extract_triples_from_text("高血压的常见症状包括头痛。")
    assert got == [("高血压", "HAS_SYMPTOM", "头痛")]


def test_extract_triples_from_records(spark):
    ex = EntityExtractor()
    records = [
        {"name": "肺炎", "symptom": ["发热", "咳嗽"], "dept": "呼吸内科"},
        {"name": "胃炎", "symptom": [], "dept": ""},
    ]
    schema = {
        "symptom": ("Disease", "HAS_SYMPTOM", "Symptom"),
        "dept": ("Disease", "BELONGS_TO_DEPT", "Department"),
    }
    got = set(ex.extract_triples_from_records(records, schema, spark=spark))
    assert got == {
        ("肺炎", "HAS_SYMPTOM", "发热"),
        ("肺炎", "HAS_SYMPTOM", "咳嗽"),
        ("肺炎", "BELONGS_TO_DEPT", "呼吸内科"),
    }
