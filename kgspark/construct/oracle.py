"""Pure-Python (non-Spark) oracle for the structured KG build.

Replays the reference loader's *semantics* (MERGE-on-(label,name), SET +=
last-write-wins with null-deletes-key, FOREACH explodes, CONTAINS linking —
``neo4j_loader.py:62-284``) over the raw source files with plain dicts/sets.
Golden tests compare the Spark pipeline's nodes/edges/triples against this
at exact equality (BASELINE.md: 6,303 nodes / 4,970 edges on the reference
data; P/R >= 0.95 required, exact match expected).

Deliberately independent of the Spark code paths: a second implementation of
the same contract, not a shared helper.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path


def _merge_node(nodes: dict, label: str, name: str, props: dict | None = None) -> None:
    key = (label, name)
    if key not in nodes:
        nodes[key] = {}
    if props is not None:
        for k, v in props.items():
            if k == "name":
                continue
            if v is None:
                nodes[key].pop(k, None)  # Neo4j `+=` deletes null-valued keys
            else:
                nodes[key][k] = v


def replay(data_dir: str | Path) -> tuple[dict, set]:
    """Returns (nodes, edges): nodes[(label, name)] -> props dict;
    edges = {(subj_type, subj, rel, obj_type, obj)}."""
    d = Path(data_dir)
    nodes: dict = {}
    edges: set = set()

    # --- diseases ---------------------------------------------------------
    for item in json.loads((d / "Diseases" / "diseases.json").read_text("utf-8")):
        name = item.get("name")
        if name is None:
            continue
        props = {
            f: item.get(f)
            for f in [
                "icd_code", "intro", "get_prob", "easy_get", "get_way",
                "cause", "prevent", "nursing", "treat_detail",
            ]
        }
        _merge_node(nodes, "Disease", name, props)
        for s in item.get("symptom", []):
            _merge_node(nodes, "Symptom", s)
            edges.add(("Disease", name, "HAS_SYMPTOM", "Symptom", s))
        dept = (item.get("cure_dept") or "").strip()
        if dept:
            _merge_node(nodes, "Department", dept)
            edges.add(("Disease", name, "BELONGS_TO_DEPT", "Department", dept))
        for g in item.get("drug", []):
            _merge_node(nodes, "Drug", g)
            edges.add(("Disease", name, "TREATED_BY", "Drug", g))
        for n in item.get("neopathy", []):
            _merge_node(nodes, "Disease", n)
            edges.add(("Disease", name, "HAS_COMPLICATION", "Disease", n))

    # --- drugs ------------------------------------------------------------
    med = json.loads((d / "Drugs" / "medicine.json").read_text("utf-8"))
    for _sheet, content in med.items():
        for m in content.get("medicines", []):
            name = m.get("name")
            if name is None:
                continue
            _merge_node(
                nodes,
                "Drug",
                name,
                {
                    f: m.get(f)
                    for f in [
                        "category_code", "subcategory_name", "dosage",
                        "reimbursement_category",
                    ]
                },
            )

    # --- nursing homes ----------------------------------------------------
    with open(d / "NursingHomes" / "nursing_homes.csv", encoding="utf-8-sig") as f:
        for row in csv.DictReader(f):
            raw = row.get("名称")
            if not raw or not raw.strip():
                continue
            _merge_node(
                nodes,
                "NursingHome",
                raw.strip(),
                {
                    "city": row.get("城市"),
                    "nature": row.get("性质"),
                    "beds": row.get("床位"),
                    "price": row.get("价格(元/月)"),
                    "address": row.get("地址"),
                    "services": row.get("特色服务"),
                },
            )

    # --- insurance --------------------------------------------------------
    for item in json.loads((d / "Insurance" / "insurance_info.json").read_text("utf-8")):
        name = item.get("产品名称")
        if name is None:
            continue
        desc = item.get("产品描述", "")
        age = item.get("承保年龄")
        _merge_node(
            nodes,
            "Insurance",
            name,
            {
                "category": item.get("险种分类"),
                "company": item.get("承保公司"),
                "age_limit": age,
                "duration": item.get("保障期限"),
                "price_desc": item.get("价格"),
                "description": desc,
            },
        )
        if age is not None and ("老年" in age or "60" in age):
            _merge_node(nodes, "Population", "老年人")
            edges.add(("Insurance", name, "TARGETS_POPULATION", "Population", "老年人"))
        if desc is not None:
            for target, kws in [
                ("高血压", ["高血压"]),
                ("糖尿病", ["糖尿病"]),
                ("恶性肿瘤", ["癌症", "恶性肿瘤"]),
            ]:
                if any(k in desc for k in kws):
                    _merge_node(nodes, "Disease", target)
                    edges.add(("Insurance", name, "COVERS_DISEASE", "Disease", target))

    return nodes, edges


def precision_recall(predicted: set, golden: set) -> tuple[float, float]:
    if not predicted or not golden:
        return 0.0, 0.0
    tp = len(predicted & golden)
    return tp / len(predicted), tp / len(golden)
