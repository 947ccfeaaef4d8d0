"""Deterministic synthetic fixtures (FIXTURES.md; seed-free closed forms).

Everything here is index-arithmetic deterministic — same input size -> same
bytes — so tests and the two-parallelism bench runs see identical data with
no RNG state to manage.

Two web-corpus generators with the SAME closed-form content per doc index:

- ``web_pages_pdf(n)``: pandas, driver-side — small n, carries closed-form
  expected triples for correctness tests.
- ``web_pages_df(spark, n)``: pure Column-expression generator via
  ``spark.range`` — distributed, JVM-side, used to synthesize bench corpora
  of arbitrary size without driver materialization. A unit test pins both
  generators equal at small n.
"""

from __future__ import annotations

import csv
import json
from datetime import datetime, timedelta
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark import schemas

# --- entity dictionaries (reference-world surface forms) --------------------
DISEASES = [
    "高血压", "糖尿病", "恶性肿瘤", "肺炎杆菌肺炎", "冠心病", "脑卒中", "哮喘",
    "慢性胃炎", "骨质疏松", "帕金森病", "阿尔茨海默病", "慢性肾病", "肝硬化",
    "类风湿关节炎", "抑郁症", "贫血", "甲状腺功能亢进", "痛风", "白内障",
    "青光眼", "心律失常", "肺气肿", "胆结石", "腰椎间盘突出",
]
SYMPTOMS = [
    "乏力", "恶心", "呼吸困难", "头痛", "发热", "咳嗽", "胸痛", "心悸", "眩晕",
    "食欲不振", "失眠", "关节疼痛", "视物模糊", "水肿", "腹痛", "腹泻", "便秘",
    "消瘦", "盗汗", "麻木", "耳鸣", "口渴", "尿频", "皮疹", "气短", "畏寒",
    "多汗", "咽痛", "鼻塞", "肌肉酸痛",
]
DRUGS = [
    "阿司匹林", "头孢氨苄胶囊", "盐酸左氧氟沙星胶囊", "二甲双胍", "阿莫西林",
    "布洛芬", "辛伐他汀", "氨氯地平", "缬沙坦", "奥美拉唑", "铝碳酸镁片",
    "胰岛素", "泼尼松", "甲氨蝶呤", "碳酸钙D3", "维生素B12", "左甲状腺素钠",
    "别嘌醇", "硝苯地平", "氯沙坦钾",
]
DEPTS = ["内科呼吸内科", "内科心内科", "内科消化内科", "外科骨外科", "神经内科", "内分泌科"]
INSURANCES = [
    "蓝医保·长期医疗险", "好医保·住院医疗", "金医保重疾险", "平安e生保",
    "众安尊享百万医疗", "长相安慢病保", "泰康全能保百万医疗", "安心防癌险",
    "乐享护理险", "惠民保·城市定制", "康宁终身重疾", "老年意外险",
]
AGE_RANGES = ["0-65周岁", "18-80周岁", "出生满30天-70周岁", "28天-60周岁", "50-85周岁", "16-75周岁"]
CITIES = ["北京", "上海", "广州", "成都", "杭州"]

_EPOCH = datetime(2024, 1, 1)


# ---------------------------------------------------------------------------
# Web-pages corpus
# ---------------------------------------------------------------------------
def _doc_sentences(i: int) -> list[str]:
    nd, ns, ng = len(DISEASES), len(SYMPTOMS), len(DRUGS)
    d = i % nd
    s1 = 0 if i % 10 < 4 else i % ns  # hot-key skew: 乏力-like fan-in
    s2 = (i * 7 + 3) % ns
    sents = [
        f"{DISEASES[d]}的常见症状包括{SYMPTOMS[s1]}、{SYMPTOMS[s2]}。",
        f"{DISEASES[d]}可并发{DISEASES[(d + 5) % nd]}。",
        f"{DISEASES[d]}的常用药物有{DRUGS[i % ng]}、{DRUGS[(i * 3 + 1) % ng]}。",
        f"{DISEASES[d]}属于{DEPTS[d % len(DEPTS)]}。",
    ]
    if i % 3 == 0:
        sents.append(
            f"{INSURANCES[i % len(INSURANCES)]}承保年龄为{AGE_RANGES[i % len(AGE_RANGES)]}。"
        )
    if i % 7 == 0:
        # alias-variant surface form every other hit -> exercises X7 merging
        suffix = "-重度" if i % 14 == 0 else ""
        sents.append(
            f"{INSURANCES[i % len(INSURANCES)]}不承保{DISEASES[(d + 1) % nd]}{suffix}。"
        )
    return sents


def expected_triples_for_doc(i: int) -> list[tuple[str, str, str, str, str]]:
    """Closed-form expected extractor output (independent of the extractor)."""
    nd, ns, ng = len(DISEASES), len(SYMPTOMS), len(DRUGS)
    d = i % nd
    s1 = 0 if i % 10 < 4 else i % ns
    s2 = (i * 7 + 3) % ns
    dis = DISEASES[d]
    out = [
        (dis, "Disease", "HAS_SYMPTOM", SYMPTOMS[s1], "Symptom"),
        (dis, "Disease", "HAS_SYMPTOM", SYMPTOMS[s2], "Symptom"),
        (dis, "Disease", "HAS_COMPLICATION", DISEASES[(d + 5) % nd], "Disease"),
        (dis, "Disease", "TREATED_BY", DRUGS[i % ng], "Drug"),
        (dis, "Disease", "TREATED_BY", DRUGS[(i * 3 + 1) % ng], "Drug"),
        (dis, "Disease", "BELONGS_TO_DEPT", DEPTS[d % len(DEPTS)], "Department"),
    ]
    if s1 == s2:
        out.remove((dis, "Disease", "HAS_SYMPTOM", SYMPTOMS[s2], "Symptom"))
    if i % ng == (i * 3 + 1) % ng:
        out.remove((dis, "Disease", "TREATED_BY", DRUGS[(i * 3 + 1) % ng], "Drug"))
    if i % 3 == 0:
        out.append(
            (INSURANCES[i % len(INSURANCES)], "Insurance", "ALLOWS_AGE",
             AGE_RANGES[i % len(AGE_RANGES)], "AgeRange")
        )
    if i % 7 == 0:
        suffix = "-重度" if i % 14 == 0 else ""
        out.append(
            (INSURANCES[i % len(INSURANCES)], "Insurance", "REFUSES_DISEASE",
             DISEASES[(d + 1) % nd] + suffix, "Disease")
        )
    return out


def _doc_html(i: int, sents: list[str]) -> bytes:
    body = "".join(f"<p>{s}</p>" for s in sents)
    # neither construct changes the extracted text, but they pin coverage:
    # every 13th doc carries a comment (handled natively by the fast
    # scanner), every 169th additionally a doctype (still delegates to the
    # reference parser — the fallback path stays corpus-exercised)
    comment = "<!-- 页脚模板 -->" if i % 13 == 0 else ""
    doctype = "<!DOCTYPE html>" if i % 169 == 0 else ""
    return (
        f"{doctype}<html><head><title>页面{i}</title><script>var x={i};</script></head>"
        f"<body><nav>首页 导航 登录</nav>{body}{comment}<footer>© example site</footer></body></html>"
    ).encode("utf-8")


def _doc_url(i: int) -> str:
    return f"https://site{i % 97}.example/page/{i}"


def web_pages_pdf(n: int, both_cols: bool = False) -> pd.DataFrame:
    """Driver-side corpus: columns (url, warc_ts, html, text, lang).

    Without ``both_cols``: docs i%5 in {0,1,2} carry pre-extracted text (html
    null); i%5 in {3,4} carry raw html (text null) — the extraction path.
    With ``both_cols``: both populated (byte-identical invariant tests).
    """
    rows = []
    langs = ["zh", "zh", "zh", "zh", "zh", "zh", "zh", "en", "es", "de"]
    for i in range(n):
        sents = _doc_sentences(i)
        text = "\n".join(sents)
        html = _doc_html(i, sents)
        if not both_cols:
            if i % 5 < 3:
                html = None
            else:
                text = None
        rows.append(
            {
                "url": _doc_url(i),
                "warc_ts": _EPOCH + timedelta(seconds=37 * i),
                "html": html,
                "text": text,
                "lang": langs[i % 10],
            }
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def web_pages_spark_small(spark: SparkSession, n: int, both_cols: bool = False) -> DataFrame:
    return spark.createDataFrame(web_pages_pdf(n, both_cols), schema=schemas.WEB_PAGES)


def _pick(arr: list[str], idx):
    """element_at over a literal array; idx is a 0-based Column."""
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (idx + 1).cast("int"))


def web_pages_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed generator: same closed form as ``web_pages_pdf`` (mixed
    text/html modes), built entirely from Column expressions over
    ``spark.range`` — scales to bench corpora without touching the driver."""
    nd, ns, ng = len(DISEASES), len(SYMPTOMS), len(DRUGS)
    ni, na = len(INSURANCES), len(AGE_RANGES)
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    d = i % nd
    s1 = F.when(i % 10 < 4, F.lit(0)).otherwise(i % ns)
    s2 = (i * 7 + 3) % ns
    dis = _pick(DISEASES, d)
    sent_a = F.concat(dis, F.lit("的常见症状包括"), _pick(SYMPTOMS, s1), F.lit("、"), _pick(SYMPTOMS, s2), F.lit("。"))
    sent_b = F.concat(dis, F.lit("可并发"), _pick(DISEASES, (d + 5) % nd), F.lit("。"))
    sent_c = F.concat(dis, F.lit("的常用药物有"), _pick(DRUGS, i % ng), F.lit("、"), _pick(DRUGS, (i * 3 + 1) % ng), F.lit("。"))
    sent_d = F.concat(dis, F.lit("属于"), _pick(DEPTS, d % len(DEPTS)), F.lit("。"))
    ins = _pick(INSURANCES, i % ni)
    sent_e = F.when(i % 3 == 0, F.concat(ins, F.lit("承保年龄为"), _pick(AGE_RANGES, i % na), F.lit("。")))
    suffix = F.when(i % 14 == 0, F.lit("-重度")).otherwise(F.lit(""))
    sent_f = F.when(i % 7 == 0, F.concat(ins, F.lit("不承保"), _pick(DISEASES, (d + 1) % nd), suffix, F.lit("。")))
    text = F.concat_ws("\n", sent_a, sent_b, sent_c, sent_d, sent_e, sent_f)
    html = F.encode(
        F.concat(
            F.when(i % 169 == 0, F.lit("<!DOCTYPE html>")).otherwise(F.lit("")),
            F.format_string("<html><head><title>页面%d</title><script>var x=%d;</script></head><body><nav>首页 导航 登录</nav>", i, i),
            F.concat_ws(
                "",
                F.concat(F.lit("<p>"), sent_a, F.lit("</p>")),
                F.concat(F.lit("<p>"), sent_b, F.lit("</p>")),
                F.concat(F.lit("<p>"), sent_c, F.lit("</p>")),
                F.concat(F.lit("<p>"), sent_d, F.lit("</p>")),
                F.when(sent_e.isNotNull(), F.concat(F.lit("<p>"), sent_e, F.lit("</p>"))),
                F.when(sent_f.isNotNull(), F.concat(F.lit("<p>"), sent_f, F.lit("</p>"))),
            ),
            F.when(i % 13 == 0, F.lit("<!-- 页脚模板 -->")).otherwise(F.lit("")),
            F.lit("<footer>© example site</footer></body></html>"),
        ),
        "UTF-8",
    )
    langs = ["zh", "zh", "zh", "zh", "zh", "zh", "zh", "en", "es", "de"]
    return df.select(
        F.format_string("https://site%d.example/page/%d", (i % 97), i).alias("url"),
        (F.lit(_EPOCH) + F.make_interval(secs=i * 37)).alias("warc_ts"),
        F.when(i % 5 >= 3, html).alias("html"),
        F.when(i % 5 < 3, text).alias("text"),
        _pick(langs, i % 10).alias("lang"),
    )


# ---------------------------------------------------------------------------
# Structured-source miniature (reference-shaped, with every quirk)
# ---------------------------------------------------------------------------
def write_structured_miniature(root: str | Path) -> Path:
    """Writes Diseases/Drugs/NursingHomes/Insurance miniatures under ``root``
    with the reference layout and quirks (FIXTURES.md §2): duplicate names,
    ~90% stub drug/complication references, blank CSV names, the '60'
    substring trap, keyword-bearing descriptions."""
    root = Path(root)
    nd, ns, ng = len(DISEASES), len(SYMPTOMS), len(DRUGS)

    diseases = []
    for i in range(12):
        name = DISEASES[i % 10] if i != 11 else DISEASES[0]  # dup: record 11 re-writes DISEASES[0]
        diseases.append(
            {
                "id": str(i + 1),
                "icd_code": f"J{i:02d}.{i % 10}",
                "name": name,
                "intro": f"{name}的介绍，第{i}版。" if i != 11 else None,  # null -> += deletes key
                "get_prob": f"0.000{i}%",
                "cure_dept": "" if i == 3 else DEPTS[i % len(DEPTS)],
                "easy_get": "多见于老年人" if i % 2 == 0 else "多见于中年人",
                "get_way": "无传染性",
                "symptom": [SYMPTOMS[0], SYMPTOMS[(i * 3 + 1) % ns], SYMPTOMS[(i * 5 + 2) % ns]],
                # ~90% of drug refs are NOT in the medicine catalog (stubs)
                "drug": [DRUGS[i % ng] + ("特制" if i % 3 else ""), DRUGS[(i + 7) % ng] + "注射液"],
                # dangling complications (stub Disease nodes)
                "neopathy": [DISEASES[(i + 5) % nd], f"继发感染{i % 4}"],
                "cause": f"病因{i}",
                "prevent": f"预防{i}",
                "nursing": f"护理{i}",
                "treat_detail": f"治疗{i}",
            }
        )
    (root / "Diseases").mkdir(parents=True, exist_ok=True)
    (root / "Diseases" / "diseases.json").write_text(
        json.dumps(diseases, ensure_ascii=False, indent=1), "utf-8"
    )

    sheets: dict = {}
    mid = 0
    for sheet in ["西药部分", "中成药部分"]:
        meds = []
        for j in range(8):
            # overlap set: first two of sheet 1 match disease drug refs
            if sheet == "西药部分" and j < 2:
                name = DRUGS[j * 3 % ng]  # matches i%3==0 disease refs (no 特制 suffix)
            elif j == 7:
                name = DRUGS[0]  # cross-sheet duplicate
            else:
                name = DRUGS[(mid * 2 + 3) % ng] + ("片" if sheet == "西药部分" else "颗粒")
            meds.append(
                {
                    "id": f"{sheet}_{j}",
                    "name": name,
                    "sheet": sheet,
                    "reimbursement_category": "甲类" if j % 2 == 0 else "乙类",
                    "category_code": f"X{chr(65 + j % 4)}",
                    "category_name": f"类别{j % 4}",
                    "subcategory_code": f"X{chr(65 + j % 4)}0{j % 3}",
                    "subcategory_name": f"子类{j % 3}",
                    "all_category_codes": [f"X{chr(65 + j % 4)}", f"X{chr(65 + j % 4)}0{j % 3}"],
                    "dosage": "片剂" if j % 2 == 0 else "胶囊",
                }
            )
            mid += 1
        sheets[sheet] = {"categories": {}, "medicines": meds}
    (root / "Drugs").mkdir(parents=True, exist_ok=True)
    (root / "Drugs" / "medicine.json").write_text(
        json.dumps(sheets, ensure_ascii=False, indent=1), "utf-8"
    )

    (root / "NursingHomes").mkdir(parents=True, exist_ok=True)
    with open(root / "NursingHomes" / "nursing_homes.csv", "w", encoding="utf-8-sig", newline="") as f:
        w = csv.writer(f)
        w.writerow(["城市", "名称", "性质", "床位", "价格(元/月)", "特色服务", "地址"])
        for i in range(7):
            city = CITIES[i % len(CITIES)]
            name = f"{city}幸福养老院{i}" if i != 6 else f"{CITIES[0]}幸福养老院0"  # dup name
            w.writerow(
                [city, name, "民营" if i % 2 else "公建民营", f"{100 + i * 50}张",
                 str(3000 + i * 800), "医养结合,康复护理", f"{city}市幸福路{i}号"]
            )
        w.writerow([CITIES[1], "  ", "民营", "10张", "1000", "无", "无名路"])  # blank name -> dropped

    insurances = []
    for i in range(9):
        name = INSURANCES[i % 8] if i != 8 else INSURANCES[0]  # dup name
        if i == 0:
            age = "出生满30天-70周岁"
        elif i == 1:
            age = "适合老年人投保"      # '老年' -> TARGETS_POPULATION
        elif i == 2:
            age = "等待期160天"          # '60' substring trap -> links (bug-compatible)
        else:
            age = AGE_RANGES[i % len(AGE_RANGES)]
        descs = [
            "覆盖高血压等慢病人群",
            "糖尿病患者可投保",
            "癌症既往症可保",
            "含恶性肿瘤医疗保障",
            "百万医疗保障",
        ]
        insurances.append(
            {
                "产品名称": name,
                "险种分类": ["医疗险", "重疾险", "护理险"][i % 3],
                "承保公司": f"示例保险公司{i % 3}",
                "承保年龄": age,
                "保障期限": "1年" if i % 2 else "终身",
                "产品描述": descs[i % len(descs)],
                "价格": f"{10 + i}元/月起",
            }
        )
    (root / "Insurance").mkdir(parents=True, exist_ok=True)
    (root / "Insurance" / "insurance_info.json").write_text(
        json.dumps(insurances, ensure_ascii=False, indent=1), "utf-8"
    )
    return root
