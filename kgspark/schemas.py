"""Explicit StructTypes for every table the engine reads or writes.

The reference enforces no schemas (fields are hand-picked with ``.get()``
defaults, ``neo4j_loader.py:92-103``); here every source is read with a
declared schema so Catalyst can prune columns and push filters into the scan.
All node properties are strings, mirroring the reference's string-typed model
(SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Primary input: Common-Crawl-style web pages (BASELINE.json input_hint)
# ---------------------------------------------------------------------------
WEB_PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Structured reference sources (miniatures share these shapes; FIXTURES.md §2)
# ---------------------------------------------------------------------------
# diseases.json — JSON array; reference loader: neo4j_loader.py:84-117
DISEASES = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("icd_code", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("intro", T.StringType(), True),
        T.StructField("get_prob", T.StringType(), True),
        T.StructField("cure_dept", T.StringType(), True),
        T.StructField("easy_get", T.StringType(), True),
        T.StructField("get_way", T.StringType(), True),
        T.StructField("neopathy", T.ArrayType(T.StringType()), True),
        T.StructField("drug", T.ArrayType(T.StringType()), True),
        T.StructField("symptom", T.ArrayType(T.StringType()), True),
        T.StructField("cause", T.StringType(), True),
        T.StructField("prevent", T.StringType(), True),
        T.StructField("nursing", T.StringType(), True),
        T.StructField("treat_detail", T.StringType(), True),
    ]
)

# one flattened medicine record (after the nested sheet->medicines explode;
# reference nested shape handled in sources/structured.py; neo4j_loader.py:156-181)
MEDICINE = T.StructType(
    [
        T.StructField("sheet", T.StringType(), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("category_code", T.StringType(), True),
        T.StructField("category_name", T.StringType(), True),
        T.StructField("subcategory_code", T.StringType(), True),
        T.StructField("subcategory_name", T.StringType(), True),
        T.StructField("reimbursement_category", T.StringType(), True),
        T.StructField("dosage", T.StringType(), True),
        T.StructField("all_category_codes", T.ArrayType(T.StringType()), True),
    ]
)

# nursing_homes.csv — Chinese headers, UTF-8 BOM; neo4j_loader.py:188-215
NURSING_HOMES_RAW_COLUMNS = ["城市", "名称", "性质", "床位", "价格(元/月)", "特色服务", "地址"]

# insurance_info.json — Chinese keys; neo4j_loader.py:222-269
INSURANCE_RAW = T.StructType(
    [
        T.StructField("产品名称", T.StringType(), True),
        T.StructField("险种分类", T.StringType(), True),
        T.StructField("承保公司", T.StringType(), True),
        T.StructField("承保年龄", T.StringType(), True),
        T.StructField("保障期限", T.StringType(), True),
        T.StructField("产品描述", T.StringType(), True),
        T.StructField("价格", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Intermediate + output tables (FIXTURES.md §3)
# ---------------------------------------------------------------------------
# node-record IR: one row per MERGE+SET the reference would issue.
# ``seq`` is the global write sequence driving last-write-wins (SURVEY §1.3).
NODE_RECORDS = T.StructType(
    [
        T.StructField("label", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("seq", T.LongType(), False),
    ]
)

TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("subj_type", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("obj_type", T.StringType(), False),
    ]
)

NODES = T.StructType(
    [
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("src_id", T.LongType(), False),
        T.StructField("rel", T.StringType(), False),
        T.StructField("dst_id", T.LongType(), False),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("run_seq", T.LongType(), False),
        T.StructField("url_min", T.StringType(), True),
        T.StructField("url_max", T.StringType(), True),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_html_extracted", T.LongType(), False),
        T.StructField("n_triples", T.LongType(), False),
        T.StructField("n_preds", T.LongType(), False),
        T.StructField("n_subjects", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)

# extracted-triple rows carry provenance back to the source url
DOC_TRIPLES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("subj_type", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("obj_type", T.StringType(), False),
    ]
)


EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)
