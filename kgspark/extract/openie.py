"""X1: sentence-split + rule-based OpenIE triple extraction (mapInPandas).

The reference does this with one LLM call per document against a fixed
entity/relation schema (``text_graph_builder.py:23-69``). The rebuild is a
deterministic pattern extractor over the same schema family — the Spark-side
shape (1 document -> N triples, Arrow-batched, exploded downstream) is the
real deliverable; the extractor itself is a pluggable pure function.

``extract_triples_text`` is pinned: tests compare the Spark stage against
row-wise application of this exact function.

Pattern schema (entity types Disease/Symptom/Drug/Department/Insurance/
AgeRange; relations mirror the loader + IE prompt vocabulary):

  X的常见症状包括A、B。      -> (X, Disease, HAS_SYMPTOM, each, Symptom)
  X可并发Y。                 -> (X, Disease, HAS_COMPLICATION, Y, Disease)
  X的常用药物有A、B。        -> (X, Disease, TREATED_BY, each, Drug)
  X属于Y。                   -> (X, Disease, BELONGS_TO_DEPT, Y, Department)
  X承保年龄为Y。             -> (X, Insurance, ALLOWS_AGE, Y, AgeRange)
  X不承保Y。                 -> (X, Insurance, REFUSES_DISEASE, Y, Disease)
  X覆盖Y。                   -> (X, Insurance, COVERS, Y, Disease)
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from kgspark import schemas

_SENT_SPLIT = re.compile(r"[。！？；\n]+")
_LIST_SPLIT = re.compile(r"[、，,]+")

# (regex, subj_type, pred, obj_type, obj_is_list) — first match wins
_PATTERNS: list[tuple[re.Pattern, str, str, str, bool]] = [
    (re.compile(r"^(.+?)的常见症状包括(.+)$"), "Disease", "HAS_SYMPTOM", "Symptom", True),
    (re.compile(r"^(.+?)的常用药物有(.+)$"), "Disease", "TREATED_BY", "Drug", True),
    (re.compile(r"^(.+?)可并发(.+)$"), "Disease", "HAS_COMPLICATION", "Disease", False),
    (re.compile(r"^(.+?)属于(.+)$"), "Disease", "BELONGS_TO_DEPT", "Department", False),
    (re.compile(r"^(.+?)承保年龄为(.+)$"), "Insurance", "ALLOWS_AGE", "AgeRange", False),
    (re.compile(r"^(.+?)不承保(.+)$"), "Insurance", "REFUSES_DISEASE", "Disease", False),
    (re.compile(r"^(.+?)覆盖(.+)$"), "Insurance", "COVERS", "Disease", False),
]


def extract_triples_text(text: str | None) -> list[tuple[str, str, str, str, str]]:
    """Pinned extractor: text -> [(subj, subj_type, pred, obj, obj_type)]."""
    if not text:
        return []
    out: list[tuple[str, str, str, str, str]] = []
    for sent in _SENT_SPLIT.split(text):
        sent = sent.strip()
        if not sent:
            continue
        for pat, subj_t, pred, obj_t, is_list in _PATTERNS:
            m = pat.match(sent)
            if not m:
                continue
            subj = m.group(1).strip()
            tails = _LIST_SPLIT.split(m.group(2)) if is_list else [m.group(2)]
            for tail in tails:
                tail = tail.strip()
                if subj and tail:
                    out.append((subj, subj_t, pred, tail, obj_t))
            break  # first matching pattern wins per sentence
    return out


# NOTE(perf, measured): a pandas-"vectorized" variant of this batch loop
# (str.split/str.extract over an exploded sentence frame) was tried and ran
# ~25% SLOWER at 16 cores (112k vs 141k docs/s) — pandas .str regex kernels
# loop in Python per element, so the frame machinery is pure overhead. The
# compiled-regex loop below is the fast shape for this extractor.
def extract_doc_triples(pages: DataFrame, fused_html: bool = False) -> DataFrame:
    """(url, text[, html], ...) -> DOC_TRIPLES rows via mapInPandas.

    Arrow batches in, flat triple batches out — the UDTF shape (1 row -> N
    rows) that ``F.explode`` can't express without first materializing an
    array column per document. Output partitioning inherits the input's
    url-partitioning, so per-bucket lineage counts stay partition-local.

    ``fused_html=True`` runs the pinned HTML->text extractor inside the SAME
    Python stage for rows whose text is null — one Arrow round-trip and one
    worker pass for the whole corpus instead of two chained Python stages
    (the per-url byte-identical contract is unchanged: it calls the identical
    pinned function).
    """
    if fused_html:
        from kgspark.extract.html import extract_text

        cols = pages.select("url", "text", "html")
    else:
        cols = pages.select("url", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            rows: list[tuple[str, str, str, str, str]] = []
            if fused_html:
                texts = [
                    t if t is not None else extract_text(None if h is None else bytes(h))
                    for t, h in zip(pdf["text"], pdf["html"])
                ]
            else:
                texts = pdf["text"]
            for url, text in zip(pdf["url"], texts):
                for t in extract_triples_text(text):
                    urls.append(url)
                    rows.append(t)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "subj": [r[0] for r in rows],
                    "subj_type": [r[1] for r in rows],
                    "pred": [r[2] for r in rows],
                    "obj": [r[3] for r in rows],
                    "obj_type": [r[4] for r in rows],
                }
            )

    return cols.mapInPandas(run, schema=schemas.DOC_TRIPLES)
