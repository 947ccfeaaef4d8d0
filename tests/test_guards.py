"""Static guards from BASELINE.md: no per-row Python UDFs anywhere; no code
copied verbatim from the reference tree."""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).parent.parent / "kgspark"


def _sources() -> list[tuple[Path, str]]:
    return [(p, p.read_text("utf-8")) for p in PKG.rglob("*.py")]


def test_no_row_at_a_time_udfs():
    """input_hint: vectorized pandas/Arrow UDFs only — no F.udf registrations."""
    bad = []
    for path, src in _sources():
        if re.search(r"\bF\.udf\(|\budf\(\s*lambda|@udf\b|spark\.udf\.register", src):
            bad.append(str(path))
    assert not bad, f"row-at-a-time UDFs found in: {bad}"


def test_no_rdd_usage_in_data_plane():
    bad = []
    for path, src in _sources():
        if re.search(r"\.rdd\b|sparkContext\.parallelize", src):
            bad.append(str(path))
    assert not bad, f"RDD usage found in: {bad}"


def test_no_collect_in_corpus_operators():
    """collect() is allowed only on dimension-scale data (alias dicts, query
    results, lineage); corpus-path modules must not collect."""
    corpus_modules = [
        "extract/openie.py",
        "extract/html.py",
        "extract/cooccur.py",
        "ops/textstats.py",
        "ops/textrank.py",
        "ops/rake.py",
        "ops/behavior.py",
        "ops/wl.py",
    ]
    for m in corpus_modules:
        src = (PKG / m).read_text("utf-8")
        assert ".collect()" not in src, f"collect() in corpus module {m}"
