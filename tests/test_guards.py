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


def test_no_collect_outside_dimension_scale_allowlist():
    """Fail-closed: every kgspark module is a no-collect corpus module unless
    explicitly allowlisted here with the dimension-scale reason. A new module
    that drives data to the driver must justify itself in this table (VERDICT
    r04 finding 3: the old hand-pinned module list failed open)."""
    allowed = {
        "construct/graph.py": "snapshot pointer + lineage rows (bounded)",
        "extract/api.py": "user-facing .extract() result materialization",
        "extract/components.py": "CC convergence flag: 1-row aggregate",
        "extract/mentions.py": "alias dict broadcast: dictionary-scale",
        "ops/asof.py": "broadcast tier is row-count guarded",
        "ops/bpe.py": "driver-local merge loop gated by max_local_vocab",
        "ops/curation.py": "Bloom 128KB registers / DSIR literal log-ratio table",
        "ops/dedup.py": "LSH band-count fixpoint: 1-row aggregates",
        "ops/kg_sampling.py": "entity/relation vocab: dimension-scale",
        "ops/kmeans.py": "k centroids per Lloyd round: k x dim floats",
        "ops/pq.py": "codebooks + query distance tables: constant-size",
        "ops/similarity.py": "IVF centroids: dimension-scale",
        "pipeline.py": "lineage/metrics rows: one per partition-batch",
        "query/cards.py": "top-k card rendering: query-result scale",
        "query/rag.py": "retrieval results: query-result scale",
        "query/subgraph.py": "BFS frontier convergence: 1-row counts",
    }
    offenders = []
    for path, src in _sources():
        rel = str(path.relative_to(PKG)).replace("\\", "/")
        if ".collect()" in src or ".toPandas()" in src:
            if rel not in allowed:
                offenders.append(rel)
    assert not offenders, (
        f"collect()/toPandas() in non-allowlisted modules {offenders}: either "
        "remove the driver-side materialization or add the module here with "
        "its dimension-scale justification"
    )
    stale = [m for m in allowed if not (PKG / m).exists()]
    assert not stale, f"allowlist entries for missing modules: {stale}"
