"""corpus_report.py: the composition surface runs end-to-end and emits
one well-formed JSON line with consistent counts."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_corpus_report_end_to_end():
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "corpus_report.py"),
            "--input", "/root/testdata/sf0.001",
            "--cpus", "4",
            "--top-k", "3",
        ],
        capture_output=True, text=True, timeout=420,
        cwd="/tmp",
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root", "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    assert r["n_docs"] == 500
    assert r["n_tokens"] > 0
    assert sum(r["lang_mix"].values()) == r["n_docs"]
    assert sum(r["script_mix"].values()) == r["n_docs"]
    assert 0.0 <= r["mean_quality"] <= 1.0
    assert r["distinct_tokens_hll"] > 0
    assert len(r["top_keywords"]) == 3
    assert r["exact_dup_docs"] >= 0 and r["encoding_bad_docs"] >= 0
