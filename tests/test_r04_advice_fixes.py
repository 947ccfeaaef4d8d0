"""Round-4 regression tests for the ADVICE.md code-review findings.

1. bm25_rank must bind query terms as literals (a quote-bearing term like
   "don't" is a legal whitespace token, not a SQL parse error / injection).
2. script_profile / encoding_quality must treat NULL text as empty
   ('none' / flag 0), not fall into the otherwise() branch ('arabic') or
   emit a NULL flag.
3. kcore(until_stable=True) must raise when the iteration cap stops
   peeling before fixpoint (a chain peels one node per round) instead of
   silently returning a non-k-core.
4. node2vec_walks must validate p_milli/q_milli (0 -> ZeroDivisionError,
   >1e6 -> weight floored to 0 kills walks silently) with a clear error.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# 1. bm25_rank literal binding
# ---------------------------------------------------------------------------
def test_bm25_quote_bearing_term_is_a_token_not_a_parse_error(spark):
    from kgspark.ops.textstats import bm25_rank

    d = _docs(
        spark,
        [
            (1, "don't stop the build"),
            (2, "stop the build now"),
            (3, "don't don't don't"),
        ],
    )
    got = {
        r["doc_id"]: r["n_matched_terms"]
        for r in bm25_rank(d, ["don't", "build"]).collect()
    }
    # doc 1 matches both terms, doc 2 only "build", doc 3 only "don't"
    assert got == {1: 2, 2: 1, 3: 1}


def test_bm25_hostile_term_scores_zero_matches_not_injection(spark):
    from kgspark.ops.textstats import bm25_rank

    d = _docs(spark, [(1, "plain text only"), (2, "more plain text")])
    hostile = "x', xxhash64(version()))--"
    out = bm25_rank(d, [hostile, "plain"])
    rows = out.collect()
    # the hostile string is just an unmatched term; "plain" matches both docs
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert all(r["n_matched_terms"] == 1 for r in rows)


# ---------------------------------------------------------------------------
# 2. NULL-text handling in script_profile / encoding_quality
# ---------------------------------------------------------------------------
def test_script_profile_null_text_is_none_not_arabic(spark):
    from kgspark.ops.textstats import script_profile

    d = _docs(spark, [(1, None), (2, "hello"), (3, "")])
    got = {r["doc_id"]: r.asDict() for r in script_profile(d).collect()}
    assert got[1]["dominant_script"] == "none"
    assert got[1]["n_latin"] == 0 and got[1]["n_chars"] == 0
    assert got[2]["dominant_script"] == "latin"
    assert got[3]["dominant_script"] == "none"


def test_encoding_quality_null_text_flag_is_zero_not_null(spark):
    from kgspark.ops.textstats import encoding_quality

    d = _docs(spark, [(1, None), (2, "cafÃ© " * 50), (3, "clean")])
    got = {r["doc_id"]: r.asDict() for r in encoding_quality(d).collect()}
    assert got[1]["flag_encoding_bad"] == 0
    assert got[1]["n_mojibake"] == 0 and got[1]["mojibake_ppm"] == 0
    assert got[2]["flag_encoding_bad"] == 1
    assert got[3]["flag_encoding_bad"] == 0


# ---------------------------------------------------------------------------
# 3. kcore iteration-cap detection
# ---------------------------------------------------------------------------
def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_kcore_raises_when_cap_stops_peeling_short_of_fixpoint(spark):
    from kgspark.ops.graph_algs import kcore

    # a 12-node path peels ~one endpoint pair per round at k=2; with
    # max_iter=2 peeling is still in flight -> must raise, not return a
    # subgraph containing degree-1 nodes
    chain = [(i, i + 1) for i in range(1, 12)]
    with pytest.raises(RuntimeError, match="fixpoint"):
        kcore(_edges(spark, chain), 2, max_iter=2).collect()


def test_kcore_converged_still_returns_and_fixed_mode_unchanged(spark):
    from kgspark.ops.graph_algs import kcore

    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    got = {(r["node"], r["degree"]) for r in kcore(e, 2).collect()}
    assert got == {(1, 2), (2, 2), (3, 2)}
    # until_stable=False keeps the no-driver-action fixed-round contract
    fixed = {(r["node"], r["degree"]) for r in kcore(e, 2, max_iter=6, until_stable=False).collect()}
    assert fixed == got


# ---------------------------------------------------------------------------
# 4. node2vec parameter validation
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("bad", [{"p_milli": 0}, {"q_milli": 0}, {"p_milli": 2_000_000}, {"q_milli": -5}])
def test_node2vec_rejects_out_of_range_millis(spark, bad):
    from kgspark.ops.graph_algs import node2vec_walks

    e = _edges(spark, [(1, 2), (2, 3)])
    with pytest.raises(ValueError, match="milli"):
        node2vec_walks(e, walk_length=2, **bad)


def test_node2vec_boundary_millis_keep_walks_alive(spark):
    from kgspark.ops.graph_algs import node2vec_walks

    # p = 1e6 floors the backtrack weight to 1 (not 0): a degree-1 node
    # whose only candidate is prev must still complete its walk
    e = _edges(spark, [(1, 2), (2, 1)])
    out = node2vec_walks(e, walk_length=3, p_milli=1_000_000, q_milli=1_000_000)
    steps = (
        out.groupBy("walk_id").agg(F.max("step").alias("m")).collect()
    )
    assert steps and all(r["m"] == 3 for r in steps)
