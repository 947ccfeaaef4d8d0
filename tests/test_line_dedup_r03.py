"""Property-based checks for ops/curation.dedup_lines (cross-document
duplicated-line removal, the C4/RefinedWeb boilerplate-line step).

Same independent-oracle discipline as tests/test_r03_ops_fuzz.py: Hypothesis
builds random corpora from a small line pool (forcing cross-doc duplicates),
and the Spark operator must equal a direct brute-force Python replay of the
contract — eligibility by trimmed length, distinct-DOC counting (within-doc
repeats alone never trigger removal), original-order rejoin, '' when nothing
survives, NULL pass-through.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ITER_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# pool mixes eligible (>=5 trimmed chars) and ineligible lines, plus
# space-padding corners so trim-eligibility is exercised
_POOL = [
    "cookie banner accept",
    "licensed under terms",
    "  padded boilerplate  ",
    "nav bar",
    "hi",
    "",
    "x" * 5,
    "word",
]

docs_st = st.lists(
    st.one_of(
        st.none(),
        st.lists(st.sampled_from(_POOL), min_size=0, max_size=6),
    ),
    min_size=1,
    max_size=8,
)


def _brute(corpus, min_chars, min_docs):
    docs_per_line = {}
    for d, ls in corpus:
        if ls is None:
            continue
        for line in set(ls):
            if len(line.strip(" ")) >= min_chars:
                docs_per_line.setdefault(line, set()).add(d)
    common = {l for l, s in docs_per_line.items() if len(s) >= min_docs}
    out = {}
    for d, ls in corpus:
        if ls is None:
            out[d] = (None, 0)
        else:
            kept = [l for l in ls if l not in common]
            out[d] = ("\n".join(kept), len(ls) - len(kept))
    return out


@ITER_SLOW
@given(docs=docs_st, min_docs=st.integers(1, 3))
def test_dedup_lines_matches_bruteforce(spark, docs, min_docs):
    from kgspark.ops.curation import dedup_lines

    corpus = [(i, ls) for i, ls in enumerate(docs)]
    rows = [(d, None if ls is None else "\n".join(ls)) for d, ls in corpus]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["text_deduped"], r["lines_removed"])
        for r in dedup_lines(df, min_chars=5, min_docs=min_docs).collect()
    }
    assert got == _brute(corpus, 5, min_docs)


def test_dedup_lines_examples_and_partitioning(spark):
    from kgspark.ops.curation import dedup_lines

    rows = [
        (1, "shared boilerplate line\nunique one"),
        (2, "shared boilerplate line\nunique two"),
        (3, "shared boilerplate line\nshared boilerplate line"),  # all removed
        (4, "short\nrepeat me not\nrepeat me not"),  # within-doc only: kept
        (5, None),
    ]
    expected = {
        1: ("unique one", 1),
        2: ("unique two", 1),
        3: ("", 2),
        4: ("short\nrepeat me not\nrepeat me not", 0),
        5: (None, 0),
    }
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "doc_id int, text string").repartition(parts)
        got = {
            r["doc_id"]: (r["text_deduped"], r["lines_removed"])
            for r in dedup_lines(df, min_chars=10, min_docs=2).collect()
        }
        assert got == expected
