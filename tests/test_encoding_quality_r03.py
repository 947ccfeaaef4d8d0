"""Checks for ops/textstats.encoding_quality (mojibake / encoding-error
detection).

Brute-force oracle counts marker substrings with str.count — independent
of both regex engines (markers never overlap themselves or each other, so
non-overlapping regex counts equal str.count sums). Example test pins the
replacement char, digraph counting, the integer ppm, and both flag
branches.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ITER_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

piece_st = st.sampled_from(
    ["clean text ", "Ã©", "â€™", "Â°", "�", "x", " word words "]
)
text_st = st.lists(piece_st, min_size=0, max_size=12).map("".join)


def _brute(text, flag_ppm):
    from kgspark.ops.textstats import MOJIBAKE_MARKERS

    n_rep = text.count("�")
    n_moj = sum(text.count(m) for m in MOJIBAKE_MARKERS)
    n_chars = len(text)
    ppm = (n_rep + n_moj) * 1_000_000 // max(n_chars, 1)
    return (n_rep, n_moj, n_chars, ppm, int(ppm >= flag_ppm))


@ITER_SLOW
@given(texts=st.lists(text_st, min_size=1, max_size=8))
def test_encoding_quality_matches_bruteforce(spark, texts):
    from kgspark.ops.textstats import encoding_quality

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_replacement"], r["n_mojibake"], r["n_chars"],
            r["mojibake_ppm"], r["flag_encoding_bad"],
        )
        for r in encoding_quality(df).collect()
    }
    assert got == {i: _brute(t, 1000) for i, t in enumerate(texts)}


def test_encoding_quality_examples(spark):
    from kgspark.ops.textstats import encoding_quality

    rows = [
        (1, "cafÃ© naÃ¯ve â€™"),  # dense mojibake -> flagged
        (2, "perfectly clean prose " * 50),  # no markers -> unflagged
        (3, "one stray Ã© in " + "a long clean document " * 100),  # sparse -> unflagged
        (4, "bad�bytes"),  # replacement char counted separately
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in encoding_quality(df).collect()}
    assert got[1]["n_mojibake"] == 2 and got[1]["flag_encoding_bad"] == 1
    assert got[2]["n_mojibake"] == 0 and got[2]["flag_encoding_bad"] == 0
    assert got[3]["n_mojibake"] == 1 and got[3]["flag_encoding_bad"] == 0
    assert got[4]["n_replacement"] == 1 and got[4]["flag_encoding_bad"] == 1
