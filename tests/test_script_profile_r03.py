"""Checks for ops/textstats.script_profile (Unicode-script composition).

Brute-force oracle counts characters by membership in the known-script
alphabets the Hypothesis strategy draws from — independent of both regex
engines. Example test pins mixed-script strings, the tie order, and the
'none' branch.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ITER_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

LATIN = "abcéÑ"
CYRILLIC = "мирЖд"
HAN = "世界汉字中"
ARABIC = "سلامع"
NEUTRAL = " 123.!"

char_st = st.sampled_from(LATIN + CYRILLIC + HAN + ARABIC + NEUTRAL)
text_st = st.lists(char_st, min_size=0, max_size=30).map("".join)


def _brute(text):
    n = {
        "n_latin": sum(c in LATIN for c in text),
        "n_cyrillic": sum(c in CYRILLIC for c in text),
        "n_han": sum(c in HAN for c in text),
        "n_arabic": sum(c in ARABIC for c in text),
        "n_chars": len(text),
    }
    m = max(n["n_latin"], n["n_cyrillic"], n["n_han"], n["n_arabic"])
    if m == 0:
        dom = "none"
    elif n["n_latin"] == m:
        dom = "latin"
    elif n["n_cyrillic"] == m:
        dom = "cyrillic"
    elif n["n_han"] == m:
        dom = "han"
    else:
        dom = "arabic"
    return (*n.values(), dom)


@ITER_SLOW
@given(texts=st.lists(text_st, min_size=1, max_size=8))
def test_script_profile_matches_bruteforce(spark, texts):
    from kgspark.ops.textstats import script_profile

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_latin"], r["n_cyrillic"], r["n_han"], r["n_arabic"],
            r["n_chars"], r["dominant_script"],
        )
        for r in script_profile(df).collect()
    }
    assert got == {i: _brute(t) for i, t in enumerate(texts)}


def test_script_profile_examples(spark):
    from kgspark.ops.textstats import script_profile

    rows = [
        (1, "Héllo Мир 世界 سلام"),  # latin-dominant mixed
        (2, "мир мир"),  # pure cyrillic
        (3, "123 .!?"),  # no scripted chars
        (4, "ab мм"),  # tie -> latin (priority order)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert (got[1]["n_latin"], got[1]["n_cyrillic"], got[1]["n_han"], got[1]["n_arabic"]) == (5, 3, 2, 4)
    assert got[1]["dominant_script"] == "latin"
    assert got[2]["dominant_script"] == "cyrillic"
    assert got[3]["dominant_script"] == "none" and got[3]["n_chars"] == 7
    assert got[4]["dominant_script"] == "latin"
