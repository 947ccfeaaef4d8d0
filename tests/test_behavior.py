"""event_transitions: exact Python replay, per-user isolation,
tie-break determinism, NULL handling, min_count floor, invariance."""

from __future__ import annotations

from datetime import datetime

import pytest

from kgspark.ops.behavior import event_transitions

T0 = datetime(2024, 1, 1)


def _ts(m):
    return datetime(2024, 1, 1, 0, m)


ROWS = [
    # (event_id, ts, user_id, event_type)
    (0, _ts(0), 1, "view"),
    (1, _ts(1), 1, "view"),
    (2, _ts(2), 1, "buy"),
    (3, _ts(0), 2, "view"),
    (4, _ts(5), 2, "buy"),
    (5, _ts(6), 2, "view"),
    (6, _ts(0), None, "view"),   # NULL user: dropped
    (7, None, 1, "buy"),         # NULL ts: dropped
    (8, _ts(9), 1, None),        # NULL type: dropped
]


@pytest.fixture(scope="module")
def events_df(spark):
    return spark.createDataFrame(
        ROWS, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_matches_python_replay(spark, events_df):
    got = {
        (r["src_event"], r["dst_event"]): (
            r["n_transitions"], r["n_from_src"], r["p_ppm"]
        )
        for r in event_transitions(events_df).collect()
    }
    # user 1: view->view, view->buy; user 2: view->buy, buy->view
    assert got == {
        ("view", "view"): (1, 3, 333333),
        ("view", "buy"): (2, 3, 666666),
        ("buy", "view"): (1, 1, 1000000),
    }


def test_tiebreak_by_event_id(spark):
    same_ts = [(10, _ts(0), 9, "a"), (11, _ts(0), 9, "b"), (12, _ts(0), 9, "c")]
    df = spark.createDataFrame(
        same_ts, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r["src_event"], r["dst_event"]) for r in event_transitions(df).collect()
    }
    assert got == {("a", "b"), ("b", "c")}


def test_min_count_floor(spark, events_df):
    got = {
        (r["src_event"], r["dst_event"])
        for r in event_transitions(events_df, min_count=2).collect()
    }
    assert got == {("view", "buy")}


def test_no_cross_user_transitions(spark):
    df = spark.createDataFrame(
        [(0, _ts(0), 1, "a"), (1, _ts(1), 2, "b")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    assert event_transitions(df).count() == 0


def test_partitioning_invariance(spark, events_df):
    key = lambda r: (r["src_event"], r["dst_event"])  # noqa: E731
    a = sorted(event_transitions(events_df).collect(), key=key)
    b = sorted(event_transitions(events_df.repartition(7)).collect(), key=key)
    assert a == b


def test_validation(spark, events_df):
    with pytest.raises(ValueError, match="min_count"):
        event_transitions(events_df, min_count=0)
