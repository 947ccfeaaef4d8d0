"""Property-based check of the core MERGE semantics (A1/A2).

Hypothesis generates arbitrary MERGE+SET record sequences (duplicate keys,
null props, null-valued keys, interleaved stub endpoints); the Spark
canonicalization must equal a direct Python replay of Neo4j's
``MERGE ... SET n += props`` contract.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from kgspark.construct.graph import canonicalize_nodes
from kgspark.schemas import NODE_RECORDS

LABELS = ["Disease", "Drug"]
NAMES = ["甲", "乙", "丙"]
KEYS = ["k1", "k2"]

record_st = st.tuples(
    st.sampled_from(LABELS),
    st.sampled_from(NAMES),
    st.one_of(
        st.none(),  # stub (MERGE without SET)
        st.dictionaries(
            st.sampled_from(KEYS),
            st.one_of(st.none(), st.text(alphabet="xyz", min_size=1, max_size=3)),
            max_size=2,
        ),
    ),
)


def python_replay(records):
    nodes: dict = {}
    for label, name, props in records:
        key = (label, name)
        nodes.setdefault(key, {})
        if props is not None:
            for k, v in props.items():
                if v is None:
                    nodes[key].pop(k, None)  # += deletes null-valued keys
                else:
                    nodes[key][k] = v
    return nodes


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(record_st, min_size=1, max_size=12))
def test_canonicalize_matches_merge_replay(sess, records):
    rows = [
        {"label": l, "name": n, "props": p, "seq": i}
        for i, (l, n, p) in enumerate(records)
    ]
    df = sess.createDataFrame(rows, schema=NODE_RECORDS)
    got = {
        (r["label"], r["name"]): dict(r["props"])
        for r in canonicalize_nodes(df).collect()
    }
    assert got == python_replay(records)
