"""Property-based checks for ops/curation.blocklist_filter (domain
blocklist gate with subdomain semantics) and its host_suffixes helper.

Hypothesis builds random hosts from a small label alphabet and random
blocklists; the Spark operator must equal a brute-force Python replay of
the contract: blocked iff the lowercased host equals a blocklist domain or
ends with '.' + domain. Example test pins the subdomain / exact / no-match
branches and partitioning invariance.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

ITER_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

label_st = st.sampled_from(["a", "b", "evil", "Good", "x"])
host_st = st.lists(label_st, min_size=1, max_size=4).map(".".join)
domain_st = st.lists(label_st, min_size=1, max_size=3).map(".".join)


def _brute_blocked(host, domains):
    h = host.lower()
    ds = {d.lower() for d in domains}
    return any(h == d or h.endswith("." + d) for d in ds)


@ITER_SLOW
@given(
    hosts=st.lists(host_st, min_size=1, max_size=10),
    domains=st.lists(domain_st, min_size=1, max_size=4),
)
def test_blocklist_matches_bruteforce(spark, hosts, domains):
    from kgspark.ops.curation import blocklist_filter

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "id int, host string"
    )
    bl = spark.createDataFrame([(d,) for d in domains], "domain string")
    got = {
        r["id"]: r["is_blocked"] for r in blocklist_filter(df, bl).collect()
    }
    assert got == {i: _brute_blocked(h, domains) for i, h in enumerate(hosts)}


def test_blocklist_examples_and_partitioning(spark):
    from kgspark.ops.curation import blocklist_filter, host_suffixes
    from pyspark.sql import functions as F

    # suffix helper: every dot-suffix, in order
    row = (
        spark.range(1)
        .select(host_suffixes(F.lit("a.b.example.com")).alias("s"))
        .first()
    )
    assert row["s"] == ["a.b.example.com", "b.example.com", "example.com", "com"]

    rows = [
        (1, "a.b.evil.com"),  # subdomain of evil.com -> blocked
        (2, "evil.com"),  # exact -> blocked
        (3, "notevil.com"),  # suffix-string but not dot-suffix -> kept
        (4, "EVIL.COM"),  # case-folded -> blocked
        (5, "good.org"),  # no match -> kept
    ]
    expected = {1: True, 2: True, 3: False, 4: True, 5: False}
    bl = spark.createDataFrame([("evil.com",), ("Blocked.net",)], "domain string")
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "id int, host string").repartition(parts)
        got = {r["id"]: r["is_blocked"] for r in blocklist_filter(df, bl).collect()}
        assert got == expected
