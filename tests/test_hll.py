"""HyperLogLog: register-level Python replay, estimate replay, accuracy
sanity, merge = union sketch, small-range (linear counting) branch,
partitioning invariance, validation."""

from __future__ import annotations

import hashlib
import math

import pytest

from kgspark.ops.sketch import hll_estimate, hll_merge, hll_sketch

P = 6
M = 2**P
B = 60 - P


def _registers(values):
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx, rest = h // 2**B, h % 2**B
        rank = B + 1 if rest == 0 else B - rest.bit_length() + 1
        regs[idx] = max(regs.get(idx, 0), rank)
    return regs


def _estimate(regs):
    s = sum(2 ** (B - min(r, B)) for r in regs.values()) + (M - len(regs)) * 2**B
    alpha = 0.7213 / (1 + 1.079 / M)
    raw = alpha * M * M * float(2**B) / float(s)
    zeros = M - len(regs)
    if zeros > 0 and raw <= 2.5 * M:
        return math.floor(math.log(float(M) / float(zeros)) * M)
    return math.floor(raw)


@pytest.fixture(scope="module")
def grouped_df(spark):
    rows = [("big", f"v{i}") for i in range(500)] + [
        ("small", f"s{i % 7}") for i in range(100)
    ]
    return spark.createDataFrame(rows, ["g", "key"])


def test_registers_and_estimates_match_replay(spark, grouped_df):
    sk = hll_sketch(grouped_df, "key", ["g"], p=P)
    got = {}
    for r in sk.collect():
        got.setdefault(r["g"], {})[r["idx"]] = r["maxrank"]
    want_big = _registers([f"v{i}" for i in range(500)])
    want_small = _registers([f"s{i}" for i in range(7)])
    assert got["big"] == want_big
    assert got["small"] == want_small
    est = {r["g"]: r["est_distinct"] for r in hll_estimate(sk, ["g"], p=P).collect()}
    assert est["big"] == _estimate(want_big)
    assert est["small"] == _estimate(want_small)
    # accuracy sanity: ~1.04/sqrt(64) = 13% typical error
    assert abs(est["big"] - 500) / 500 < 0.3
    assert abs(est["small"] - 7) <= 3  # linear-counting regime


def test_merge_equals_union_sketch(spark, grouped_df):
    a = grouped_df.filter("key < 'v25'")
    b = grouped_df.filter("key >= 'v25'")
    merged = hll_merge(
        hll_sketch(a, "key", ["g"], p=P).unionByName(hll_sketch(b, "key", ["g"], p=P)),
        ["g"],
    )
    full = hll_sketch(grouped_df, "key", ["g"], p=P)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_partitioning_invariant_and_validation(spark, grouped_df):
    x = sorted(map(tuple, hll_sketch(grouped_df.repartition(1), "key", ["g"]).collect()))
    y = sorted(map(tuple, hll_sketch(grouped_df.repartition(13), "key", ["g"]).collect()))
    assert x == y
    with pytest.raises(ValueError, match="p must"):
        hll_sketch(grouped_df, "key", ["g"], p=3)


def test_p_mismatch_raises(spark, grouped_df):
    big = hll_sketch(grouped_df, "key", ["g"], p=10)
    with pytest.raises(Exception, match="larger p"):
        hll_estimate(big, ["g"], p=6).collect()
