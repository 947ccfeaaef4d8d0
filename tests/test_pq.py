"""Product quantization: bit-for-bit pure-Python replay of fit, encode,
and ADC top-k; zero-distance identity; determinism; validation."""

from __future__ import annotations

import hashlib
import math

import pytest

from kgspark.ops.pq import pq_encode, pq_fit, pq_topk

DIM, M, K, N_ITER, SCALE = 8, 4, 4, 2, 1000


def _vecs():
    # deterministic, clusterable: 4 loose groups in 8-dim
    out = []
    for i in range(40):
        g = i % 4
        out.append(
            (i, [((g * 13 + d * 3 + (i // 4)) % 11 - 5) / 10.0 for d in range(DIM)])
        )
    return out


def _hash60(salt, vid):
    return int(hashlib.md5(f"{salt}|{vid}".encode()).hexdigest()[:15], 16)


def _floor_div(s, n):
    return (s - ((s % n) + n) % n) // n


def _replay_fit(rows, m, k, n_iter, scale, salt="pq-init-v1"):
    q = {i: [math.floor(x * scale) for x in v] for i, v in rows}
    dim = len(next(iter(q.values())))
    dsub = dim // m
    seeds = sorted(q, key=lambda i: (_hash60(salt, i), i))[:k]
    books = [[q[i][s * dsub : (s + 1) * dsub] for i in seeds] for s in range(m)]

    def code(vq, s):
        sub = vq[s * dsub : (s + 1) * dsub]
        return min(
            range(len(books[s])),
            key=lambda j: (sum((a - b) ** 2 for a, b in zip(sub, books[s][j])), j),
        )

    for _ in range(n_iter):
        assign = {i: [code(vq, s) for s in range(m)] for i, vq in q.items()}
        for s in range(m):
            for j in range(k):
                members = [i for i in q if assign[i][s] == j]
                if not members:
                    continue
                for p in range(dsub):
                    tot = sum(q[i][s * dsub + p] for i in members)
                    books[s][j][p] = _floor_div(tot, len(members))
    return books, q


def _replay_encode(q, books):
    m, dsub = len(books), len(books[0][0])
    out = {}
    for i, vq in q.items():
        out[i] = [
            min(
                range(len(books[s])),
                key=lambda j: (
                    sum(
                        (vq[s * dsub + p] - books[s][j][p]) ** 2 for p in range(dsub)
                    ),
                    j,
                ),
            )
            for s in range(m)
        ]
    return out


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(_vecs(), ["vec_id", "embedding"])


def test_fit_encode_match_python_replay(spark, emb_df):
    books = pq_fit(emb_df, m=M, k=K, n_iter=N_ITER, scale=SCALE)
    want_books, q = _replay_fit(_vecs(), M, K, N_ITER, SCALE)
    assert books == want_books
    got_codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb_df, books, scale=SCALE).collect()
    }
    assert got_codes == _replay_encode(q, books)


def test_topk_matches_replay_and_identity(spark, emb_df):
    rows = _vecs()
    books = pq_fit(emb_df, m=M, k=K, n_iter=N_ITER, scale=SCALE)
    _, q = _replay_fit(rows, M, K, N_ITER, SCALE)
    codes = _replay_encode(q, books)
    query = rows[5][1]
    qq = [math.floor(x * SCALE) for x in query]
    dsub = DIM // M
    tables = [
        [
            sum((qq[s * dsub + p] - cent[p]) ** 2 for p in range(dsub))
            for cent in books[s]
        ]
        for s in range(M)
    ]
    scores = {
        i: sum(tables[s][codes[i][s]] for s in range(M)) for i in codes
    }
    want = sorted(scores.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    enc = pq_encode(emb_df, books, scale=SCALE)
    got = [
        (r["vec_id"], r["adc_dist_units"])
        for r in pq_topk(enc, books, query, topk=10, scale=SCALE).collect()
    ]
    assert got == want
    # the query's own vector scores its pure quantization error — it must
    # appear at (or tied with) the top
    assert got[0][1] <= scores[5]


def test_partitioning_invariant(spark, emb_df):
    a = pq_fit(emb_df.repartition(1), m=M, k=K, n_iter=N_ITER, scale=SCALE)
    b = pq_fit(emb_df.repartition(7), m=M, k=K, n_iter=N_ITER, scale=SCALE)
    assert a == b


def test_validation(spark, emb_df):
    with pytest.raises(ValueError, match="divisible"):
        pq_fit(emb_df, m=3)
    with pytest.raises(ValueError, match="m must"):
        pq_fit(emb_df, m=0)
    books = pq_fit(emb_df, m=M, k=2, n_iter=0, scale=SCALE)
    with pytest.raises(ValueError, match="query dim"):
        pq_topk(pq_encode(emb_df, books, scale=SCALE), books, [0.0] * 5)
    with pytest.raises(ValueError, match="topk"):
        pq_topk(pq_encode(emb_df, books, scale=SCALE), books, [0.0] * DIM, topk=0)
