"""DistMult: bit-for-bit pure-Python replay of the full fixed-point
training loop (init, corruption draw, staged cubic scores, hinge,
gradient updates), score symmetry, and partitioning invariance."""

from __future__ import annotations

import hashlib

import pytest

from kgspark.ops.distmult import distmult_score, distmult_train

EDGES = [
    ("a", "rel1", "b"), ("b", "rel1", "a"),
    ("a", "rel2", "c"), ("c", "rel2", "d"),
    ("d", "rel1", "b"),
]
DIM, EPOCHS, LR, MARGIN, AMP, SCALE = 4, 2, 10_000, 1_000_000, 500_000, 1_000_000


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _init(ids, salt="distmult-init-v1"):
    span = 2 * AMP + 1
    return {i: [_h60(f"{salt}|{i}|{d}") % span - AMP for d in range(DIM)] for i in ids}


def _replay():
    triples = sorted(set(EDGES))
    ents = sorted({x for s, _, o in triples for x in (s, o)})
    rels = sorted({r for _, r, _ in triples})
    e = _init(ents)
    r = _init(rels)
    true = set(triples)
    pairs = []
    for s, rl, o in triples:
        idx = _h60(f"distmult-neg-v1|{s}|{rl}|{o}|0") % len(ents)
        cand = ents[idx]
        if (s, rl, cand) not in true:
            pairs.append((s, rl, o, cand))

    def score(s, rl, o):
        return sum(
            ((e[s][d] * r[rl][d]) // SCALE * e[o][d]) // SCALE for d in range(DIM)
        )

    for _ in range(EPOCHS):
        ge = {i: [0] * DIM for i in ents}
        gr = {i: [0] * DIM for i in rels}
        for s, rl, o, on in pairs:
            if MARGIN + score(s, rl, on) - score(s, rl, o) <= 0:
                continue
            for d in range(DIM):
                diff = e[on][d] - e[o][d]
                ge[s][d] += (r[rl][d] * LR // SCALE) * diff // SCALE
                gr[rl][d] += (e[s][d] * LR // SCALE) * diff // SCALE
                gor = (e[s][d] * LR // SCALE) * r[rl][d] // SCALE
                ge[o][d] += -gor
                ge[on][d] += gor
        for i in ents:
            e[i] = [e[i][d] - ge[i][d] for d in range(DIM)]
        for i in rels:
            r[i] = [r[i][d] - gr[i][d] for d in range(DIM)]
    return e, r


@pytest.fixture(scope="module")
def triples_df(spark):
    return spark.createDataFrame(EDGES, ["src_id", "rel", "dst_id"])


def test_training_matches_python_replay(spark, triples_df):
    ent, rel = distmult_train(
        triples_df, dim=DIM, epochs=EPOCHS, lr_units=LR,
        margin_units=MARGIN, amp_units=AMP, scale=SCALE,
    )
    got_e = {r_["id"]: list(r_["vec"]) for r_ in ent.collect()}
    got_r = {r_["id"]: list(r_["vec"]) for r_ in rel.collect()}
    want_e, want_r = _replay()
    assert got_e == want_e
    assert got_r == want_r


def test_score_replay_and_near_symmetry(spark, triples_df):
    """Score matches the staged-integer Python replay exactly; and
    DistMult's defining property f(s,r,o) == f(o,r,s) holds up to the
    staged-floor error (each dim's fwd/rev terms differ by at most
    (|e_s|+|e_o|)/scale + 2 units — exact symmetry is a property of the
    real-valued model, not of any fixed-point staging)."""
    ent, rel = distmult_train(triples_df, dim=DIM, epochs=EPOCHS)
    e = {r_["id"]: list(r_["vec"]) for r_ in ent.collect()}
    r = {r_["id"]: list(r_["vec"]) for r_ in rel.collect()}

    def score(s, rl, o):
        return sum(
            ((e[s][d] * r[rl][d]) // SCALE * e[o][d]) // SCALE for d in range(DIM)
        )

    fwd = spark.createDataFrame([("a", "rel1", "b")], ["src_id", "rel", "dst_id"])
    rev = spark.createDataFrame([("b", "rel1", "a")], ["src_id", "rel", "dst_id"])
    sf = distmult_score(fwd, ent, rel).first()["score_units"]
    sr = distmult_score(rev, ent, rel).first()["score_units"]
    assert sf == score("a", "rel1", "b")
    assert sr == score("b", "rel1", "a")
    tol = DIM * (2 + (max(abs(v) for v in e["a"]) + max(abs(v) for v in e["b"])) // SCALE)
    assert abs(sf - sr) <= tol


def test_partitioning_invariant_and_guard(spark, triples_df):
    a, _ = distmult_train(triples_df.repartition(1), dim=DIM, epochs=1)
    b, _ = distmult_train(triples_df.repartition(5), dim=DIM, epochs=1)
    assert sorted((r["id"], list(r["vec"])) for r in a.collect()) == sorted(
        (r["id"], list(r["vec"])) for r in b.collect()
    )
    with pytest.raises(ValueError, match="cubic"):
        distmult_train(triples_df, amp_units=4_000_000)
