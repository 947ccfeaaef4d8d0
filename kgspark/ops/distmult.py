"""DistMult KG embeddings (Yang et al., ICLR 2015) as pure DataFrame
algebra — the bilinear-diagonal complement to ops/transe.py.

Why a second model: TransE's additive geometry cannot represent symmetric
relations (f(s,r,o) = f(o,r,s) forces r = 0); DistMult's multiplicative
score ``f(s,r,o) = sum_d e_s[d] * r_r[d] * e_o[d]`` handles them natively
(and is the stronger baseline on relation-heavy KBs), at the cost of
anti-symmetric ones — which is why real systems train both and ensemble.
Higher score = more plausible (the hinge flips sign vs TransE's energy).

Same determinism contract as transe.py, extended to cubic terms: all
arithmetic is bigint fixed-point, and every floor-division is STAGED so
no intermediate exceeds 2^53 (the _fdiv exactness bound) —

- score term per dim: ``fdiv(fdiv(e_s*r_r, scale) * e_o, scale)``
- gradient steps: ``fdiv(fdiv(x*lr_units, scale) * y, scale)``

The staged form is the pinned spec (NOT equal to a single division by
scale^2 in general); the DuckDB oracle replays the same staging, so the
trained vectors hash-match bit for bit. The cubic magnitude guard is
tighter than TransE's quadratic one: |v| must stay under ~2*10^7 units
(B^2/scale * B < 2^53), enforced at init with the same 6x drift
allowance. As with transe.py this fixed-point mode is the deterministic/
testable tier; production-scale training would run a float path fed by
the same deterministic batches.

Plan shape per epoch: identical to transe_train — 4 embedding equi-joins
(relations broadcast, entities on the bucketed-node key), row-local JVM
array algebra, gradient accumulation as exploded (id, dim, g) rows with
map-side combine, one repack join, localCheckpoint lineage cut. No
driver-side loop over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kgspark.ops.kg_sampling import negative_samples
from kgspark.ops.transe import _fdiv, init_embeddings


def distmult_score(
    triples: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame,
    scale: int = 1_000_000,
    src: str = "src_id",
    rel: str = "rel",
    dst: str = "dst_id",
) -> DataFrame:
    """Fixed-point DistMult plausibility per triple: input rows +
    ``score_units`` = sum_d fdiv(fdiv(e_s*r_r, scale) * e_o, scale).
    HIGHER = more plausible (rank candidates descending)."""
    es = ent_emb.select(F.col(ent_emb.columns[0]).alias(src), F.col("vec").alias("_es"))
    eo = ent_emb.select(F.col(ent_emb.columns[0]).alias(dst), F.col("vec").alias("_eo"))
    rr = rel_emb.select(F.col(rel_emb.columns[0]).alias(rel), F.col("vec").alias("_rr"))
    j = triples.join(es, src).join(eo, dst).join(F.broadcast(rr), rel)
    term = F.zip_with(
        F.zip_with("_es", "_rr", lambda a, b: _fdiv(a * b, scale)),
        "_eo",
        lambda t, c: _fdiv(t * c, scale),
    )
    score = F.aggregate(term, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return j.select(*triples.columns, score.alias("score_units"))


def distmult_train(
    triples: DataFrame,
    dim: int = 8,
    epochs: int = 3,
    lr_units: int = 10_000,
    margin_units: int = 1_000_000,
    amp_units: int = 500_000,
    scale: int = 1_000_000,
    init_salt: str = "distmult-init-v1",
    neg_salt: str = "distmult-neg-v1",
    n_batches: int | None = None,
    src: str = "src_id",
    rel: str = "rel",
    dst: str = "dst_id",
) -> tuple[DataFrame, DataFrame]:
    """Full-batch fixed-point DistMult -> (entity_embeddings,
    relation_embeddings), each (id, vec array<bigint>) in 1/scale units.

    Per epoch, for every (positive, deterministic corruption) pair with
    ``margin_units + f(oneg) - f(o) > 0`` the hinge is descended with the
    staged-integer gradient steps (g below is SUBTRACTED, the transe
    update convention):

    - e_s:   g = fdiv(fdiv(r_r*lr, scale) * (e_on - e_o), scale)
    - r_r:   g = fdiv(fdiv(e_s*lr, scale) * (e_on - e_o), scale)
    - e_o:   g = -fdiv(fdiv(e_s*lr, scale) * r_r, scale)
    - e_on:  g = +fdiv(fdiv(e_s*lr, scale) * r_r, scale)
    """
    if amp_units * 6 >= 20_000_000:
        raise ValueError(
            "amp_units too large for the cubic integer arithmetic bound "
            "(|v| must stay under ~2e7 units)"
        )
    t = (
        triples.select(
            F.col(src).alias("s"), F.col(rel).alias("r"), F.col(dst).alias("o")
        )
        .distinct()
        .localCheckpoint()
    )
    ents = (
        t.select(F.col("s").alias("id")).union(t.select("o")).distinct().localCheckpoint()
    )
    rels = t.select(F.col("r").alias("id")).distinct().localCheckpoint()
    ent_emb = init_embeddings(ents, "id", dim, amp_units, init_salt).localCheckpoint()
    rel_emb = init_embeddings(rels, "id", dim, amp_units, init_salt).localCheckpoint()

    negs = negative_samples(
        t.select(
            F.col("s").alias("src_id"), F.col("r").alias("rel"), F.col("o").alias("dst_id")
        ),
        ents.select(F.col("id").alias("entity_id")),
        n_per_positive=1,
        salt=neg_salt,
        keep_positive=True,
    )
    pairs = negs.select(
        F.col("src_id").alias("s"),
        F.col("rel").alias("r"),
        F.col("dst_id").alias("o"),
        F.col("neg_dst_id").alias("oneg"),
    ).localCheckpoint()

    for ep in range(epochs):
        batch = pairs
        if n_batches:
            batch = pairs.filter(
                F.pmod(F.xxhash64("s", "r", "o"), F.lit(n_batches))
                == F.lit(ep % n_batches)
            )
        es = ent_emb.select(F.col("id").alias("s"), F.col("vec").alias("_es"))
        eo = ent_emb.select(F.col("id").alias("o"), F.col("vec").alias("_eo"))
        en = ent_emb.select(F.col("id").alias("oneg"), F.col("vec").alias("_en"))
        rr = rel_emb.select(F.col("id").alias("r"), F.col("vec").alias("_rr"))
        j = batch.join(es, "s").join(eo, "o").join(en, "oneg").join(F.broadcast(rr), "r")
        sr = F.zip_with("_es", "_rr", lambda a, b: _fdiv(a * b, scale))  # units
        score = lambda other: F.aggregate(  # noqa: E731 — row-local fold
            F.zip_with(sr, other, lambda t_, c: _fdiv(t_ * c, scale)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        active = j.filter(
            F.lit(margin_units) + score(F.col("_en")) - score(F.col("_eo")) > 0
        )
        diff = F.zip_with("_en", "_eo", lambda a, b: a - b)  # e_on - e_o
        staged = lambda base, mult: F.zip_with(  # noqa: E731
            F.transform(base, lambda x: _fdiv(x * F.lit(lr_units), scale)),
            mult,
            lambda a, b: _fdiv(a * b, scale),
        )
        grads = active.select(
            "s",
            "r",
            "o",
            "oneg",
            staged(F.col("_rr"), diff).alias("gs"),
            staged(F.col("_es"), diff).alias("gr"),
            staged(F.col("_es"), F.col("_rr")).alias("gor"),  # fdiv(fdiv(es*lr)/rr)
        )
        contrib_e = (
            grads.select(F.col("s").alias("id"), F.col("gs").alias("g"))
            .unionAll(
                grads.select(
                    F.col("o"), F.transform("gor", lambda x: -x).alias("g")
                )
            )
            .unionAll(grads.select(F.col("oneg"), F.col("gor")))
        )
        contrib_r = grads.select(F.col("r").alias("id"), F.col("gr").alias("g"))

        def _grads(contrib: DataFrame) -> DataFrame:
            return (
                contrib.select("id", F.posexplode("g").alias("d", "gv"))
                .groupBy("id", "d")
                .agg(F.sum("gv").alias("gv"))
            ).localCheckpoint()

        def _apply(emb: DataFrame, g: DataFrame) -> DataFrame:
            upd = (
                emb.select("id", F.posexplode("vec").alias("d", "v"))
                .join(g, ["id", "d"], "left")
                .select(
                    "id", "d", (F.col("v") - F.coalesce("gv", F.lit(0))).alias("v")
                )
            )
            packed = upd.groupBy("id").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "v"))), lambda s: s["v"]
                ).alias("vec")
            )
            return packed.localCheckpoint()

        ent_emb = _apply(ent_emb, _grads(contrib_e))
        rel_emb = _apply(rel_emb, _grads(contrib_r))
    return ent_emb, rel_emb
