"""Product quantization (PQ) for embedding similarity at 10^9+ scale:
train per-subspace codebooks, encode vectors to m small codes, answer
top-k by asymmetric distance computation (ADC) — Jegou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search" (TPAMI 2011).

The scale story completes the ANN ladder (ops/similarity.py brute-force
-> IVF buckets -> PQ): a 64-dim float vector is 256 bytes; its PQ code is
m integers (m=4-16), so the scan side of a query touches ~20-60x less
data and NEVER reads the original vectors — the codebook (m*k*dsub ints,
dimension-scale) plus one literal distance table per query replace them.
At 10^9 embeddings the encoded table is a few GB instead of a TB, and the
ADC pass is a pure JVM projection (no join, no shuffle) over it.

Determinism contract (the ops/kmeans.py discipline, shared literally —
same quantization, same portable md5 seed ranking, same
smaller-index tie-breaks, same floor-division centroid update): every
step is integer-exact, so codebooks, codes, and ADC scores are
bit-identical under any partitioning or engine, and the DuckDB oracle
replays fit + encode + query end to end.

Plan shapes:
- ``pq_fit``: per Lloyd iteration ONE corpus pass assigns all m subspace
  codes simultaneously (literal centroid arrays, JVM expressions only)
  and ONE posexplode -> HashAggregate keyed by (subspace, code, pos)
  with map-side combine updates every codebook cell; the k*dim collect
  per iteration is dimension-scale and guarded.
- ``pq_encode``: one JVM projection pass — no join, no shuffle.
- ``pq_topk``: the query's m distance tables are computed driver-side
  (m*k ints) and inlined as literals; the score is m element_at lookups
  + adds per row, then a top-k (TakeOrderedAndProject, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.ops.kmeans import _MAX_CENTROID_CELLS, _hash60, _sq_dist, quantized

Codebooks = list[list[list[int]]]  # [subspace][code][local dim]


def _validate(m: int, k: int, n_iter: int, scale: int) -> None:
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")


def _assign_codes(q: DataFrame, books: Codebooks, dsub: int) -> DataFrame:
    """(_id, _q) + literal codebooks -> (_id, _q, codes array<int>), the
    per-subspace argmin with ties toward the smaller code index — pure
    JVM expressions, no join, no shuffle."""
    code_cols = []
    for s, cents in enumerate(books):
        sub = F.slice(F.col("_q"), s * dsub + 1, dsub)
        dists = F.array(
            *[
                F.struct(_sq_dist(sub, c).alias("d"), F.lit(j).alias("c"))
                for j, c in enumerate(cents)
            ]
        )
        code_cols.append(F.array_min(dists)["c"])
    return q.select("_id", "_q", F.array(*code_cols).alias("codes"))


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    n_iter: int = 2,
    scale: int = 1000,
    salt: str = "pq-init-v1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Train PQ codebooks: m independent integer-exact Lloyd runs, one per
    dim/m-wide subspace, all m advanced together in one corpus pass per
    iteration. Seeds are the k ids with the smallest portable 60-bit hash
    (one ranking shared by every subspace); empty clusters keep their
    centroid. Returns ``books[s][j]`` = the j-th centroid of subspace s
    in fixed-point ints."""
    _validate(m, k, n_iter, scale)
    q = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_id"), quantized(F.col(vec_col), scale).alias("_q"))
        .localCheckpoint(eager=True)
    )
    row = q.select(F.size("_q").alias("d")).first()
    if row is None:
        raise ValueError("pq_fit: empty input")
    dim = row["d"]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if k * dim > _MAX_CENTROID_CELLS:
        raise ValueError(
            f"k*dim = {k * dim} exceeds the centroid-collect guard "
            f"({_MAX_CENTROID_CELLS}); reduce k or shard the fit"
        )
    dsub = dim // m
    seeds = (
        q.select("_id", "_q", _hash60(F.lit(salt), F.col("_id").cast("string")).alias("_h"))
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    books: Codebooks = [
        [list(r["_q"])[s * dsub : (s + 1) * dsub] for r in seeds] for s in range(m)
    ]
    for _ in range(n_iter):
        a = _assign_codes(q, books, dsub)
        upd = (
            a.select("codes", F.posexplode("_q").alias("pos", "v"))
            .withColumn("s", F.expr(f"pos div {dsub}").cast("int"))
            .withColumn("c", F.element_at("codes", F.col("s") + 1))
            .groupBy("s", "c", "pos")
            .agg(F.sum("v").alias("sum"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [[list(c) for c in book] for book in books]
        for r in upd:
            sm, n = int(r["sum"]), int(r["n"])
            new[r["s"]][r["c"]][r["pos"] - r["s"] * dsub] = (
                sm - ((sm % n) + n) % n
            ) // n
        books = new
    return books


def pq_encode(
    emb: DataFrame,
    books: Codebooks,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors against trained codebooks: (id, codes array<int>).
    One JVM projection pass — this is the artifact the ADC scan reads
    instead of the vectors."""
    dsub = len(books[0][0])
    q = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"), quantized(F.col(vec_col), scale).alias("_q")
    )
    return _assign_codes(q, books, dsub).select(
        F.col("_id").alias(id_col), "codes"
    )


def pq_topk(
    codes_df: DataFrame,
    books: Codebooks,
    query: list[float],
    topk: int = 10,
    scale: int = 1000,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """ADC top-k: quantize the query, precompute the m per-subspace
    distance tables driver-side (m*k ints), inline them as literals, and
    score every encoded row with m element_at lookups + adds — a pure
    projection over the code table, finished by a deterministic
    (distance, id) top-k. Returns (id, adc_dist_units)."""
    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    m, dsub = len(books), len(books[0][0])
    if len(query) != m * dsub:
        raise ValueError(f"query dim {len(query)} != codebook dim {m * dsub}")
    import math

    qq = [int(math.floor(x * scale)) for x in query]
    tables = [
        [
            sum((qq[s * dsub + i] - cent[i]) ** 2 for i in range(dsub))
            for cent in books[s]
        ]
        for s in range(m)
    ]
    score = None
    for s in range(m):
        tab = F.array(*[F.lit(int(v)).cast("long") for v in tables[s]])
        term = F.element_at(tab, F.element_at(F.col(codes_col), s + 1) + 1)
        score = term if score is None else score + term
    return (
        codes_df.select(F.col(id_col), score.alias("adc_dist_units"))
        .orderBy("adc_dist_units", id_col)
        .limit(topk)
    )
