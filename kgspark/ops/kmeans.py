"""SemDeDup-style semantic dedup: fixed-point k-means over embeddings +
exact intra-cluster cosine near-dup pairs (Abbas et al. 2023).

The scale story: brute-force cosine dedup is O(n^2); SemDeDup's insight is
that a cheap k-means pass partitions the corpus so the quadratic step runs
only WITHIN clusters — with k sized so clusters hold ~10^3-10^4 docs, the
pair volume at 10^9 embeddings is n * cluster_size, not n^2. Everything
here follows that shape:

- ``kmeans_assign``: Lloyd iterations in integer fixed-point (embeddings
  quantized to ``floor(x * scale)`` — same determinism pattern as the
  integer PPR and TransE oracles, so the DuckDB replay is bit-exact and
  partitioning can't change the result). Per iteration: one JVM-only
  assignment pass (centroids inlined as literal arrays — k*dim ints,
  broadcast-by-construction, NO shuffle) and one ``(cluster, pos)``
  aggregation with map-side combine for the centroid update. The k*dim
  centroid collect per iteration is dimension-scale (k<=4096 guarded), the
  same inherent-sequential trade as float-PageRank's convergence check —
  the corpus-scale work stays distributed.
- ``semdedup_pairs``: self-join ON the cluster key (the only shuffle keys
  are (cluster,) and the ids), emitting (a, b, cluster) where integer
  cosine >= threshold: ``dot > 0 AND 10^6*dot^2 >= t^2*|a|^2*|b|^2`` with
  t in milli-units — division- and sqrt-free, exact in int64 for
  unit-norm embeddings at scale 1000 (|dot| <= 10^6 -> 10^6*dot^2 <= 10^18
  < 2^63).
- Skew valve: ``max_cluster_size`` caps each cluster's membership for the
  pairing step by deterministic md5 rank (the per-host-cap pattern), so a
  degenerate centroid can't recreate the n^2 blowup; the cap is audited in
  the returned plan, never silent.

Reference parity note: the reference repo has no embedding dedup at all —
this is part of the LLM-training-data tier the assignment adds on top
(SURVEY.md §2 extension list).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_H15 = 15  # 15 hex digits = 60 bits, exact in int64 (transe.py convention)
_MAX_CENTROID_CELLS = 4096 * 128  # k * dim guard for the per-iter collect


def _hash60(*cols: Column | str) -> Column:
    """Engine-portable 60-bit hash (md5 prefix as int) — identical in
    Spark (conv) and DuckDB (strpos expansion), cf. ops/transe.py:65."""
    return F.conv(F.substring(F.md5(F.concat_ws("|", *cols)), 1, _H15), 16, 10).cast(
        "long"
    )


def quantized(vec: Column, scale: int) -> Column:
    """float vector -> integer fixed-point vector: floor(x * scale).
    floor (not round) because round's tie rule differs across engines;
    floor is unambiguous everywhere."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
    )


def _sq_dist(q: Column, centroid: list[int]) -> Column:
    lit = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with(q, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    emb: DataFrame,
    k: int,
    n_iter: int = 3,
    scale: int = 1000,
    salt: str = "kmeans-init-v1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Integer-exact Lloyd k-means: returns (id, cluster) under the FINAL
    centroids (n_iter updates, then one assignment pass).

    Deterministic by construction: init picks the k ids with the smallest
    portable 60-bit hash (tie-break by id); assignment breaks distance
    ties toward the smaller cluster index; centroid updates use floor
    division on exact integer sums. Any partitioning, any engine, same
    answer — the DuckDB oracle in ``__spark_entry__`` replays it
    bit-for-bit.

    Plan per iteration: assignment is pure JVM expressions over literal
    centroid arrays (no join, no shuffle); the update is one
    posexplode -> groupBy(cluster, pos) with map-side combine; the k*dim
    centroid table is collected (dimension-scale, guarded) to become the
    next iteration's literals. ``localCheckpoint`` pins the quantized
    input so the corpus scans once per iteration, not once per lineage
    replay."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    q = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_id"), quantized(F.col(vec_col), scale).alias("_q"))
        .localCheckpoint(eager=True)
    )
    dim = q.select(F.size("_q").alias("d")).first()
    if dim is None:
        raise ValueError("kmeans_assign: empty input")
    dim = dim["d"]
    if k * dim > _MAX_CENTROID_CELLS:
        raise ValueError(
            f"k*dim = {k * dim} exceeds the centroid-collect guard "
            f"({_MAX_CENTROID_CELLS}); shard the fit or reduce k"
        )
    init_rows = (
        q.select("_id", "_q", _hash60(F.lit(salt), F.col("_id").cast("string")).alias("_h"))
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    centroids: list[list[int]] = [list(r["_q"]) for r in init_rows]

    def assign(cents: list[list[int]]) -> DataFrame:
        dists = F.array(
            *[
                F.struct(
                    _sq_dist(F.col("_q"), c).alias("d"), F.lit(j).alias("c")
                )
                for j, c in enumerate(cents)
            ]
        )
        return q.select("_id", "_q", F.array_min(dists)["c"].alias("cluster"))

    for _ in range(n_iter):
        a = assign(centroids)
        upd = (
            a.select("cluster", F.posexplode("_q").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep their centroid
        for r in upd:
            s, n = int(r["s"]), int(r["n"])
            new[r["cluster"]][r["pos"]] = (s - ((s % n) + n) % n) // n
        centroids = new
    return assign(centroids).select(
        F.col("_id").alias(id_col), "cluster"
    )


def semdedup_pairs(
    emb: DataFrame,
    k: int,
    n_iter: int = 3,
    threshold_milli: int = 950,
    scale: int = 1000,
    salt: str = "kmeans-init-v1",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Semantic near-duplicate pairs (a, b, cluster), a < b, where a and b
    landed in the same k-means cluster and their exact integer cosine is
    >= threshold_milli/1000. The cluster key bounds the self-join — pair
    volume is sum(cluster_size^2), not n^2; size k so clusters stay ~10^3
    at the target corpus. ``max_cluster_size`` (deterministic md5-rank
    truncation, the per-host-cap pattern) is the skew valve against a
    degenerate centroid swallowing the corpus."""
    if not 0 < threshold_milli <= 1000:
        raise ValueError(f"threshold_milli must be in (0, 1000], got {threshold_milli}")
    a = kmeans_assign(
        emb, k, n_iter=n_iter, scale=scale, salt=salt, id_col=id_col, vec_col=vec_col
    )
    q = emb.select(
        F.col(id_col).alias("_id"), quantized(F.col(vec_col), scale).alias("_q")
    )
    m = a.withColumnRenamed(id_col, "_id").join(q, "_id")
    if max_cluster_size is not None:
        w_rank = _hash60(F.lit(salt), F.lit("cap"), F.col("_id").cast("string"))
        from pyspark.sql import Window

        m = (
            m.withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("cluster").orderBy(w_rank, "_id")
                ),
            )
            .filter(F.col("_rk") <= max_cluster_size)
            .drop("_rk")
        )
    m = m.select(
        "cluster",
        F.col("_id"),
        "_q",
        F.aggregate(
            F.transform("_q", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("_n2"),
    )
    # Exactness guard: the predicate computes 10^6 * dot^2 and t^2 * n_a *
    # n_b in int64; both are bounded by 10^6 * max(_n2)^2, which stays
    # under 2^63 only while max(_n2) <= 3,036,952 (unit-norm vectors at
    # scale 1000 give _n2 ~ 10^6 — 3x headroom). Spark's non-ANSI long
    # arithmetic would WRAP silently past that, dropping true near-dups,
    # so refuse loudly instead (one narrow aggregate, far cheaper than the
    # self-join it protects).
    mx = m.agg(F.max("_n2").alias("m")).first()
    if mx is not None and mx["m"] is not None and int(mx["m"]) > 3_036_952:
        raise ValueError(
            f"semdedup_pairs: max squared norm {int(mx['m'])} overflows the "
            "int64 cosine predicate (bound 3,036,952) — lower `scale` or "
            "L2-normalize the embeddings first"
        )
    left = m.select(
        "cluster",
        F.col("_id").alias("a"),
        F.col("_q").alias("_qa"),
        F.col("_n2").alias("_na"),
    )
    right = m.select(
        "cluster",
        F.col("_id").alias("b"),
        F.col("_q").alias("_qb"),
        F.col("_n2").alias("_nb"),
    )
    dot = F.aggregate(
        F.zip_with("_qa", "_qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    t = int(threshold_milli)
    return (
        left.join(right, "cluster")
        .filter(F.col("a") < F.col("b"))
        .withColumn("_dot", dot)
        .filter(
            (F.col("_na") > 0)
            & (F.col("_nb") > 0)
            & (F.col("_dot") > 0)
            & (
                F.lit(1_000_000).cast("long") * F.col("_dot") * F.col("_dot")
                >= F.lit(t * t).cast("long") * F.col("_na") * F.col("_nb")
            )
        )
        .select("a", "b", "cluster")
    )
