"""Distinct-count sketches: KMV (k-minimum-values) cardinality estimation.

At 100 TB, "how many distinct entities/urls/tokens per group" is a constant
accounting need (corpus stats, join-size planning, dedup-rate dashboards).
Exact distinct is a full shuffle of the key set every time it's asked; a KMV
sketch is a fixed-size (k hashes) MERGEABLE summary: keep the k smallest
hash values of the set, estimate |S| ~= (k-1) / max_kept_fraction, and merge
two sketches by taking the k smallest of their union — so per-partition /
per-day sketches stored once (e.g. alongside the lineage rows,
pipeline.py) answer cardinality questions later WITHOUT rescanning data.
Standard error is ~1/sqrt(k-2) (Beyer et al., "On Synopses for Distinct-
Value Estimation Under Multiset Operations", SIGMOD'07).

Engine-portable by construction, like the portable MinHash/SimHash variants
(__spark_entry__.py): value -> lowercase-hex md5 (identical in Spark and
DuckDB; hex-string order == numeric order), and the estimator numerics use
only the first 13 hex digits = 52 bits, exactly representable in an IEEE
double, so Spark and the DuckDB oracle produce bit-identical estimates.

The reference has no sketches (SURVEY §2.5: "no distinct-count sketches");
this is part of the training-data-pipeline operator set the engine adds.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_DIGITS = "0123456789abcdef"
_PREFIX_LEN = 13  # 13 hex digits = 52 bits: exact in double, in both engines


def _hex_fraction(col: Column) -> Column:
    """Lowercase-hex md5 string -> its value as a fraction of the hash space,
    using only the first 13 digits (bit-identical across engines: integer-
    valued doubles up to 2^52, one exact division)."""
    num = reduce(
        lambda acc, j: acc
        + (F.instr(F.lit(_HEX_DIGITS), F.substring(col, j + 1, 1)) - 1)
        * F.lit(float(16 ** (_PREFIX_LEN - 1 - j))),
        range(_PREFIX_LEN),
        F.lit(0.0),
    )
    return num / F.lit(float(16**_PREFIX_LEN))


def kmv_sketch(
    df: DataFrame, value_col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Per-group KMV sketch: the k smallest md5 hashes of the distinct values.

    Output: group_cols + ``sketch array<string>`` (sorted ascending, len <= k).

    Plan shape: hash-distinct of (group, hash) — two-phase aggregate, the
    same shuffle an exact distinct would pay on first build — then a
    row_number window keeps the k minima per group. The payoff is afterward:
    the sketch is a <= k-row summary that merges (kmv_merge) and estimates
    (kmv_estimate) with no further scans of the source.
    """
    h = F.md5(F.col(value_col).cast("string")).alias("h")
    dist = df.select(*group_cols, h).where(F.col(value_col).isNotNull()).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("h")).alias("sketch"))
    )


def kmv_merge(sketches: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Merge partial sketches (e.g. per-partition or per-day) by group: the
    k smallest of the union of kept hashes. KMV's closure property makes
    this EXACTLY the sketch of the union of the underlying sets — verified
    by test against a whole-corpus sketch."""
    return (
        sketches.select(*group_cols, F.explode("sketch").alias("h"))
        .distinct()
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("sketch"))
    )


def kmv_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Sketch -> ``est_distinct`` (bigint). Exact when the set had < k
    distinct values (the sketch IS the distinct hash set); else the KMV
    estimator (k-1)/fraction(kth smallest hash)."""
    n_kept = F.size("sketch")
    kth_frac = _hex_fraction(F.element_at("sketch", k))
    est = F.when(n_kept < k, n_kept.cast("bigint")).otherwise(
        F.floor(F.lit(float(k - 1)) / kth_frac).cast("bigint")
    )
    return sketches.withColumn("est_distinct", est)


def kmv_distinct(
    df: DataFrame, value_col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """One-shot per-group approximate distinct count: group_cols +
    ``est_distinct``. Deterministic (hash-based, no RNG) and engine-portable
    — the DuckDB oracle reproduces it bit-for-bit (queries `kmv_distinct`)."""
    return kmv_estimate(kmv_sketch(df, value_col, group_cols, k), k).drop("sketch")


# --- Count-min sketch: mergeable frequency estimation ----------------------


def _cm_pos(value: Column, j: int, width: int, salt: str) -> Column:
    """Row-j counter position for a value: 15 hex digits of a salted md5
    (60 bits, exact in bigint — the kg_sampling.negative_samples
    technique) mod width. Engine-portable: DuckDB replays it with a
    strpos digit expansion."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(salt), value.cast("string"), F.lit(str(j)))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cm_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 3,
    width: int = 1024,
    weight_col: str | None = None,
    salt: str = "cm-v1",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a key column:
    a depth x width grid of bigint counters, returned as rows
    ``(j, pos, cnt)`` — at most depth*width of them, whatever the input
    size. The frequency-estimation sibling of the KMV cardinality sketch:
    per-shard / per-day sketches stored with the lineage rows answer
    "how often did this key occur" later WITHOUT rescanning, merge by
    counter addition (:func:`cm_merge`), and estimates never undercount
    (:func:`cm_query` takes the min over rows, each an overestimate).

    The skew-diagnosis use: sketch yesterday's join keys, point-query
    today's candidates, and keys whose estimate clears a salting
    threshold get routed to the skew path (ops/skew.py) — the sketch is
    the cheap standing artifact, detect_hot_keys the exact one-shot.

    Plan: one generated-column explode (depth rows per input row) into a
    HashAggregate keyed by (j, pos) — map-side combine collapses each
    task's output to <= depth*width rows before the exchange, so shuffle
    volume is bounded by parallelism * depth * width regardless of corpus
    size. Weights (``weight_col``, bigint) make it a weighted-frequency
    sketch; everything is integer, so the grid is bit-identical under any
    partitioning.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth and width must be >= 1, got {depth}x{width}")
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    cells = df.filter(F.col(value_col).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cm_pos(F.col(value_col), j, width, salt).alias("pos"),
                        w.alias("_w"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_c")
    )
    return (
        cells.select("_c.j", "_c.pos", "_c._w")
        .groupBy("j", "pos")
        .agg(F.sum("_w").alias("cnt"))
    )


def cm_merge(sketches: DataFrame) -> DataFrame:
    """Union of (j, pos, cnt) sketch rows (same depth/width/salt) -> one
    sketch: counters add. Shuffle bounded by depth*width."""
    return sketches.groupBy("j", "pos").agg(F.sum("cnt").alias("cnt"))


def cm_query(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 3,
    width: int = 1024,
    salt: str = "cm-v1",
) -> DataFrame:
    """Point-query a count-min sketch: for each candidate value the
    estimate is min over rows j of counter[j][pos_j(value)] (missing
    cell = 0). Never undercounts; overcounts by at most ~2N/width with
    probability 1 - 2^-depth. depth/width/salt MUST match the build.

    Plan: the candidate set explodes into its depth cells, broadcast-joins
    the <= depth*width sketch rows, and aggregates the min per value —
    the candidate table never shuffles for the sketch."""
    cand = queries.select(F.col(value_col).alias("value")).distinct()
    cells = cand.select(
        "value",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cm_pos(F.col("value"), j, width, salt).alias("pos"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_c"),
    ).select("value", "_c.j", "_c.pos")
    return (
        cells.join(F.broadcast(sketch), ["j", "pos"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


# --- HyperLogLog: constant-size cardinality estimation ----------------------

_HLL_PREFIX_BITS = 60  # 15 hex digits, exact in bigint (kg_sampling technique)


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias constant (m >= 64 form)."""
    return 0.7213 / (1 + 1.079 / m)


def hll_sketch(
    df: DataFrame, value_col: str, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Per-group HyperLogLog registers (Flajolet, Fusy, Gandouet, Meunier
    2007): rows ``group_cols + (idx, maxrank)``, at most m = 2**p per
    group, whatever the input size. The constant-size cousin of the KMV
    sketch: KMV keeps k hash strings (exact below k, simple estimator);
    HLL keeps 2**p small integers and scales to billions of distinct
    values with ~1.04/sqrt(m) error — the industry-standard shape for
    per-shard cardinality artifacts.

    Portable by construction: the 60-bit md5 prefix splits into a p-bit
    register index (top bits) and a (60-p)-bit suffix whose
    leading-zero rank comes from ``length(bin(suffix))`` — both engines
    print minimal binary, so the DuckDB oracle replays every register.

    Plan: one projection + HashAggregate keyed by (group, idx) with
    map-side MAX combine — shuffle volume bounded by parallelism * m per
    group, like cm_sketch. Merge = the same MAX aggregate over unioned
    register rows (:func:`hll_merge`).
    """
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    b = _HLL_PREFIX_BITS - p
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    idx = F.expr(f"_h div {2**b}").alias("idx")
    rest = F.pmod(F.col("_h"), F.lit(2**b))
    rank = (
        F.when(rest == 0, F.lit(b + 1))
        .otherwise(F.lit(b) - F.length(F.bin(rest)) + 1)
        .cast("int")
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("_h"))
        .select(*group_cols, idx, rank.alias("_rk"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("_rk").alias("maxrank"))
    )


def hll_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union of register rows (same p) -> merged sketch: per-register MAX,
    exactly the sketch of the union of the underlying sets."""
    return sketches.groupBy(*group_cols, "idx").agg(
        F.max("maxrank").alias("maxrank")
    )


def hll_estimate(
    sketches: DataFrame, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Registers -> ``est_distinct`` (bigint) per group. The raw harmonic
    estimate alpha_m * m^2 / sum(2^-M_j) with the linear-counting
    small-range correction (m * ln(m / zero_registers) when the raw
    estimate is under 2.5m and zeros exist).

    Determinism: the harmonic sum aggregates as EXACT bigint terms
    2**(b - min(M_j, b)) (absent registers contribute 2**b each), so the
    distributed sum is partition-order-free; the single float expression
    (one bigint->double conversion, one division, one ln branch) happens
    once per group — both engines round identical doubles identically.
    The min(M_j, b) cap loses the 2^-(b+1) term of an all-zero suffix
    (probability 2**-54 per value); the oracle replays the same cap.
    """
    m = 2**p
    b = _HLL_PREFIX_BITS - p
    alpha = _hll_alpha(m)
    # integer shift, not pow(2.0,..).cast: double->bigint cast semantics
    # (Spark truncates, other engines round) must stay out of the sum even
    # though the terms happen to be exact powers of two (ADVICE r04)
    per_group = sketches.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {b} - least(maxrank, {b}))")
        ).alias("_s"),
        F.count(F.lit(1)).alias("_nreg"),
        F.max("idx").alias("_mi"),
    )
    # p-mismatch guard (the minhash_incremental n_perm precedent): a
    # sketch built with a LARGER p carries register indexes >= 2**p —
    # estimating it at this p would silently produce garbage (negative
    # zero-register count). assert_true keeps the check plan-side and
    # free on the green path; the filter is always-true but forces it.
    per_group = per_group.filter(
        F.assert_true(
            F.col("_mi") < m,
            F.lit(f"hll_estimate(p={p}): register idx >= {m} — sketch was "
                  "built with a larger p than the estimate asks for"),
        ).isNull()
    )
    zeros = F.lit(m) - F.col("_nreg")
    s_full = F.col("_s") + zeros * F.lit(2**b)
    raw = F.lit(alpha * m * m * float(2**b)) / s_full.cast("double")
    est = F.when(
        (zeros > 0) & (raw <= F.lit(2.5 * m)),
        F.log(F.lit(float(m)) / zeros.cast("double")) * m,
    ).otherwise(raw)
    return per_group.select(
        *group_cols, F.floor(est).cast("bigint").alias("est_distinct")
    )
