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
