"""Deterministic sampling for training-data curation.

Both operators are hash-derived, never ``rand()``: a rerun, a different
partitioning, or a different cluster size selects the SAME rows (the
resume/determinism requirement that seeded per-partition RNG cannot give,
since Spark seeds `rand` per partition index).

- ``hash_sample``: keep a row iff pmod(xxhash64(key, salt), D) < rate*D —
  a pure narrow filter, pushes down to the scan side of any plan.
- ``stratified_sample``: per-stratum top-k by hash order — one shuffle on
  the stratum key; the window is rank-truncated so per-group state is the
  k-row heap, not the stratum. Strata are exactly the groupBy cardinality
  (e.g. language, source domain), so skew follows the stratum distribution —
  hot strata split fine because rank truncation happens after the sort
  within each partition's run (TakeOrdered-like behavior under AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DENOM = 1_000_000


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "kgspark", hash_expr=None
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keeps ~rate of rows, stable
    across runs/partitionings. 0 <= rate <= 1.

    ``hash_expr``: optional replacement hash Column in [0, 1_000_000); the
    default xxhash64 is the fast JVM path, an md5-derived expression makes
    the selection reproducible in other engines (see __spark_entry__).
    """
    if not 0 <= rate <= 1:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    bucket = (
        hash_expr
        if hash_expr is not None
        else F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(_DENOM))
    )
    return df.filter(bucket < int(rate * _DENOM))


def stratified_sample(
    df: DataFrame, stratum_col: str, key_col: str, k: int, salt: str = "kgspark",
    hash_expr=None,
) -> DataFrame:
    """Deterministic k rows per stratum: rank by hash order within each
    stratum, keep rank <= k. Equal-size strata representation regardless of
    the corpus' stratum skew (the usual language-balancing step)."""
    order = (
        hash_expr
        if hash_expr is not None
        else F.xxhash64(F.col(key_col), F.lit(salt))
    )
    w = Window.partitionBy(stratum_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
