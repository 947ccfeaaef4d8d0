"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

For every left row, attach the most recent right row whose timestamp is at
or before the left row's timestamp, within equal join keys — the standard
point-in-time join of time-series / feature-store pipelines (DuckDB ``ASOF
JOIN``, pandas ``merge_asof``).

Physical strategy (scale-first, no Python): the classic union trick.
Left and right rows are interleaved into ONE stream keyed by the join key;
a single window ``last(struct, ignorenulls=True)`` ordered by (ts, side)
carries the latest right ROW (all its columns as one non-null struct)
forward onto each left row, so null field values in the matched row are
preserved rather than back-filled from older rows.

- ONE shuffle (hash by key) + ONE sort per partition — exactly the cost of a
  sort-merge join, with no join explosion: a key with L left rows and R right
  rows costs O((L+R) log(L+R)) locally, never O(L*R) as the naive
  ``l.ts >= r.ts`` range-join formulation does.
- Right rows sort before left rows at equal timestamps, giving inclusive
  (>=) semantics.
- Rows never cross the Arrow boundary: the whole operator is window
  expressions inside whole-stage codegen.
- Skewed keys: the shuffle key is the join key; a pathological single-key
  stream degrades to one sorted partition — salt by time-bucket upstream if
  one key dominates (the window cannot cross salt boundaries safely, so the
  operator itself stays unsalted).

The right side must be unique per (key, ts); ``asof_join`` deterministically
pre-collapses duplicates by keeping the lexicographically greatest value
struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    dedup_right: bool = True,
) -> DataFrame:
    """Left as-of join: latest right row with ``right_ts <= left_ts`` per key.

    Returns all left columns plus ``right_cols`` (null when no right row
    precedes the left row). Column name collisions must be resolved by the
    caller (rename before joining).

    ``dedup_right=False`` skips the right-side (key, ts)-uniqueness collapse
    when the caller guarantees it (e.g. reading a deduplicated snapshot
    table); the whole operator is then exactly ONE exchange + one sort.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"rename right columns colliding with left: {sorted(overlap)}")

    if dedup_right:
        # deterministic right side: one row per (key, ts)
        r = (
            right.groupBy(F.col(on).alias(on), F.col(right_ts).alias("_ts"))
            .agg(F.max(F.struct(*right_cols)).alias("_r"))
            .select(on, "_ts", *[F.col(f"_r.{c}").alias(c) for c in right_cols])
        )
    else:
        r = right.select(
            F.col(on).alias(on), F.col(right_ts).alias("_ts"), *right_cols
        )

    # Carry ALL right columns as ONE struct. The struct wrapper is non-null on
    # every right row even when its fields are null, so a single
    # last(ignorenulls=True) picks the most recent right ROW — a genuine NULL
    # in the matched row survives, and columns are never stitched from
    # different right rows (per-column carry gets both wrong).
    r_struct_type = r.select(F.struct(*right_cols).alias("_rv")).schema["_rv"].dataType
    carry = [c for c in left.columns if c not in (on, left_ts)]
    l_tagged = left.select(
        F.col(on).alias(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in carry],
        F.lit(None).cast(r_struct_type).alias("_rv"),
    )
    r_tagged = r.select(
        F.col(on).alias(on),
        F.col("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in carry],
        F.struct(*right_cols).alias("_rv"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        on,
        "_ts",
        "_side",
        *[F.col(f"_l_{c}") for c in carry],
        F.last("_rv", ignorenulls=True).over(w).alias("_rv"),
    )
    out = [
        F.col(on) if c == on else F.col("_ts").alias(left_ts) if c == left_ts
        else F.col(f"_l_{c}").alias(c)
        for c in left.columns
    ]
    return carried.filter(F.col("_side") == 1).select(
        *out, *[F.col(f"_rv.{c}").alias(c) for c in right_cols]
    )


_BROADCAST_ROW_LIMIT = 5_000_000


def asof_join_broadcast(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    max_right_rows: int = _BROADCAST_ROW_LIMIT,
) -> DataFrame:
    """Zero-shuffle as-of join for a dimension-scale right side — the
    broadcast-hash-join tier of the operator (``asof_join`` is the
    sort-merge tier).

    The whole right table ships to every task inside the closure (same
    size class as a broadcast join build side; guarded by
    ``max_right_rows``); each Arrow batch runs one vectorized
    ``pandas.merge_asof`` against it. The left side keeps its partitioning —
    no exchange anywhere, so a corpus-scale left stream annotates itself
    with point-in-time features at pure map speed.

    Semantics identical to ``asof_join`` (backward, inclusive; duplicate
    right (key, ts) collapse to the max value struct) — equality is
    test-asserted against the sort-merge tier.
    """
    import pandas as pd

    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"rename right columns colliding with left: {sorted(overlap)}")
    n = right.count()
    if n > max_right_rows:
        raise ValueError(
            f"broadcast as-of right side has {n} rows > {max_right_rows}; "
            f"use asof_join (sort-merge tier) for corpus-scale right sides"
        )
    r = (
        right.groupBy(F.col(on), F.col(right_ts))
        .agg(F.max(F.struct(*right_cols)).alias("_r"))
        .select(on, right_ts, *[F.col(f"_r.{c}").alias(c) for c in right_cols])
    )
    rpdf = r.toPandas().sort_values(right_ts, kind="mergesort").reset_index(drop=True)
    from pyspark.sql import types as T

    left_cols = left.columns
    r_schema = {f.name: f.dataType for f in r.schema.fields}
    out_schema = T.StructType(
        list(left.schema.fields)
        + [T.StructField(c, r_schema[c], True) for c in right_cols]
    )

    def run(batches):
        for pdf in batches:
            ordered = pdf.sort_values(left_ts, kind="mergesort")
            merged = pd.merge_asof(
                ordered,
                rpdf,
                left_on=left_ts,
                right_on=right_ts,
                left_by=on,
                right_by=on,
                direction="backward",
                allow_exact_matches=True,
            )
            yield merged[left_cols + right_cols]

    return left.mapInPandas(run, schema=out_schema)
