"""Corpus-curation operators a web-scale training pipeline needs around the
KG engine: URL canonicalization, deterministic dataset splits, and
token-budgeted sequence packing. All pure ``pyspark.sql.functions`` —
narrow, whole-stage-codegen plans with no Python and no shuffle except
where stated; every operator has an exact ANSI-SQL replay (DuckDB oracle
in ``__spark_entry__.py``), so results are engine-portable.

The reference has no URL handling at all (its crawler stores raw strings,
spider_nursing_home.py:118-135); these are the north-rule-scale additions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_url(col: Column) -> Column:
    """Canonical URL for exact URL-level dedup / join keys:

    - scheme and host lowercased; path/query case preserved;
    - default ports stripped (``:80`` for http, ``:443`` for https);
    - fragment dropped;
    - tracking parameters (``utm_*``, ``fbclid``, ``gclid``) dropped;
    - remaining query parameters sorted (order-insensitive equality);
    - trailing ``?`` removed when the query empties; empty path -> ``/``.

    Pure string expressions (regexp_extract / split / array ops) — a narrow
    projection. Two urls that differ only in these respects normalize to
    the same string; everything else is preserved byte-for-byte.
    """
    scheme = F.lower(F.regexp_extract(col, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(col, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    after_host = F.regexp_replace(rest, r"^[^/?#]*", "")
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    authority = F.concat(host, F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")))
    no_frag = F.regexp_replace(after_host, r"#.*$", "")
    path = F.regexp_extract(no_frag, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[A-Za-z0-9_]*|fbclid|gclid)="),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    tail = F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), authority, path, tail)


def split_assign(
    col: Column, salt: str = "split-v1", val_pct: int = 5, test_pct: int = 5
) -> Column:
    """Deterministic train/val/test assignment from the key alone.

    bucket = first-15-hex-digits of md5(key || '|' || salt) as bigint,
    mod 100 — engine-portable (the DuckDB oracle replays it exactly),
    partitioning-invariant, and stable across reruns/resumes (the same
    document NEVER migrates between splits, the property that keeps eval
    sets uncontaminated as the corpus grows). A new salt is a fresh split.
    ``val_pct``/``test_pct`` are integer percents; the rest is train.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(f"|{salt}"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    bucket = F.pmod(h, F.lit(100))
    return (
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train"))
    )


def pack_greedy_contiguous(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Token-budgeted sequence packing: assign each document a ``pack_id``
    so consecutive documents (in ``order_col`` order, within
    ``partition_col`` if given) fill ~``budget``-token packs — the standard
    pre-tokenized-batch construction for LLM training shards.

    Deterministic contiguous fill: pack_id = floor(exclusive-running-sum /
    budget). A pack can overflow by at most one document (the straddling
    doc belongs to the pack its first token lands in) — the scheme every
    engine can replay exactly (one window sum; the oracle is plain SQL),
    unlike stateful first-fit which is neither expressible nor
    partitioning-stable. Oversized single documents (> budget) get a pack
    of their own. Returns the input plus (pack_id, pack_offset).

    Shuffle shape: one window over (partition_col, order_col) — at corpus
    scale partition by shard/bucket so no global sort exists.
    """
    part = [partition_col] if partition_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running_incl = F.sum(token_col).over(w)
    before = (running_incl - F.col(token_col)).cast("long")
    return df.withColumn("pack_id", F.floor(before / F.lit(budget)).cast("long")).withColumn(
        "pack_offset", F.pmod(before, F.lit(budget)).cast("long")
    )
