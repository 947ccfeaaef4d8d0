"""TextRank extractive sentence ranking (Mihalcea & Tarau, EMNLP 2004).

The classic unsupervised summarizer: build a per-document sentence graph
(edge = lexical overlap), run PageRank on it, keep the top-ranked
sentences. At corpus curation scale this is the "representative snippet"
primitive — pick the k sentences that carry a page's content for
context cards, dedup previews, or LLM-context compression — and the
engine already owns both halves: :func:`kgspark.ops.textstats.
split_sentences` (deterministic, engine-portable segmentation) and the
integer fixed-point PageRank discipline of ``ops/graph_algs.pagerank``.

Design (Spark-first, per-document graphs at corpus scale):

- Sentence similarity is DISTINCT-token overlap, thresholded
  (``min_overlap`` shared tokens => an undirected edge). The paper's
  |overlap| / (log|A| + log|B|) weighting needs float edge weights;
  the thresholded-unweighted variant keeps the whole computation in
  the repo's exact-bigint discipline so ranks are bit-identical under
  any partitioning and the DuckDB oracle replays every round.
- Pairs come from a within-doc token inverted index: explode distinct
  (doc, sent, token) rows and self-join on (doc, token) — NEVER an
  all-pairs sentence join. Fan-out per (doc, token) is the number of
  sentences in THAT document containing the token, so hot global
  tokens cost nothing across documents; ``max_token_sents`` caps
  degenerate within-doc stopword tokens (the lsh_candidate_pairs
  boilerplate-cap precedent, ops/dedup.py).
- PageRank runs per document in ONE distributed job: every
  aggregate/join below is keyed by (doc, sentence) or (doc,), so the
  union of millions of tiny sentence graphs executes as a handful of
  hash-partitioned stages — no driver loop over documents, no
  per-document job. Teleport and dangling redistribution use the
  PER-DOCUMENT node count (this is what makes it per-doc PageRank
  rather than global PageRank over a disconnected union: each
  document's ranks sum to ~scale independently).
- Integer fixed point: ranks are bigints in units of 1/scale, all
  divisions are floor divisions of nonnegative values (`div` in Spark,
  `//` in DuckDB — identical), damping must be percent-expressible.
  Fixed ``max_iter`` rounds, no convergence action => identical plan
  and bits everywhere; ``localCheckpoint`` per round cuts lineage
  (the graph_algs iterative-op discipline).

The reference has no summarization of any kind (its extraction is
row-at-a-time Cypher emission); this is part of the webtext curation
tier the engine adds on top of SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.ops.textstats import split_sentences


def sentence_overlap_edges(
    sents: DataFrame,
    id_col: str = "doc_id",
    *,
    min_overlap: int = 2,
    min_token_chars: int = 2,
    max_token_sents: int = 1000,
) -> DataFrame:
    """(id, sent_id, sentence) -> undirected within-document overlap edges
    ``(id, src, dst)`` (both directions), one per sentence pair sharing
    >= ``min_overlap`` distinct lowercased alphanumeric tokens of >=
    ``min_token_chars`` chars.

    Tokens that appear in more than ``max_token_sents`` sentences of one
    document are dropped BEFORE the pair join (within-doc df cap): a
    pathological page repeating one token in every line would otherwise
    force an O(sentences^2) fan-out on that single (doc, token) key.
    """
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    if max_token_sents < 2:
        raise ValueError(f"max_token_sents must be >= 2, got {max_token_sents}")
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("sentence")), r"[^a-z0-9]+", " ")
    )
    toks = (
        sents.select(
            F.col(id_col).alias("_doc"),
            F.col("sent_id"),
            F.explode(F.split(norm, " ")).alias("tok"),
        )
        .filter(F.length("tok") >= min_token_chars)
        .distinct()
    )
    # within-doc df cap: one aggregate + co-partitioned semi-join on the
    # SAME (doc, token) key the pair join uses — no second exchange
    keep = (
        toks.groupBy("_doc", "tok")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_token_sents)
        .select("_doc", "tok")
    )
    capped = toks.join(keep, ["_doc", "tok"], "left_semi")
    a = capped.select("_doc", "tok", F.col("sent_id").alias("sa"))
    b = capped.select("_doc", "tok", F.col("sent_id").alias("sb"))
    ov = (
        a.join(b, ["_doc", "tok"])
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("_doc", "sa", "sb")
        .agg(F.count(F.lit(1)).alias("_ov"))
        .filter(F.col("_ov") >= min_overlap)
    )
    fwd = ov.select("_doc", F.col("sa").alias("src"), F.col("sb").alias("dst"))
    rev = ov.select("_doc", F.col("sb").alias("src"), F.col("sa").alias("dst"))
    return fwd.unionByName(rev).withColumnRenamed("_doc", id_col)


def textrank_sentences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_overlap: int = 2,
    min_token_chars: int = 2,
    max_token_sents: int = 1000,
    damping: float = 0.85,
    max_iter: int = 5,
    scale: int = 10**12,
    top_k: int | None = None,
) -> DataFrame:
    """(id, text) -> per-sentence TextRank scores
    ``(id, sent_id, sentence, rank_units)``; with ``top_k`` also ``rn``
    (1-based rank within the document, ties broken by sent_id) and only
    the top ``top_k`` sentences per document are kept.

    ``rank_units`` is bigint fixed point in units of 1/``scale``; each
    document's ranks sum to ~``scale`` (floor-division loss only), so
    scores are comparable across documents of different lengths.
    Deterministic and partitioning-invariant by the same argument as
    ``ops/graph_algs.pagerank(scale=...)``: every operation is an exact
    bigint sum or a floor division replayed by the oracle.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if scale < 2:
        raise ValueError(f"scale must be >= 2, got {scale}")
    d_pct = int(round(damping * 100))
    if not 0 < d_pct < 100 or abs(d_pct - damping * 100) > 1e-9:
        raise ValueError(
            f"damping must be a percentage-expressible value in (0, 1), got {damping}"
        )
    if top_k is not None and top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")

    sents = split_sentences(docs, text_col, id_col).localCheckpoint()
    edges = sentence_overlap_edges(
        sents,
        id_col,
        min_overlap=min_overlap,
        min_token_chars=min_token_chars,
        max_token_sents=max_token_sents,
    ).localCheckpoint()

    nodes = sents.select(id_col, "sent_id")
    ng = nodes.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    outdeg = edges.groupBy(id_col, "src").agg(F.count(F.lit(1)).alias("_deg"))

    ranks = nodes.join(ng, id_col).selectExpr(
        id_col, "sent_id", f"({scale} div _n)::bigint AS _r"
    )
    for _ in range(max_iter):
        contribs = (
            edges.join(
                ranks.withColumnRenamed("sent_id", "src"), [id_col, "src"]
            )
            .join(outdeg, [id_col, "src"])
            .selectExpr(id_col, "dst AS sent_id", "(_r div _deg) AS _c")
            .groupBy(id_col, "sent_id")
            .agg(F.sum("_c").alias("_s"))
        )
        # per-document dangling mass (sentences with no overlap edge):
        # a (doc,)-keyed aggregate, NOT a 1-row broadcast — every join
        # below stays hash-partitioned on the document key
        dangling = (
            ranks.join(
                outdeg.withColumnRenamed("src", "sent_id"),
                [id_col, "sent_id"],
                "left_anti",
            )
            .groupBy(id_col)
            .agg(F.sum("_r").cast("bigint").alias("_m"))
        )
        ranks = (
            nodes.join(ng, id_col)
            .join(contribs, [id_col, "sent_id"], "left")
            .join(dangling, id_col, "left")
            .selectExpr(
                id_col,
                "sent_id",
                f"((({100 - d_pct}::bigint * {scale}) div (100 * _n))"
                f" + ({d_pct} * (coalesce(_s, 0)"
                " + (coalesce(_m, 0) div _n))) div 100"
                ")::bigint AS _r",
            )
            .localCheckpoint()
        )

    out = sents.join(ranks, [id_col, "sent_id"]).select(
        id_col, "sent_id", "sentence", F.col("_r").alias("rank_units")
    )
    if top_k is None:
        return out
    w = Window.partitionBy(id_col).orderBy(
        F.desc("rank_units"), F.asc("sent_id")
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
    )
