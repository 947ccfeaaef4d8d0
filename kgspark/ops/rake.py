"""RAKE keyword extraction (Rose, Engel, Cramer, Cowley 2010).

Rapid Automatic Keyword Extraction: candidate phrases are maximal runs
of non-stopword tokens between stopword/sentence boundaries; each word
scores deg(w)/freq(w) (deg = sum of lengths of the candidate phrases
containing w — frequency plus co-occurrence; freq = occurrence count),
and a phrase scores the sum of its member-word scores. The corpus-scale
"what is this page about" primitive: keyword columns for routing,
topical dedup keys, context-card headers, weak labels — computed with
no model, no Python, one pass.

Design (deterministic, engine-portable, exact-integer):

- Phrase segmentation is relational gaps-and-islands: posexplode the
  sentence's token array, flag stopwords, and the running stopword
  count over (doc, sentence, position) is the phrase group id — one
  window per sentence riding the explode, the repeated_spans islands
  discipline. No regex alternation over the stopword list (overlapping
  "of the" matches make replace-based splitting order-sensitive).
- Word scores are fixed-point: ``score_milli(w) = (1000 * deg(w)) div
  freq(w)`` — deg and freq are exact bigint counts per (doc, word), the
  floor division is replayed by the oracle, and phrase scores are exact
  bigint sums of member-word scores (with multiplicity, per the paper).
- Every aggregate is keyed by (doc, ...) — millions of documents score
  as one hash-partitioned job, map-side combinable, no driver loop.
  Phrase reassembly is the bpe repack trick: sort_array over
  (position, token) structs, then one transform + concat_ws, all JVM.

The reference has no keyword extraction (its retrieval keys on exact
entity names); this extends the webtext curation tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.ops.textstats import split_sentences

# compact English function-word core: enough to break phrases; callers
# pass their own list for real corpora (broadcast literal set either way)
DEFAULT_STOPWORDS = (
    "a an and are as at be by for from has have in is it of on or "
    "that the to was were will with"
).split()


def rake_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    stopwords: list[str] | None = None,
    min_token_chars: int = 1,
    max_phrase_len: int = 5,
    top_k: int | None = None,
) -> DataFrame:
    """(id, text) -> scored candidate phrases
    ``(id, phrase, n_words, score_milli)`` — distinct phrases per
    document with the RAKE score in exact milli-units; with ``top_k``
    also ``rn`` (1-based by score DESC, phrase ASC) keeping the top k
    phrases per document.

    Tokens shorter than ``min_token_chars`` act as boundaries (like
    stopwords); phrases longer than ``max_phrase_len`` words are
    dropped AFTER word statistics are counted (the paper's convention:
    long runs still evidence their words, they just don't surface as
    keywords — and unboundedly long phrases are a degenerate-input
    hazard, not a keyword).
    """
    if max_phrase_len < 1:
        raise ValueError(f"max_phrase_len must be >= 1, got {max_phrase_len}")
    if min_token_chars < 1:
        raise ValueError(f"min_token_chars must be >= 1, got {min_token_chars}")
    if top_k is not None and top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    stops = DEFAULT_STOPWORDS if stopwords is None else stopwords

    sents = split_sentences(docs, text_col, id_col)
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("sentence")), r"[^a-z0-9]+", " ")
    )
    toks = sents.select(
        F.col(id_col).alias("_doc"),
        "sent_id",
        F.posexplode(F.split(norm, " ")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    is_stop = F.col("tok").isin(list(stops)) | (
        F.length("tok") < min_token_chars
    )
    w = (
        Window.partitionBy("_doc", "sent_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    words = (
        toks.withColumn("_stop", is_stop)
        .withColumn("grp", F.sum(F.col("_stop").cast("int")).over(w))
        .filter(~F.col("_stop"))
    )

    # phrase rows: one per candidate-phrase occurrence, words in order
    phrases = words.groupBy("_doc", "sent_id", "grp").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("phrase"),
    )

    # per-(doc, word) deg/freq over ALL candidate phrases, then the
    # fixed-point RAKE word score
    occur = words.join(phrases, ["_doc", "sent_id", "grp"]).select(
        "_doc", "sent_id", "grp", "tok", "n_words"
    )
    wscore = (
        occur.groupBy("_doc", "tok")
        .agg(
            F.sum("n_words").alias("_deg"),
            F.count(F.lit(1)).alias("_freq"),
        )
        .selectExpr("_doc", "tok", "((1000 * _deg) div _freq)::bigint AS _ws")
    )

    scored = (
        occur.join(wscore, ["_doc", "tok"])
        .groupBy("_doc", "sent_id", "grp")
        .agg(F.sum("_ws").alias("score_milli"))
        .join(phrases, ["_doc", "sent_id", "grp"])
        .filter(F.col("n_words") <= max_phrase_len)
        .groupBy("_doc", "phrase")
        .agg(
            F.max("n_words").alias("n_words"),
            F.max("score_milli").alias("score_milli"),
        )
        .select(
            F.col("_doc").alias(id_col), "phrase", "n_words", "score_milli"
        )
    )
    if top_k is None:
        return scored
    rw = Window.partitionBy(id_col).orderBy(
        F.desc("score_milli"), F.asc("phrase")
    )
    return scored.withColumn("rn", F.row_number().over(rw)).filter(
        F.col("rn") <= top_k
    )
