"""Text analysis for large-scale training-data pipelines (all JVM-side).

Every operator here is pure ``pyspark.sql.functions`` — whole-stage codegen,
no Python in the hot path — because these run over the full corpus (the
100 TB side), unlike extraction which is content-dependent.

Operators: token counting (whitespace + BPE-ish regex), document
fingerprinting (md5 of a normalized form — portable across engines, used as
the cross-engine dedup key), quality scoring (length / punctuation /
stopword / repetition signals), n-gram heuristic language ID.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish word/number/punct splitter: letter runs, digit runs, single
# non-space punct — approximates subword pre-tokenization
BPE_TOKEN_RE = r"[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]"

# tiny marker-word inventories for heuristic language id (deterministic,
# SQL-portable: plain substring containment on padded text)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "les", "et", "est"],
}


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def token_count_bpe(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / punct)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text. md5 (not xxhash64) so any engine — DuckDB, Trino,
    Python — derives the identical key for cross-system dedup joins."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(normalized)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals + a composite score in [0, 1].

    Signals: char length, ws-token count, mean word length, punctuation
    density, uppercase ratio, max single-token share (repetition proxy).
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_ws(t)
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?。，；：！？]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    mean_word_len = (n_chars / F.greatest(n_tokens, F.lit(1))).cast("double")

    out = df.withColumns(
        {
            "n_chars": n_chars.cast("long"),
            "n_tokens": n_tokens.cast("long"),
            "punct_ratio": (n_punct / F.greatest(n_chars, F.lit(1))).cast("double"),
            "upper_ratio": (n_upper / F.greatest(n_alpha, F.lit(1))).cast("double"),
            "mean_word_len": mean_word_len,
        }
    )
    # composite: each component clamped to [0,1]; weights are heuristic
    length_ok = F.least(F.col("n_tokens") / F.lit(20.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))
    upper_ok = F.lit(1.0) - F.least(F.col("upper_ratio") * 2.0, F.lit(1.0))
    wordlen_ok = F.when(
        (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.3))
    return out.withColumn(
        "quality_score",
        ((length_ok + punct_ok + upper_ok + wordlen_ok) / 4.0).cast("double"),
    )


def _marker_hits(text: Column, words: list[str]) -> Column:
    """Number of marker words present (word-ish containment on padded text)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = [padded.contains(f" {w} ").cast("int") for w in words]
    return reduce(lambda a, b: a + b, hits)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID.

    CJK detection first (any CJK char -> 'zh'-family), then argmax of marker-
    word hits across LANG_MARKERS; 'und' when nothing matches. Deterministic
    ties: greatest((hits, code)) -> lexicographically largest code wins.
    """
    t = F.col(text_col)
    has_cjk = t.rlike(r"[一-鿿]")
    scores = [
        F.struct(_marker_hits(t, ws).alias("hits"), F.lit(code).alias("code"))
        for code, ws in sorted(LANG_MARKERS.items(), reverse=True)
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    pred = (
        F.when(has_cjk, F.lit("zh"))
        .when(best["hits"] > 0, best["code"])
        .otherwise(F.lit("und"))
    )
    return df.withColumn("lang_pred", pred)


def repetition_ratio(text: Column, k: int = 5) -> Column:
    """Training-data quality signal: 1 - distinct_k_grams / total_k_grams of
    the whitespace-normalized text. Boilerplate and template spam repeat
    shingles heavily; natural prose scores near 0.

    JVM-side throughout (transform over an index sequence + array_distinct) —
    the same shingling shape as ops.dedup.verify_jaccard, so it rides
    whole-stage codegen, no Python.
    """
    norm = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    n_grams = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: norm.substr(i, F.lit(k))
    )
    return F.round(
        1 - F.size(F.array_distinct(shingles)) / n_grams.cast("double"), 6
    )


def chunk_documents(
    df: DataFrame,
    size: int = 512,
    overlap: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking for training-data prep: one row per
    chunk, columns (id, chunk_id, chunk_text). Character windows of
    ``size`` advancing by ``size - overlap`` (the final window may be
    shorter; empty/null docs yield no rows).

    Pure JVM expression: an index sequence -> substr transform -> explode,
    so chunking a 100 TB corpus is a map-only stage with no Python and no
    shuffle; the chunk multiplicity (~1/(1-overlap/size)) is the only data
    growth. Character (not token) windows keep it deterministic and
    tokenizer-agnostic; compose with token_count_* downstream to filter.
    """
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    step = size - overlap
    text = F.col(text_col)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.ceil((F.length(text) - F.lit(size)) / F.lit(step)), F.lit(0)),
    )
    chunks = F.transform(starts, lambda i: text.substr(i * step + 1, F.lit(size)))
    return (
        df.where(text.isNotNull() & (F.length(text) > 0))
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text"))
        .where(F.length("chunk_text") > 0)
    )


# email, then international-ish phone sequences; ORDER MATTERS (an email may
# contain digit runs a phone pattern would mangle first)
_PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9 ()-]{7,}[0-9]", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Curation-grade PII scrub: emails then phone-number-like digit runs
    replaced with typed placeholders. Deliberately simple, deterministic
    regexes (both engines' dialects agree on this subset — the oracle
    hash-matches) — a production deployment swaps in its compliance
    ruleset behind the same column-in/column-out contract."""
    out = text
    for pat, repl in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Bigram collocation mining: (w1, w2, n_ab, lift) where lift =
    P(w1,w2) / (P(w1) P(w2)) — the monotone rational core of PMI (log
    omitted deliberately: ranking is unchanged, and integer-product-over-
    integer division is one correctly-rounded double op, so results are
    bit-identical across engines — same reasoning as the TF-IDF-style
    scorer in __spark_entry__). High-lift bigrams are phrase candidates:
    multiword entity surface forms for the alias dictionary (X6) and
    tokenizer vocab growth.

    Plan: tokens via lower+regexp split (map-only), adjacent pairs by
    JVM-side arrays_zip of the token array with itself shifted, two-phase
    counts for bigrams and unigrams, then two joins against the unigram
    table (corpus-vocabulary-sized — Zipf makes it small relative to the
    corpus; AQE picks broadcast when it fits).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z]+"), lambda t: F.length(t) >= 2
    )
    pairs = df.where(F.col(text_col).isNotNull()).select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    n_total = F.broadcast(uni.agg(F.sum("n").alias("n_total")))
    bi = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n_ab")).where(
        F.col("n_ab") >= min_count
    )
    return (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("n").alias("n_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n").alias("n_b")), "w2")
        .crossJoin(n_total)
        .select(
            "w1",
            "w2",
            "n_ab",
            (
                (F.col("n_ab") * F.col("n_total")).cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style language-model quality proxy with the corpus itself as
    the unigram model: each document's mean log-probability of its tokens
    under corpus-wide term frequencies. Rare-word gibberish scores very
    negative, median prose sits in a narrow band, stopword spam scores
    high — threshold both tails (the standard perplexity-bucket filter,
    without needing an external LM in the sandbox).

    Returns ``(id, n_tokens, logprob)`` for every document with at least
    one token; ``logprob = mean_t ln(count(t)/C)`` where C is the corpus
    token count.

    Determinism discipline (same as the stats_moments oracle): the per-doc
    sum runs over FIXED-POINT millinat logs (``round(ln(count)*1000)`` as
    bigint) so the distributed aggregation is exact integer math in any
    partition order; the float division and the single ``ln(C)`` happen
    once per row at the end, rounded to 6 decimals — engine-portable, the
    DuckDB oracle replays it. Shuffle shape: one map-side-combinable term
    count, a shuffle hash join of (id, term) against the term table on the
    term key, one per-doc aggregate. No Python anywhere.
    """
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    terms = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
    )
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("_c"))
    total = counts.agg(F.sum("_c").alias("_total"))
    per_doc = (
        terms.join(counts, "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.round(F.log(F.col("_c")) * 1000).cast("bigint")).alias("_s"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        id_col,
        "n_tokens",
        F.round(
            F.col("_s") / 1000.0 / F.col("n_tokens") - F.log(F.col("_total")), 6
        ).alias("logprob"),
    )


def gopher_flag_cols(t: Column) -> dict[str, Column]:
    """The Gopher per-rule predicate Columns over a text Column (NULL text
    yields NULL flags — callers coalesce to False). Shared by
    ``gopher_quality_flags`` (the auditable projection) and
    ``curation.build_training_shards`` (the opt-in gate chain), so the
    gate filters are by construction the same expressions the verified
    operator computes — pure JVM, no join, no shuffle."""
    norm = F.trim(F.regexp_replace(t, r"\s+", " "))
    toks = F.split(norm, " ")
    n_tokens = F.when(norm == "", F.lit(0)).otherwise(F.size(toks))
    n_chars = F.length(F.regexp_replace(norm, " ", ""))
    mean_wl = n_chars / F.greatest(n_tokens, F.lit(1))
    n_hash = F.length(F.regexp_replace(t, r"[^#]", ""))
    n_ellipsis = (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / 3
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_ell_lines = F.size(F.filter(lines, lambda l: F.rtrim(l).endswith("...")))
    n_alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    stop_hits = sum(
        (
            F.concat(F.lit(" "), F.lower(norm), F.lit(" ")).contains(f" {w} ")
        ).cast("int")
        for w in ["the", "be", "to", "of", "and", "that", "have", "with"]
    )
    return {
        "flag_n_tokens": (n_tokens >= 50) & (n_tokens <= 100_000),
        "flag_mean_word_len": (mean_wl >= 3) & (mean_wl <= 10),
        "flag_hash_ellipsis": (n_hash + n_ellipsis) / F.greatest(n_tokens, F.lit(1)) < 0.1,
        "flag_ellipsis_lines": n_ell_lines / F.greatest(n_lines, F.lit(1)) < 0.3,
        "flag_alpha_words": n_alpha_words / F.greatest(n_tokens, F.lit(1)) >= 0.8,
        "flag_stopwords": stop_hits >= 2,
    }


def gopher_quality_flags(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher rule bundle (Rae et al. 2021, Appendix A) as one narrow
    projection — the standard pre-filter stack for web-scale training
    corpora, each rule surfaced as its own flag so thresholds are
    auditable rather than baked into one opaque score:

    - ``flag_n_tokens``: 50 <= whitespace tokens <= 100,000;
    - ``flag_mean_word_len``: mean characters per token in [3, 10];
    - ``flag_hash_ellipsis``: '#' or '...' per token < 0.1;
    - ``flag_ellipsis_lines``: lines ending in '...' < 30%;
    - ``flag_alpha_words``: >= 80% of tokens contain a letter;
    - ``flag_stopwords``: >= 2 of {the, be, to, of, and, that, have, with};
    - ``gopher_pass``: all of the above.

    Pure ``pyspark.sql.functions`` (regexp counts + splits), exact
    integer/ratio math — the DuckDB oracle replays every flag. Null text
    fails everything (kept in the output with ``gopher_pass = false``).
    """
    flags = gopher_flag_cols(F.col(text_col))
    out = docs.select(
        F.col(id_col),
        *[F.coalesce(c, F.lit(False)).alias(name) for name, c in flags.items()],
    )
    passed = None
    for name in flags:
        passed = F.col(name) if passed is None else (passed & F.col(name))
    return out.withColumn("gopher_pass", passed)


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    k1_milli: int = 1200,
    b_milli: int = 750,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 keyword retrieval over the corpus: (id, score_micro, score)
    for every document matching at least one query term — the sparse
    retriever that complements the dense ANN tier (ops/similarity.py) in
    a hybrid RAG stack. k1/b are fixed-point millis (1200/750 = the
    standard 1.2/0.75).

    score(d) = sum_{t in q} idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) (Robertson-Sparck Jones,
    non-negative variant).

    Determinism discipline (the unigram_logprob contract): the only
    transcendental — ln of the DOCUMENT-FREQUENCY ratio, a per-TERM
    quantity — is rounded once to millinat bigints; every per-(doc, term)
    contribution is then exact integer arithmetic floored to micro-units,
    so the per-doc sum commutes under any partition order and the DuckDB
    oracle hash-matches. Intermediate rescale steps (dl_ratio, norm,
    denom in millis) keep every product far below 2^63 even at
    10^13-token corpora — no overflow cliff at scale.

    Shuffle shape — ONE corpus scan: a single per-doc aggregate computes
    dl AND a conditional-sum tf column per query term in the same pass
    (the query is a fixed small list, so tf columns are pivot-style
    ``sum(term = q_i)`` expressions), then is localCheckpoint'd — the
    materialization is (2+|q|) longs per doc, smaller than the shuffle
    the aggregate already paid. Every downstream quantity — N/T totals
    (broadcast 1-row), per-term df (an aggregate of the stacked tf rows,
    NOT a corpus recount), the score rows — reads that checkpoint, so
    the corpus is read and exploded exactly once regardless of query
    length. (Plain subtree sharing can't do this: column pruning gives
    each consumer a different canonical subtree, so Spark materializes
    no ReusedExchange — measured, 8 scans without the checkpoint.)
    No Python, no window, no global sort.
    """
    q = sorted({t.lower() for t in query_terms if t})
    if not q:
        raise ValueError("query_terms must contain at least one non-empty term")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    terms = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
    )
    # one per-doc aggregate: dl + one conditional tf per query term;
    # checkpointed so all three consumers read it without re-scanning
    perdoc = terms.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum((F.col("term") == t).cast("long")).alias(f"_tf{i}")
            for i, t in enumerate(q)
        ],
    ).localCheckpoint()
    totals = perdoc.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_t")
    )  # 1-row broadcast
    # (term, tf) rows built via the functions API — terms are bound as
    # literals, never interpolated into SQL text (the apply_merge rule:
    # a term containing a quote must not be a parse error or an injection)
    tf = (
        perdoc.select(
            id_col,
            "dl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"),
                            F.col(f"_tf{i}").alias("tf"),
                        )
                        for i, t in enumerate(q)
                    ]
                )
            ).alias("_kv"),
        )
        .select(
            id_col,
            "dl",
            F.col("_kv.term").alias("term"),
            F.col("_kv.tf").alias("tf"),
        )
        .filter(F.col("tf") > 0)
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_t.crossJoin(F.broadcast(totals)).select(
        "term",
        F.round(
            F.log(
                F.lit(1.0)
                + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * 1000
        )
        .cast("bigint")
        .alias("idf_milli"),
    )
    # exact integer chain, milli-scaled at every step to bound magnitudes;
    # every quotient is Spark's bigint `div` (all operands positive, so
    # div == floor) — never a double division, so exactness survives
    # 10^13-token corpora where products exceed 2^53 (DuckDB replays
    # with `//`):
    # dl_ratio_milli = (1000*dl*N) div T; norm_milli = 1000-b + (b*ratio) div 1000;
    # denom_milli = 1000*tf + (k1*norm) div 1000; contrib_micro =
    # (idf_milli * tf * (k1+1000) * 1000) div denom_milli
    scored = (
        tf.crossJoin(F.broadcast(totals))
        .withColumn("dl_ratio_milli", F.expr("(1000 * dl * _n) div _t"))
        .withColumn(
            "norm_milli",
            F.expr(f"{1000 - b_milli} + ({b_milli} * dl_ratio_milli) div 1000"),
        )
        .withColumn(
            "denom_milli",
            F.expr(f"1000 * tf + ({k1_milli} * norm_milli) div 1000"),
        )
        .join(F.broadcast(idf), "term")
        .withColumn(
            "contrib_micro",
            F.expr(
                f"(idf_milli * tf * {k1_milli + 1000} * 1000) div denom_milli"
            ),
        )
    )
    out = scored.groupBy(id_col).agg(
        F.sum("contrib_micro").alias("score_micro"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )
    return out.select(
        id_col,
        "n_matched_terms",
        "score_micro",
        (F.col("score_micro") / 1e6).alias("score"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    hash: str = "md5",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    — the MOSS scheme) over word ``k``-gram hashes: slide a window of
    ``w`` consecutive gram hashes and keep each window's minimum, so any
    two documents sharing a run of at least ``k + w - 1`` tokens are
    GUARANTEED to share a fingerprint — the local sub-document dedup /
    plagiarism key that full-doc md5 and document-level minhash both
    miss, at ~2/(w+1) the density of storing every gram. Ties break to
    the smallest position (leftmost); documents with fewer than ``w``
    grams keep their single global minimum; sub-``k``-token documents
    emit nothing. Returns ``(id, pos, fp)`` distinct, 1-based gram
    positions.

    Plan: the JVM n-gram hash array (``curation.ngram_hashes`` — split /
    sequence / slice, no Python) posexplodes and ONE window per document
    does everything: a frame ``[current, w-1 following]`` struct-min
    selects each window's (hash, pos) winner and a partition count caps
    the window starts; distinct collapses runs selected by overlapping
    windows (the winnowing density guarantee). No join, no second
    shuffle — fingerprint selection rides the same per-doc sort the
    explode already needs. ``hash="md5"`` (fixed-width hex, string
    struct-min == lexicographic min) is replayed exactly by the DuckDB
    oracle; ``hash="xxhash64"`` is the 8-byte production variant.
    """
    from pyspark.sql import Window

    from kgspark.ops.curation import ngram_hashes

    grams = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(ngram_hashes(F.col(text_col), n=k, hash=hash)).alias(
                "_p0", "_h"
            ),
        )
        .select(F.col(id_col), (F.col("_p0") + 1).alias("pos"), "_h")
    )
    part = Window.partitionBy(id_col)
    frame = part.orderBy("pos").rowsBetween(0, w - 1)
    sel = F.min(F.struct(F.col("_h").alias("h"), F.col("pos").alias("p"))).over(frame)
    return (
        grams.withColumn("_n", F.count(F.lit(1)).over(part))
        .withColumn("_sel", sel)
        .filter(F.col("pos") <= F.greatest(F.col("_n") - F.lit(w - 1), F.lit(1)))
        .select(
            id_col,
            F.col("_sel.p").cast("long").alias("pos"),
            F.col("_sel.h").alias("fp"),
        )
        .distinct()
    )


def script_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Unicode-script composition — the routing signal a
    multilingual corpus pipeline needs BEFORE word-level language id
    (``lang_id`` assumes Latin-alphabet marker words; script mix decides
    which lang-id tier, tokenizer, and normalization a document should
    even be sent to, and catches mixed-script spam/mojibake). Counts
    characters in the four highest-volume web scripts plus total chars
    and a ``dominant_script`` label (deterministic tie order latin >
    cyrillic > han > arabic; ``none`` when no scripted character
    occurs). Pure JVM ``regexp_count`` with Unicode script classes — a
    narrow projection, no shuffle, no Python; the DuckDB oracle replays
    it with RE2's identical ``\\p{Script}`` classes (both engines
    verified char-for-char on mixed-script fixtures). NULL text is
    treated as empty — counts 0, dominant_script 'none' — not silently
    routed to the otherwise() branch ('arabic', the pre-fix bug).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lat = F.regexp_count(t, F.lit(r"\p{IsLatin}")).cast("long")
    cyr = F.regexp_count(t, F.lit(r"\p{IsCyrillic}")).cast("long")
    han = F.regexp_count(t, F.lit(r"\p{IsHan}")).cast("long")
    ar = F.regexp_count(t, F.lit(r"\p{IsArabic}")).cast("long")
    out = docs.select(
        F.col(id_col),
        lat.alias("n_latin"),
        cyr.alias("n_cyrillic"),
        han.alias("n_han"),
        ar.alias("n_arabic"),
        F.length(t).cast("long").alias("n_chars"),
    )
    m = F.greatest("n_latin", "n_cyrillic", "n_han", "n_arabic")
    return out.withColumn(
        "dominant_script",
        F.when(m == 0, F.lit("none"))
        .when(F.col("n_latin") == m, F.lit("latin"))
        .when(F.col("n_cyrillic") == m, F.lit("cyrillic"))
        .when(F.col("n_han") == m, F.lit("han"))
        .otherwise(F.lit("arabic")),
    )


# classic UTF-8-decoded-as-Latin-1 digraphs (é -> Ã©, ’ -> â€™, ° -> Â°):
# literal markers, no regex metacharacters — portable as a plain alternation
MOJIBAKE_MARKERS: list[str] = [
    "Ã©", "Ã¨", "Ã¡", "Ã³", "Ãº", "Ã±", "Ã¤", "Ã¶", "Ã¼",
    "â€™", "â€œ", "â€“", "â€”", "Â°", "Â»", "Â«", "Â·",
]


def encoding_bad_col(t: Column, flag_ppm: int = 1000) -> Column:
    """Boolean Column: replacement-char + mojibake density of ``t`` is at
    or above ``flag_ppm`` per million characters — the same verdict as
    ``encoding_quality``'s ``flag_encoding_bad`` (floor(total*1e6 /
    max(chars,1)) >= ppm ⟺ total*1e6 >= ppm*max(chars,1) for positive
    integers, so this form is division-free AND exact). NULL text is
    clean (False). Used by ``curation.build_training_shards``'s opt-in
    gate chain — a pure filter expression, no join, no shuffle."""
    tt = F.coalesce(t, F.lit(""))
    n_rep = F.regexp_count(tt, F.lit("�")).cast("long")
    n_moj = F.regexp_count(tt, F.lit("|".join(MOJIBAKE_MARKERS))).cast("long")
    n_chars = F.length(tt).cast("long")
    return (n_rep + n_moj) * F.lit(1_000_000).cast("long") >= F.lit(
        int(flag_ppm)
    ).cast("long") * F.greatest(n_chars, F.lit(1).cast("long"))


def encoding_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    flag_ppm: int = 1000,
) -> DataFrame:
    """Encoding-error detection — the web-crawl quality gate that keeps
    mojibake out of training corpora: counts U+FFFD replacement
    characters (lossy transcodes) and the classic UTF-8-misdecoded-as-
    Latin-1 digraphs (``é`` -> ``Ã©``, ``’`` -> ``â€™``, ``°`` ->
    ``Â°`` — ``MOJIBAKE_MARKERS``), scores them per million characters
    (exact-integer ppm, the repo's fixed-point discipline), and flags
    documents at or above ``flag_ppm``. A handful of hits in a long
    document is quoting/noise; a high density means the whole document
    was transcoded wrong and normalization (``unicodenorm``) cannot fix
    it — drop or re-fetch. Pure JVM string expressions (two
    regexp_counts over literal alternations), narrow projection, no
    shuffle; the DuckDB oracle replays it byte-for-byte. NULL text is
    treated as empty (counts 0, flag 0), not a NULL flag.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    pat = "|".join(MOJIBAKE_MARKERS)
    n_rep = F.regexp_count(t, F.lit("�")).cast("long")
    n_moj = F.regexp_count(t, F.lit(pat)).cast("long")
    n_chars = F.length(t).cast("long")
    out = docs.select(
        F.col(id_col),
        n_rep.alias("n_replacement"),
        n_moj.alias("n_mojibake"),
        n_chars.alias("n_chars"),
    )
    ppm = F.expr(
        "(n_replacement + n_mojibake) * 1000000L div greatest(n_chars, 1L)"
    )
    return out.withColumn("mojibake_ppm", ppm).withColumn(
        "flag_encoding_bad", (F.col("mojibake_ppm") >= flag_ppm).cast("int")
    )


def stupid_backoff_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha_milli: int = 400,
    model_docs: DataFrame | None = None,
) -> DataFrame:
    """Stupid Backoff bigram LM scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation") with the corpus itself as
    the model — the backoff scheme BUILT for distributed trillion-token
    counts: no discounting, no normalization pass, score(w|v) =
    count(v,w)/count(v) when the bigram exists, else alpha *
    count(w)/C. Sharper than ``unigram_logprob`` at separating fluent
    prose from shuffled-word spam (which keeps unigram frequencies but
    destroys bigrams) while needing only two count tables.

    Returns ``(id, n_tokens, backoff_tokens, logprob_millinat)`` for
    documents with at least one non-empty token: the first token scores
    as a unigram, subsequent tokens as bigram-or-backoff;
    ``backoff_tokens`` (how often the bigram was missing) is the audit
    column. All integer millinats end to end (one engine-local
    ``round(1000*ln(count))`` per distinct count — the unigram_logprob
    discipline; the alpha constant is a pre-rounded integer literal), so
    sums are partition-order-exact and the DuckDB oracle replays them
    bit-for-bit.

    Shuffle shape (the Brants construction): token and bigram counts are
    map-side-combinable aggregates; scoring joins the (id, pos, term,
    prev) rows against the two count tables on their term keys — shuffle
    hash joins at corpus-token scale, the same class as
    ``unigram_logprob``'s single join. No Python anywhere.
    """
    if not 1 <= alpha_milli <= 1000:
        raise ValueError(f"alpha_milli must be in [1, 1000], got {alpha_milli}")
    import math

    ln_alpha_milli = int(round(math.log(alpha_milli / 1000.0) * 1000))
    toks = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "),
        lambda x: x != "",
    )

    def token_rows(src: DataFrame) -> DataFrame:
        return (
            src.filter(F.col(text_col).isNotNull())
            .select(F.col(id_col), toks.alias("_t"))
            .filter(F.size("_t") >= 1)
            .select(
                id_col,
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("_t")),
                        lambda i: F.struct(
                            i.alias("pos"),
                            F.element_at("_t", i).alias("term"),
                            F.when(i > 1, F.element_at("_t", i - 1)).alias("prev"),
                        ),
                    )
                ).alias("_r"),
            )
            .select(id_col, "_r.pos", "_r.term", "_r.prev")
        )

    rows = token_rows(docs)
    # counts come from ``model_docs`` when given (e.g. a held-out or
    # reference corpus) — scoring a corpus against its OWN counts never
    # exercises the backoff branch, since every observed bigram is in the
    # model by construction. Unknown scored terms (no model unigram) fall
    # back to count 1 (the unseen-token floor), keeping ln() defined.
    model_rows = rows if model_docs is None else token_rows(model_docs)
    uni = model_rows.groupBy("term").agg(F.count(F.lit(1)).alias("_cu"))
    total = uni.agg(F.sum("_cu").alias("_C"))
    big = (
        model_rows.filter(F.col("prev").isNotNull())
        .groupBy("prev", "term")
        .agg(F.count(F.lit(1)).alias("_cb"))
    )

    def r1000(c):
        return F.round(F.log(c) * 1000).cast("bigint")

    uni_prev = uni.select(
        F.col("term").alias("prev"), F.col("_cu").alias("_cprev")
    )
    scored = (
        rows.join(uni, "term", "left")
        .withColumn("_cu", F.coalesce("_cu", F.lit(1)))
        .join(uni_prev, "prev", "left")
        .join(big, ["prev", "term"], "left")
    )
    # millinat score per token: unigram for pos 1, bigram when present,
    # alpha-backoff to unigram otherwise. ln(C) is applied per unigram-
    # scored token at the end (single broadcast scalar).
    is_uni = F.col("pos") == 1
    has_bi = F.col("_cb").isNotNull()
    per_token = scored.select(
        F.col(id_col),
        F.when(is_uni, r1000(F.col("_cu")))
        .when(has_bi, r1000(F.col("_cb")) - r1000(F.col("_cprev")))
        .otherwise(F.lit(ln_alpha_milli) + r1000(F.col("_cu")))
        .alias("_s"),
        # tokens whose score still needs the -ln(C) normalizer
        F.when(is_uni | ~has_bi, F.lit(1)).otherwise(F.lit(0)).alias("_needs_c"),
        F.when(~is_uni & ~has_bi, F.lit(1)).otherwise(F.lit(0)).alias("_backoff"),
    )
    agg = per_token.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("_s").alias("_ssum"),
        F.sum("_needs_c").alias("_nc"),
        F.sum("_backoff").alias("backoff_tokens"),
    )
    return agg.crossJoin(F.broadcast(total)).select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("backoff_tokens").cast("long").alias("backoff_tokens"),
        (F.col("_ssum") - F.col("_nc") * r1000(F.col("_C")))
        .cast("long")
        .alias("logprob_millinat"),
    )


def readability_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Classic readability counts + Flesch reading-ease in integer
    milli-units — the cheap educational-quality proxy (the signal
    FineWeb-Edu-style classifiers learn sits heavily on sentence and word
    length): ``n_words`` (whitespace tokens), ``n_sentences``
    (``[.!?]`` runs, floor 1), ``n_syllables`` (per-word vowel-group
    count with the silent-e heuristic, each word floored at 1), and
    ``flesch_milli`` =
    ``round(1000 * (206.835 - 1.015*W/S - 84.6*Syl/W))``.

    Determinism discipline: the three counts are exact integers from
    ``regexp_count`` / ``size`` (pure JVM, narrow projection, no
    shuffle); the single float expression at the end is one
    multiply-divide chain rounded once to milli-units — the
    resample_temperature pinning pattern, replayed by the DuckDB oracle.
    Syllables use the standard heuristic (count ``[aeiouy]+`` groups,
    subtract word-final silent ``e``), which is what every Flesch
    implementation ships; the score ranks documents, it does not claim
    linguistics.
    """
    # every count runs over the whitespace-NORMALIZED lowercased form: no
    # newlines means '$' agrees between Java regex and RE2 (Java '$' also
    # matches before a trailing line terminator), and a literal-space
    # alternation replaces lookahead, which RE2 does not support at all
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    n_words = F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " "))).cast(
        "long"
    )
    n_sentences = F.greatest(
        F.regexp_count(norm, F.lit(r"[.!?]+")).cast("long"), F.lit(1).cast("long")
    )
    # syllables PER WORD (floor 1 each — the documented Flesch heuristic):
    # vowel-group count minus word-final silent-e ('le' endings keep their
    # syllable: "table" -> ta-ble), floored at 1 so vowel-less tokens
    # (numbers, acronyms, "tsk") still contribute — a global floor would
    # let vowel-rich neighbors absorb them and inflate the score for
    # exactly the noisy documents this proxy should rank lower
    word_syl = lambda x: F.greatest(
        F.regexp_count(x, F.lit(r"[aeiouy]+")).cast("long")
        - x.rlike(r"[b-df-km-np-tv-z]e$").cast("long"),
        F.lit(1).cast("long"),
    )
    n_syllables = F.when(norm == "", F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.split(norm, " "), F.lit(0).cast("long"), lambda acc, x: acc + word_syl(x)
        )
    )
    flesch = F.round(
        (
            F.lit(206.835)
            - F.lit(1.015) * n_words.cast("double") / n_sentences.cast("double")
            - F.lit(84.6) * n_syllables.cast("double") / n_words.cast("double")
        )
        * 1000
    ).cast("bigint")
    return docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
        F.when(n_words > 0, flesch).alias("flesch_milli"),
    )


def split_sentences(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic rule-based sentence segmentation: one row per
    sentence, ``(id, sent_id, sentence)`` — the primitive that
    sentence-aware chunking and per-sentence scoring build on
    (char-window ``chunk_documents`` cuts mid-sentence by construction).

    Rule: a sentence boundary is a ``[.!?]+`` run followed by a single
    space (the whitespace-normalized form has no other whitespace). The
    terminator stays with its sentence; empty segments are dropped.
    Deliberately engine-portable — no lookbehind (RE2 has none): the
    boundary is marked by a capture-group replace that appends a \\x01
    sentinel (each engine spells its own backreference — ``$1`` in Java,
    ``\\1`` in RE2 — producing identical strings), then one split +
    posexplode. Non-whitespace C0 controls (incl. a pre-existing \\x01,
    which would otherwise collide with the sentinel and fabricate
    phantom boundaries) are stripped first — mis-decoded legacy text
    carries them, and route such docs through ``encoding_quality``
    anyway. Pure JVM generated-column pass: no shuffle, no Python;
    abbreviation handling ("Dr. Smith") is out of scope for the rule and
    documented as such — the contract is determinism and portability,
    not linguistics.
    """
    scrubbed = F.regexp_replace(
        F.col(text_col), r"[\x00-\x08\x0e-\x1f\x7f]", ""
    )
    norm = F.trim(F.regexp_replace(scrubbed, r"\s+", " "))
    marked = F.regexp_replace(norm, r"([.!?]+) ", "$1\x01")
    sents = F.filter(F.split(marked, "\x01"), lambda s: F.trim(s) != "")
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.posexplode(sents).alias("sent_id", "sentence"))
    )


def token_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution — the
    lexical-diversity gate: near-zero entropy is keyword-stuffing /
    repeated-phrase spam ("buy now buy now ..."), entropy near its
    ln(n_tokens) ceiling is diverse prose. Complements repetition_ratio
    (which sees ORDERED k-gram repeats; entropy sees skew in the bag of
    words even when no 5-gram ever repeats) and unigram_logprob (which
    scores tokens against the CORPUS model; entropy is corpus-free).

    Returns ``(id, n_tokens, entropy, entropy_norm)`` for documents with
    >= 1 token: ``entropy = ln(N) - (1/N) * sum_t c_t ln(c_t)`` in nats
    over the doc's own term counts, and ``entropy_norm = entropy/ln(N)``
    in [0, 1] (0.0 by convention for single-token docs, whose ceiling is
    ln(1) = 0). Gate on entropy_norm: it is length-independent.

    Determinism discipline (the unigram_logprob recipe): per distinct
    (doc, term) the contribution is ``c * round(ln(c)*1000)`` — a bigint
    millinat, rounded ONCE per term in a generated column — so the
    per-doc sum is exact integer math in any partition order; the float
    division and single ln(N) happen once per row at the end, rounded to
    6 decimals. Per-term millinat rounding can land up to ~5e-4 BELOW
    zero on all-identical-token docs (N * round(ln N) millinats slightly
    exceeds N ln N), so the value is clamped at 0.0 before the final
    rounding — the documented [0, 1] contract holds exactly. Shuffle
    shape: one map-side-combinable (doc, term) count, one per-doc
    aggregate. No Python anywhere.
    """
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    tc = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per_doc = tc.groupBy(id_col).agg(
        F.sum("_c").alias("n_tokens"),
        F.sum(
            (F.col("_c") * F.round(F.log(F.col("_c")) * 1000).cast("bigint"))
        ).alias("_s"),
    )
    ent = F.greatest(
        F.log(F.col("n_tokens")) - F.col("_s") / 1000.0 / F.col("n_tokens"),
        F.lit(0.0),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        F.round(ent, 6).alias("entropy"),
        F.when(F.col("n_tokens") <= 1, F.lit(0.0))
        .otherwise(F.round(ent / F.log(F.col("n_tokens")), 6))
        .alias("entropy_norm"),
    )
