"""X6: dictionary/alias-trie mention detection + candidate-entity scoring.

The reference's only "linking" is exact-name MERGE plus a fixed-keyword
CONTAINS scan (neo4j_loader.py:122,254-266 — a handful of keywords, so a
broadcast nested-loop join suffices there; see
construct.triples.keyword_contains_join). At web scale the dictionary is
10^4..10^6 aliases, so per-keyword scans are O(|dict| * corpus): instead one
Aho-Corasick pass per document finds all alias hits in O(len(text)).

The automaton is built once per Python worker from the broadcast alias list
(lazy module-level cache keyed by the alias tuple's hash) and applied inside
mapInPandas — Arrow batches in, (url, alias, label, name) hit rows out.

Candidate scoring: an alias shared by entities of several labels (e.g. a
drug name equal to a disease name) yields multiple candidates per hit;
``score_candidates`` ranks candidates per alias by corpus frequency
(argmax via two-phase count + max_by), the standard first-pass EL scorer.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class AhoCorasick:
    """Minimal Aho-Corasick automaton over unicode chars (stdlib-only)."""

    def __init__(self, patterns: list[str]) -> None:
        # trie as list of dicts; outputs per node
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[str]] = [[]]
        self.fail: list[int] = [0]
        for p in patterns:
            if not p:
                continue
            node = 0
            for ch in p:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    self.fail.append(0)
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append(p)
        # BFS failure links
        q: deque[int] = deque()
        for child in self.goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for ch, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != child else 0
                self.out[child].extend(self.out[self.fail[child]])

    def find_all(self, text: str) -> list[tuple[int, str]]:
        """All (end_offset, pattern) matches, overlapping included."""
        hits: list[tuple[int, str]] = []
        node = 0
        for i, ch in enumerate(text):
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            for p in self.out[node]:
                hits.append((i, p))
        return hits


_AUTOMATON_CACHE: dict[int, AhoCorasick] = {}


def _automaton_for(aliases: tuple[str, ...]) -> AhoCorasick:
    key = hash(aliases)
    ac = _AUTOMATON_CACHE.get(key)
    if ac is None:
        ac = AhoCorasick(list(aliases))
        _AUTOMATON_CACHE.clear()  # one dictionary per job; don't hoard old ones
        _AUTOMATON_CACHE[key] = ac
    return ac


def detect_mentions(pages: DataFrame, alias_df: DataFrame, text_col: str = "text") -> DataFrame:
    """(url, text) x alias dict -> one row per alias hit per document.

    ``alias_df``: (alias, label, name) — alias is the surface form, (label,
    name) the candidate entity. Dimension-scale: collected to the driver and
    shipped in the task closure (same budget as a broadcast variable).
    Output: (url, alias, label, name, n_hits) with n_hits = occurrences of
    the alias in the document.
    """
    alias_rows = alias_df.select("alias", "label", "name").collect()
    candidates: dict[str, list[tuple[str, str]]] = {}
    for r in alias_rows:
        candidates.setdefault(r["alias"], []).append((r["label"], r["name"]))
    aliases = tuple(sorted(candidates))

    cols = pages.select("url", F.col(text_col).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ac = _automaton_for(aliases)
        for pdf in batches:
            out: dict[str, list] = {"url": [], "alias": [], "label": [], "name": [], "n_hits": []}
            for url, text in zip(pdf["url"], pdf["text"]):
                if not text:
                    continue
                counts: dict[str, int] = {}
                for _end, pat in ac.find_all(text):
                    counts[pat] = counts.get(pat, 0) + 1
                for alias, n in counts.items():
                    for label, name in candidates[alias]:
                        out["url"].append(url)
                        out["alias"].append(alias)
                        out["label"].append(label)
                        out["name"].append(name)
                        out["n_hits"].append(n)
            yield pd.DataFrame(out)

    return cols.mapInPandas(
        run, schema="url string, alias string, label string, name string, n_hits long"
    )


def score_candidates(mentions: DataFrame) -> DataFrame:
    """Rank candidate entities per alias by total corpus frequency.

    Two-phase hash aggregate then argmax — returns one winning (label, name)
    per alias with its support count.
    """
    freq = mentions.groupBy("alias", "label", "name").agg(
        F.sum("n_hits").alias("support")
    )
    return freq.groupBy("alias").agg(
        F.max_by(F.struct("label", "name"), F.struct(F.col("support"), F.col("name"))).alias("best"),
        F.max("support").alias("support"),
    ).select("alias", F.col("best.label").alias("label"), F.col("best.name").alias("name"), "support")


_PREFIX_SET_CAP = 4096  # per-length distinct 2-char-prefix sets above this ship no filter


def _alias_length_prefixes(
    alias_df: DataFrame, prefix_cap: int = _PREFIX_SET_CAP
) -> dict[int, tuple[str, ...] | None]:
    """Per alias length: the distinct 2-char prefixes of that length's
    aliases, or None when the set exceeds ``prefix_cap`` (filter would be
    bigger than it is selective). One small aggregate over the dictionary;
    the result is {length: prefixes} — bounded by lengths x cap, never by
    dictionary size, so it ships in the plan even in the beyond-broadcast
    regime."""
    rows = (
        alias_df.select(
            F.length("alias").alias("l"),
            F.substring("alias", 1, 2).alias("p"),
        )
        .filter(F.col("l") > 0)
        .groupBy("l")
        .agg(F.collect_set("p").alias("ps"))
        .select("l", F.when(F.size("ps") <= prefix_cap, F.col("ps")).alias("ps"))
        .collect()
    )
    return {
        int(r["l"]): (tuple(sorted(r["ps"])) if r["ps"] is not None else None)
        for r in rows
    }


def detect_mentions_join(
    pages: DataFrame, alias_df: DataFrame, text_col: str = "text",
    prefix_cap: int = _PREFIX_SET_CAP,
) -> DataFrame:
    """Beyond-broadcast tier of X6: same output contract as
    ``detect_mentions`` — (url, alias, label, name, n_hits) — for alias
    dictionaries too large to ship to workers (10^8+ surface forms at the
    10^12-doc north star: tens of GB, no closure/broadcast budget).

    Plan: explode each document into its character substrings of exactly
    the lengths present in the dictionary (JVM-side transform over an index
    sequence; the distinct-length set is tiny and collected driver-side),
    prefilter each length's substrings against that length's distinct
    2-char alias prefixes (an InSet literal — map-side, inside codegen, no
    broadcast), count duplicates per document map-side, then ONE shuffle
    equi-join against the alias table. Semantics are identical to the
    Aho-Corasick pass by construction: every substring occurrence of every
    alias — overlaps included — survives the prefilter (an alias's own
    prefix is always in its length's prefix set), and the automaton finds
    exactly the substring occurrences.

    Cost model vs the trie tier: the exploded side is
    |distinct alias lengths| x corpus characters BEFORE the prefix filter;
    the filter cuts it by the prefix hit rate (measured in SCALE.md §6)
    before any shuffle. Per-length prefix sets above ``prefix_cap`` ship no
    filter (a near-universal prefix set filters nothing — the cap keeps the
    plan literal bounded); ``mention_join_stats`` audits the exploded-side
    volume and filter selectivity per length so the cost is never silent.
    Use the trie tier whenever the dictionary fits the closure budget —
    this tier is for when it cannot.
    """
    prefixes = _alias_length_prefixes(alias_df, prefix_cap)
    lengths = sorted(prefixes)
    if not lengths:
        return pages.sparkSession.createDataFrame(
            [], "url string, alias string, label string, name string, n_hits long"
        )
    text = F.col(text_col)
    # guard: Spark's sequence(1, stop) runs DESCENDING when stop < 1, so a
    # doc shorter than the alias length must yield an empty index array.
    # NB the lambda must be unary — transform() dispatches on lambda arity,
    # so a `lambda i, L=L` default-arg capture would be bound as the
    # (element, index) form with L silently receiving the array index.
    def _window(length: int):
        return lambda i: text.substr(i, F.lit(length))

    def _with_prefix_filter(arr, length: int):
        ps = prefixes[length]
        if ps is None:
            return arr
        return F.filter(arr, lambda s: s.substr(1, 2).isin(*ps))

    per_len = [
        _with_prefix_filter(
            F.transform(
                F.when(
                    F.length(text) >= L, F.sequence(F.lit(1), F.length(text) - (L - 1))
                ).otherwise(F.array().cast("array<int>")),
                _window(L),
            ),
            L,
        )
        for L in lengths
    ]
    cand = (
        pages.filter(text.isNotNull())
        .select("url", F.explode(F.flatten(F.array(*per_len))).alias("alias"))
        .groupBy("url", "alias")
        .agg(F.count("*").alias("n_hits"))
    )
    return cand.join(alias_df.select("alias", "label", "name"), "alias").select(
        "url", "alias", "label", "name", "n_hits"
    )


def mention_join_stats(
    pages: DataFrame, alias_df: DataFrame, text_col: str = "text",
    prefix_cap: int = _PREFIX_SET_CAP,
) -> DataFrame:
    """Audit the join tier's exploded-side cost per alias length BEFORE
    running it (the lsh_bucket_stats pattern): one row per length with the
    substring rows that length generates, how many survive the 2-char
    prefix prefilter, and whether the filter ships at all. Run on a corpus
    sample when sizing a new dictionary — a length whose filtered volume
    still dwarfs the rest means the dictionary needs splitting (short
    aliases -> trie tier, long tail -> join tier)."""
    prefixes = _alias_length_prefixes(alias_df, prefix_cap)
    text = F.col(text_col)
    docs = pages.filter(text.isNotNull()).select(F.length(text).alias("n"))
    per_len = []
    for L, ps in sorted(prefixes.items()):
        raw = F.sum(F.greatest(F.col("n") - (L - 1), F.lit(0))).alias("raw_substrings")
        per_len.append(
            docs.agg(raw).select(
                F.lit(L).alias("length"),
                F.col("raw_substrings"),
                F.lit(ps is not None).alias("prefilter_ships"),
                F.lit(len(ps) if ps is not None else None).alias("n_prefixes"),
            )
        )
    out = per_len[0]
    for df in per_len[1:]:
        out = out.unionByName(df)
    return out


def mention_snippets(
    pages: DataFrame,
    alias_df: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    *,
    window: int = 30,
) -> DataFrame:
    """KWIC (keyword-in-context) concordance: one row PER OCCURRENCE of
    each alias — ``(id, alias, pos, left_ctx, right_ctx)`` with ``pos``
    the 0-based character offset and ``window``-char contexts either
    side. The human-review surface behind mention detection: an
    annotator (or an LLM labeling pass) judges candidate entity links
    from the snippet, never the whole page — so only snippets, not
    documents, leave the cluster.

    Pure JVM, no Python tier: occurrence positions come from splitting
    on the alias (regex-escaped) — occurrence i sits after the first i
    parts, so its offset is a running sum of part lengths plus
    i * len(alias), computed as ONE window over (doc, alias, part_idx)
    riding the explode. Non-overlapping left-to-right occurrences —
    the same convention as the replace-count oracle (n_hits) so
    counts agree. Aliases are dimension-scale: the pairing is a
    broadcast NLJ gated by ``contains`` (the j5/keyword_contains_join
    shape); only matching (doc, alias) rows explode.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    from pyspark.sql import Window as W

    esc = F.regexp_replace(
        F.col("alias"), r"([.^$|?*+()\[\]{}\\])", r"\\$1"
    )
    text = F.col(text_col)
    hits = (
        pages.select(F.col(id_col).alias("_id"), text.alias("_t"))
        .filter(F.col("_t").isNotNull())
        .join(
            F.broadcast(
                alias_df.select("alias")
                .filter(F.length("alias") > 0)  # '' would split per char
                .distinct()
            )
        )
        .filter(F.col("_t").contains(F.col("alias")))
        .select("_id", "alias", "_t", F.split("_t", esc).alias("_parts"))
    )
    parts = hits.select(
        "_id", "alias", "_t",
        F.posexplode("_parts").alias("_i", "_part"),
        (F.size("_parts") - 1).alias("_n"),
    ).filter(F.col("_i") < F.col("_n"))
    w = (
        W.partitionBy("_id", "alias")
        .orderBy("_i")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pos = (
        F.sum(F.length("_part")).over(w)
        + F.col("_i") * F.length("alias")
    ).alias("pos")
    out = parts.select("_id", "alias", "_t", pos)
    left_start = F.greatest(F.col("pos") - window + 1, F.lit(1))
    return out.select(
        F.col("_id").alias(id_col),
        "alias",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("_t").substr(
            left_start, F.least(F.col("pos"), F.lit(window))
        ).alias("left_ctx"),
        F.col("_t").substr(
            F.col("pos") + F.length("alias") + 1, F.lit(window)
        ).alias("right_ctx"),
    )
