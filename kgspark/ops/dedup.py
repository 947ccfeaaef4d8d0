"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first:

- exact: hash-groupBy on a normalized fingerprint (two-phase aggregate);
- MinHash + LSH: shingle -> minhash signature (numpy, Arrow-batched) ->
  band buckets -> one-shuffle per-bucket pairing -> verified candidate pairs;
- SimHash: 64-bit signature, near-dups = identical signature (or banded
  prefixes for hamming<k);
- n-gram Jaccard: exact verification used on LSH candidates (and usable
  standalone on small sets).

Scale notes: the LSH pairing shuffles once on (band, bucket) — bucket keys
are xxhash64-derived (8-byte, uniformly distributed); per-group state is bounded by
``max_bucket_size``, and degenerate buckets (boilerplate corpora) are
dropped instead of exploding quadratically (``lsh_bucket_stats`` audits the
size distribution and what a given cap drops, so the cut is never silent).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.ops.textstats import fingerprint

# deterministic 64-bit mix constants (splitmix64) for minhash permutations
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact-normalized-text group."""
    keyed = df.withColumn("fp", fingerprint(F.col(text_col)))
    return (
        keyed.groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
        .join(keyed.select(id_col, text_col), id_col)
    )


_POLY_B = np.uint64(0x100000001B3)  # FNV-ish odd multiplier (wraps mod 2^64)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Byte-k-gram hash set (uint64) of whitespace-normalized text.

    Deterministic across processes and runs (unlike builtin ``hash``, which
    is seed-randomized and would make signatures drift between driver runs)
    and fully vectorized: sliding byte windows dot a power vector in uint64
    wraparound arithmetic; the splitmix-style mix in ``_minhash_signature``
    decorrelates the polynomial structure.
    """
    norm = " ".join(text.split()).lower().encode("utf-8")
    if len(norm) < k:
        norm = norm.ljust(k, b"\x00")
    arr = np.frombuffer(norm, dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(arr, k).astype(np.uint64)
    powers = _POLY_B ** np.arange(k, dtype=np.uint64)
    return np.unique(win @ powers)  # wraparound mod 2^64 intended


def _minhash_signature(hashes: np.ndarray, n_perm: int) -> np.ndarray:
    """Vectorized minhash: splitmix64-style mixes as the permutation family."""
    seeds = (np.arange(1, n_perm + 1, dtype=np.uint64) * _MIX1)[None, :]
    h = hashes[:, None] ^ seeds
    h = (h ^ (h >> np.uint64(30))) * _MIX2
    h = h ^ (h >> np.uint64(31))
    return h.min(axis=0)


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_perm: int = 64, shingle_k: int = 5,
) -> DataFrame:
    """(id, text) -> (id, sig array<long>) via Arrow-batched numpy minhash.

    Signatures are deterministic across runs and processes (vectorized
    polynomial byte-shingle hashing — no builtin ``hash``), so signature
    stores can be reused between jobs and reruns reproduce bit-identically.
    """
    cols = df.select(id_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                if not text:
                    sigs.append(np.zeros(n_perm, dtype=np.uint64))
                    continue
                sigs.append(_minhash_signature(_shingle_hashes(text, shingle_k), n_perm))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sig": [s.astype(np.int64) for s in sigs],
                }
            )

    return cols.mapInPandas(run, schema=f"{id_col} long, sig array<long>")


def _band_bucket_col(n_bands: int, rows_per_band: int):
    """(band, bucket) generator column over a ``sig`` array: xxhash64 hashes
    each band's array slice directly — no per-band string concat, and the
    shuffled bucket key is 8 bytes instead of a 32-char md5 hex (measured
    24% faster pairing at sf0.1, byte-identical pair set)."""
    return F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)),
        )
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", n_bands: int = 16,
    max_bucket_size: int = 1000, n_perm: int | None = None,
    distinct: bool = True, carry_sig: bool = False,
) -> DataFrame:
    """Band the signatures and pair up ids within each (band, bucket).

    rows_per_band = n_perm / n_bands. Returns distinct (a, b) with a < b.
    Buckets larger than ``max_bucket_size`` are dropped (boilerplate guard):
    a bucket of size m yields m²/2 pairs — one degenerate bucket can dwarf
    the whole job.

    ``distinct=False`` skips the final dedup shuffle and may emit the same
    (a, b) up to ``n_bands`` times (once per band the pair collides in).
    Callers that filter the pairs further (e.g. jaccard verification) should
    prefer deferring the distinct until after their filter: the candidate set
    is the largest intermediate in the dedup pipeline, and shuffling it just
    to drop a few percent of band-duplicates costs more than re-verifying
    them — the post-filter distinct then shuffles only survivors.

    ``carry_sig=True`` collects (id, sig) structs instead of bare ids, so the
    output carries ``sig_a``/``sig_b`` and downstream signature-agreement
    estimation needs NO pairs⋈sigs⋈sigs re-join (and the sigs frame has a
    single consumer — no cache). Trade-off, measured at sf0.1/local[32]:
    the banded shuffle grows by n_bands x sig bytes per doc (~8 KB/doc at
    64 perms/16 bands vs ~0.6 KB/doc bare), but it removes two corpus-scale
    shuffles of the signature table plus two shuffles of the (larger,
    band-duplicated) candidate set — net 1.7x faster end-to-end dedup here.
    At a corpus where candidates ≪ docs the byte balance flips; both paths
    stay supported and produce identical pairs.

    Physical plan: ONE shuffle — groupBy(band, bucket) collects the member
    list (bounded by ``max_bucket_size``, so per-group state is capped), then
    the a<b pairs are generated JVM-side from the sorted array with
    index-sliced transforms (only the i<j half is ever materialized).
    Measured 2.6x over the window-count + bucket-self-join formulation
    (3 shuffles) at sf0.1: both bucket sizing and pairing ride the same
    aggregate.
    """
    if n_perm is None:  # probe only when the caller didn't pass it (extra job)
        n_perm = len(sigs.select("sig").first()["sig"])
    rows_per_band = n_perm // n_bands
    member = (
        F.struct(F.col(id_col).alias("id"), F.col("sig").alias("sig"))
        if carry_sig
        else F.col(id_col)
    )
    banded = sigs.select(
        member.alias("m"),
        _band_bucket_col(n_bands, rows_per_band).alias("band", "bucket"),
    )
    buckets = (
        banded.groupBy("band", "bucket")
        # struct sort orders by first field (the id) -> same a<b order either way
        .agg(F.array_sort(F.collect_list("m")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size))
    )
    ids = F.col("ids")
    # for each i: pair ids[i] with every later element (array is sorted -> a<b)
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(ids) - 1),
            lambda i: F.transform(
                F.slice(ids, i + 1, F.size(ids) - i),
                lambda y: F.struct(
                    F.element_at(ids, i).alias("a"), y.alias("b")
                ),
            ),
        )
    )
    exploded = buckets.select(F.explode(pairs).alias("p"))
    if carry_sig:
        out = exploded.select(
            F.col("p.a.id").alias("a"),
            F.col("p.b.id").alias("b"),
            F.col("p.a.sig").alias("sig_a"),
            F.col("p.b.sig").alias("sig_b"),
        )
        return out.dropDuplicates(["a", "b"]) if distinct else out
    out = exploded.select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    return out.distinct() if distinct else out


def lsh_bucket_stats(
    sigs: DataFrame, id_col: str = "doc_id", n_bands: int = 16,
    max_bucket_size: int = 1000, n_perm: int | None = None,
) -> DataFrame:
    """Audit the LSH bucket-size distribution for a signature set: per bucket
    size, one row per (band, bucket) with ``dropped`` marking buckets the
    ``max_bucket_size`` cap would exclude from pairing. Run before committing
    a cap on a new corpus — a heavy-tailed distribution here means
    boilerplate (shared headers/footers) is bucketing everything together and
    the threshold (or shingle size) needs tuning."""
    if n_perm is None:
        n_perm = len(sigs.select("sig").first()["sig"])
    rows_per_band = n_perm // n_bands
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band", "bucket"),
    )
    return (
        banded.groupBy("band", "bucket")
        .agg(F.count("*").alias("size"))
        .withColumn("dropped", F.col("size") > max_bucket_size)
    )


def verify_jaccard(
    pairs: DataFrame, df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_k: int = 5, threshold: float = 0.8,
) -> DataFrame:
    """Exact char-n-gram Jaccard on candidate pairs (joins texts back in).

    Shingling is JVM-side: transform over a 0..len-k index sequence ->
    array_distinct -> intersection/union sizes. Returns (a, b, jaccard)
    for pairs at or above ``threshold``.

    Only documents that appear in some candidate pair are shingled: the
    corpus is semi-joined to the pair-id set first, so at 100 TB the
    (expensive) shingle arrays are built for the <1% of documents any LSH
    bucket paired, not the whole corpus.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(norm) - shingle_k, F.lit(0))),
            lambda i: norm.substr(i + 1, F.lit(shingle_k)),
        )
    )
    paired_ids = (
        pairs.select(F.col("a").alias(id_col))
        .union(pairs.select(F.col("b").alias(id_col)))
        .distinct()
    )
    sh = df.join(paired_ids, id_col, "left_semi").select(
        F.col(id_col), shingles.alias("shingles")
    )
    a = sh.select(F.col(id_col).alias("a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "a").join(b, "b")
        .withColumn("jaccard", (inter / F.greatest(union, F.lit(1))).cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_perm: int = 64, n_bands: int = 16, shingle_k: int = 5, threshold: float = 0.8,
    repartition: int | None = None,
) -> DataFrame:
    """Full near-dup pipeline: signatures -> LSH candidates -> Jaccard verify
    (estimated from signatures) -> connected components -> representative per
    duplicate cluster. Returns (doc_id, cluster, is_representative).

    ``repartition``: set when the input arrives in fewer splits than cores
    (e.g. one small parquet file -> one partition -> a *serial* Python
    signature stage); at corpus scale the input already has enough splits and
    forcing a shuffle of the text bytes would be a regression, so default None.
    """
    if repartition:
        df = df.repartition(repartition)
    # carry_sig=True: the pairing aggregate carries both signatures, so the
    # jaccard estimate below is a same-stage projection — no pairs⋈sigs⋈sigs
    # re-join, and sigs has exactly one consumer (no cache materialization).
    # distinct=False: band-duplicate pairs get re-estimated instead of paying
    # a full shuffle of the candidate set (measurement in
    # lsh_candidate_pairs' docstring); the distinct after the threshold
    # filter touches only survivors, typically orders of magnitude fewer.
    sigs = minhash_signatures(df, text_col, id_col, n_perm, shingle_k)
    pairs = lsh_candidate_pairs(
        sigs, id_col, n_bands, n_perm=n_perm, distinct=False, carry_sig=True
    )
    # signature-estimated jaccard: fraction of agreeing minhash positions
    est = (
        pairs.withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.lit(float(n_perm)),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b")
        .distinct()
    )
    from kgspark.extract.components import connected_components

    comp = connected_components(est, "a", "b")
    ids = df.select(id_col)
    clustered = ids.join(comp.withColumnRenamed("id", id_col), id_col, "left").select(
        id_col, F.coalesce("component", F.col(id_col)).alias("cluster")
    )
    return clustered.withColumn(
        "is_representative", F.col(id_col) == F.col("cluster")
    )


def lsh_candidate_pairs_incremental(
    new_sigs: DataFrame,
    existing_sigs: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 16,
    n_perm: int | None = None,
    max_bucket_size: int = 1000,
    broadcast_new_buckets: bool = True,
) -> DataFrame:
    """Candidate pairs between a NEW signature batch and a persisted store:
    ``(a, b, sig_a, sig_b)`` with ``a`` always a new id and ``b`` a store id
    or a larger new id — the store x store quadrant is never generated.

    Same single-shuffle bounded-bucket aggregate as ``lsh_candidate_pairs``
    (signatures carried, pairs generated JVM-side from the collected
    member array), with one extra trick for the incremental shape: the
    store is banded (a narrow 8-byte-key map pass, no text) and LEFT-SEMI
    pruned to the batch's bucket keys — broadcast when the batch is small —
    so store rows in buckets the batch never touches are dropped at the
    scan and never shuffle. Pairs may repeat across bands; callers filter
    then distinct (see ``lsh_candidate_pairs`` for the measured rationale).
    """
    if n_perm is None:
        n_perm = len(new_sigs.select("sig").first()["sig"])
    rows_per_band = n_perm // n_bands

    def band(sigs_df, is_new: bool):
        return sigs_df.select(
            F.struct(
                F.col(id_col).alias("id"),
                F.col("sig").alias("sig"),
                F.lit(is_new).alias("is_new"),
            ).alias("m"),
            _band_bucket_col(n_bands, rows_per_band).alias("band", "bucket"),
        )

    new_banded = band(new_sigs, True)
    keys = new_banded.select("band", "bucket").distinct()
    if broadcast_new_buckets:
        keys = F.broadcast(keys)
    old_banded = band(existing_sigs, False).join(keys, ["band", "bucket"], "left_semi")

    buckets = (
        old_banded.unionByName(new_banded)
        .groupBy("band", "bucket")
        # struct sort orders by id first -> deterministic pair order
        .agg(F.array_sort(F.collect_list("m")).alias("ids"))
        .filter(F.size("ids").between(2, max_bucket_size))
    )
    ids = F.col("ids")
    new_members = F.filter(ids, lambda m: m["is_new"])
    # each new member pairs with every store member and every LARGER new id:
    # new x new emitted once, store x store never
    pairs = F.flatten(
        F.transform(
            new_members,
            lambda n: F.transform(
                F.filter(
                    ids,
                    lambda m: (m["id"] != n["id"])
                    & ((~m["is_new"]) | (m["id"] > n["id"])),
                ),
                lambda m: F.struct(n.alias("n"), m.alias("m")),
            ),
        )
    )
    return buckets.select(F.explode(pairs).alias("p")).select(
        F.col("p.n.id").alias("a"),
        F.col("p.m.id").alias("b"),
        F.col("p.n.sig").alias("sig_a"),
        F.col("p.m.sig").alias("sig_b"),
    )


def minhash_dedup_incremental(
    new_docs: DataFrame,
    existing_sigs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.8,
    max_bucket_size: int = 1000,
    broadcast_new_buckets: bool = True,
) -> DataFrame:
    """Incremental near-dup dedup: one NEW crawl batch against a persisted
    signature store, without ever re-pairing the store against itself —
    the operational mode of a continuously-growing corpus, where re-running
    ``minhash_dedup`` over all 100 TB per batch is not an option.

    ``existing_sigs`` is the store: ``(id, sig)`` rows as produced by
    ``minhash_signatures`` (bit-deterministic across runs/processes, so
    they are written once and reused forever). Ids must be globally unique
    across store and batch. Returns one row per NEW document:
    ``(id, sig, cluster, is_duplicate)`` — ``cluster`` is the matched store
    id (store anchors win), else the min new id of its within-batch
    component, else itself. Append ``filter(~is_duplicate)`` rows to the
    store for the next batch.

    100 TB shape:
    - The store is only ever BANDED (a narrow map pass producing 8-byte
      bucket keys — no text, no Python) then LEFT-SEMI pruned to the new
      batch's bucket keys, broadcast when the batch is small (the typical
      case): store rows in buckets the batch never touches are filtered at
      the scan and never shuffle.
    - Pairing is the same single-shuffle bounded-bucket aggregate as
      ``lsh_candidate_pairs``, but pair generation emits only the
      new x (store ∪ new) quadrants JVM-side — store x store pairs are
      never materialized.
    - The candidate graph (matched docs only, orders of magnitude smaller
      than the batch) goes through ``connected_components``; store-vs-new
      membership is decided against the batch id set, so the store is
      never joined again.

    Greedy-incremental caveat (standard for signature-store dedup):
    transitive chains ACROSS batches resolve through store representatives,
    so a chain a~b~c split over two batches can keep c that a single-shot
    ``minhash_dedup`` over the union would fold; within one batch
    transitivity is exact.
    """
    # a store built with a different n_perm would silently mis-bucket every
    # band slice (wrong-recall, not an error) — probe ONE store row up front
    # (a LIMIT 1 scan reads one row group even on a 100 TB store)
    probe = existing_sigs.select("sig").first()
    if probe is not None and len(probe["sig"]) != n_perm:
        raise ValueError(
            f"existing_sigs carries {len(probe['sig'])}-perm signatures but "
            f"n_perm={n_perm}; rebuild the store or pass the matching n_perm"
        )
    new_sigs = minhash_signatures(new_docs, text_col, id_col, n_perm, shingle_k)
    # two consumers (banding + the final annotation join): materialize so the
    # Python signature stage runs once; batch-scale, not corpus-scale
    new_sigs = new_sigs.localCheckpoint(eager=True)
    exploded = lsh_candidate_pairs_incremental(
        new_sigs,
        existing_sigs,
        id_col=id_col,
        n_bands=n_bands,
        n_perm=n_perm,
        max_bucket_size=max_bucket_size,
        broadcast_new_buckets=broadcast_new_buckets,
    )
    est = (
        exploded.withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.lit(float(n_perm)),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b")
        .distinct()
    )

    from kgspark.extract.components import connected_components

    comp = connected_components(est, "a", "b")  # matched docs only
    # store membership = "not in the batch": decided against the (small)
    # batch id set so the store table is never touched again
    new_ids = new_sigs.select(F.col(id_col).alias("id"), F.lit(True).alias("_is_new"))
    roster = comp.join(new_ids, "id", "left")
    reps = (
        roster.groupBy("component")
        .agg(
            F.min(F.when(F.col("_is_new").isNull(), F.col("id"))).alias("_store_rep"),
            F.min("id").alias("_any_rep"),
        )
        .select("component", F.coalesce("_store_rep", "_any_rep").alias("_rep"))
    )
    labels = comp.join(reps, "component").select(
        F.col("id").alias(id_col), F.col("_rep").alias("cluster")
    )
    return (
        new_sigs.join(labels, id_col, "left")
        .select(
            id_col,
            "sig",
            F.coalesce("cluster", F.col(id_col)).alias("cluster"),
        )
        .withColumn("is_duplicate", F.col("cluster") != F.col(id_col))
    )


def embedding_neardup_pairs(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    top_pairs: int = 20, max_corpus_rows: int = 200_000,
) -> DataFrame:
    """Embedding-cosine near-dup candidates: the ``top_pairs`` most similar
    (a < b) pairs by exact cosine.

    Physical plan: the (dimension-scale) embedding matrix is shipped in the
    task closure; each Arrow batch computes batch x corpus cosine in one
    matmul, keeps a local top-k, and a global TakeOrdered finishes. This is
    the exact-verification kernel; at corpus scale the candidate set first
    shrinks through similarity.with_lsh_bucket so each batch compares only
    against its bucket's matrix.
    """
    import numpy as np
    import pandas as pd

    n = embeddings.count()
    if n > max_corpus_rows:
        raise ValueError(
            f"embedding_neardup_pairs is the exact all-pairs kernel for "
            f"dimension-scale inputs (got {n} rows > {max_corpus_rows}); at "
            f"corpus scale bucket first with similarity.with_lsh_bucket or "
            f"similarity.ivf_assign and run this kernel per bucket"
        )
    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows])
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)

    cols = embeddings.select(id_col, vec_col)

    def run(batches):
        for pdf in batches:
            b = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            b = b / np.linalg.norm(b, axis=1, keepdims=True)
            sims = b @ mat.T
            bids = pdf[id_col].to_numpy()
            out_a, out_b, out_s = [], [], []
            for i in range(len(b)):
                mask = ids > bids[i]  # a < b, no self-pairs
                if not mask.any():
                    continue
                cand = np.where(mask)[0]
                row = sims[i, cand]
                keep = cand[np.argsort(-row)[:top_pairs]]
                for j in keep:
                    out_a.append(int(bids[i]))
                    out_b.append(int(ids[j]))
                    out_s.append(float(sims[i, j]))
            yield pd.DataFrame({"a": out_a, "b": out_b, "sim": out_s})

    partial = cols.mapInPandas(run, schema="a long, b long, sim double")
    return (
        partial.orderBy(F.desc("sim"), F.col("a"), F.col("b"))
        .limit(top_pairs)
        .select("a", "b", F.round("sim", 6).alias("sim"))
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", shingle_k: int = 4
) -> DataFrame:
    """64-bit SimHash per document (numpy bit-count accumulation)."""
    cols = df.select(id_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                if not text:
                    out.append(0)
                    continue
                hs = _shingle_hashes(text, shingle_k)
                onebits = ((hs[:, None] >> bits) & np.uint64(1)).sum(axis=0)
                vote = onebits * 2 > len(hs)
                out.append(int(np.packbits(vote[::-1]).view(">u8")[0]))
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": np.array(out, dtype=np.uint64).astype(np.int64)})

    return cols.mapInPandas(run, schema=f"{id_col} long, simhash long")


def simhash_neardup_pairs(
    sigs: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, n_bands: int = 4
) -> DataFrame:
    """Hamming-distance near-dup search over 64-bit simhashes.

    Pigeonhole banding: two signatures within ``max_hamming`` (< n_bands)
    bits share at least one exact 16-bit band -> candidates are same-band
    joins (uniform bucket keys), verified exactly with bit_count(xor) —
    JVM-side, no Python. Returns (a, b, hamming) with a < b.
    """
    width = 64 // n_bands
    banded = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", b * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "band_val"),
    )
    a = banded.select(F.col("band"), F.col("band_val"), F.col(id_col).alias("a"), F.col("simhash").alias("sig_a"))
    b = banded.select(F.col("band"), F.col("band_val"), F.col(id_col).alias("b"), F.col("simhash").alias("sig_b"))
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup clusters = identical simhash (hamming-0 tier; banded
    hamming<k search is the LSH path above). Returns one representative per
    signature."""
    sigs = simhash_signatures(df, text_col, id_col)
    return sigs.groupBy("simhash").agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_dups")
    )


def winnow_containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_containment_ppm: int = 500_000,
    max_bucket_size: int = 256,
    hash: str = "md5",
) -> DataFrame:
    """Containment near-dup pairs over winnowed fingerprints — the Broder
    CONTAINMENT axis resemblance-based minhash cannot see: a small
    document wholly embedded in a large one (quoted articles, mirrored
    pages inside portals) has near-zero Jaccard resemblance but
    containment ~1. Estimator: |shared winnowed fingerprints| /
    |fingerprints of the SMALLER side| — winnowing's guarantee (every
    shared k+w-1-token run shares a fingerprint) makes the shared count
    track shared text locally, not just globally. Returns
    ``(a, b, shared, n_a, n_b, containment_ppm)`` for pairs at or above
    ``min_containment_ppm`` (exact-integer parts-per-million — the
    repo's fixed-point discipline, no float compare).

    Plan, the ``lsh_candidate_pairs`` shape on fingerprint buckets:
    winnow (one per-doc window pass) -> distinct (id, fp) -> groupBy(fp)
    collects the sorted member list with the same 2..``max_bucket_size``
    boilerplate guard (a fingerprint shared by thousands of docs is
    template noise and would emit m^2/2 pairs) -> JVM a<b slice-pairing
    -> groupBy(a, b) count IS the shared-fingerprint count (no distinct
    needed first: each fp contributes each pair once). Per-doc totals
    join onto the surviving pair set only — pairs ≪ docs, so AQE
    broadcasts the pair side against the corpus-scale size table rather
    than shuffling the corpus.
    """
    from kgspark.ops.textstats import winnow_fingerprints

    fps = (
        winnow_fingerprints(docs, text_col, id_col, k=k, w=w, hash=hash)
        .select(id_col, "fp")
        .distinct()
    )
    sizes = fps.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("n_fp"))
    buckets = (
        fps.groupBy("fp")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size))
    )
    ids = F.col("ids")
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(ids) - 1),
            lambda i: F.transform(
                F.slice(ids, i + 1, F.size(ids) - i),
                lambda y: F.struct(F.element_at(ids, i).alias("a"), y.alias("b")),
            ),
        )
    )
    shared = (
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    out = (
        shared.join(sizes.withColumnRenamed(id_col, "a").withColumnRenamed("n_fp", "n_a"), "a")
        .join(sizes.withColumnRenamed(id_col, "b").withColumnRenamed("n_fp", "n_b"), "b")
        .withColumn(
            "containment_ppm",
            F.expr("shared * 1000000L div least(n_a, n_b)"),
        )
        .filter(F.col("containment_ppm") >= min_containment_ppm)
    )
    return out.select("a", "b", "shared", "n_a", "n_b", "containment_ppm")


def shared_span_alignment(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    max_gap: int | None = None,
    hash: str = "md5",
) -> DataFrame:
    """Locate WHERE the shared text lives for verified near-dup /
    containment pairs — the forensics step after
    ``winnow_containment_pairs``: for each (a, b) pair, shared winnowed
    fingerprints carry a position in BOTH documents, and fingerprints of
    one contiguous shared region all lie on the same DIAGONAL
    (``pos_b - pos_a`` constant, the diff/LCS structure). Grouping by
    (pair, diagonal) and merging consecutive ``pos_a`` runs with gaps at
    most ``max_gap`` (default ``k + w - 1``: winnowing guarantees a
    selected fingerprint at least every ``w`` grams inside a shared run,
    and gram starts k-1 apart can touch) yields aligned token spans:
    ``(a, b, a_start, a_end, b_start, b_end, n_fps)``, 1-based inclusive
    token indices, ``b_* = a_* + diagonal``.

    Plan: the corpus-wide fingerprint table is first semi-joined to the
    pair ids (pairs ≪ corpus — broadcast), so the (fp, id)-keyed joins
    that attach ``pos_a``/``pos_b`` touch only the docs under
    investigation; one window per (pair, diagonal) does the
    gaps-and-islands merge (the ``repeated_spans`` pattern). Everything
    after winnowing is proportional to the pair set, not the corpus.
    """
    from kgspark.ops.textstats import winnow_fingerprints

    if max_gap is None:
        max_gap = k + w - 1
    p = pairs.select("a", "b")
    ids = p.select(F.col("a").alias("_id")).union(p.select("b")).distinct()
    fps = winnow_fingerprints(docs, text_col, id_col, k=k, w=w, hash=hash).join(
        ids, F.col(id_col) == F.col("_id"), "left_semi"
    )
    fa = fps.select(
        F.col(id_col).alias("a"), F.col("pos").alias("pos_a"), "fp"
    )
    fb = fps.select(
        F.col(id_col).alias("b"), F.col("pos").alias("pos_b"), "fp"
    )
    hits = (
        p.join(fa, "a")
        .join(fb, ["b", "fp"])
        .withColumn("diag", F.col("pos_b") - F.col("pos_a"))
    )
    win = Window.partitionBy("a", "b", "diag").orderBy("pos_a")
    prev = F.lag("pos_a").over(win)
    islands = hits.withColumn(
        "_new", F.when(prev.isNull() | (F.col("pos_a") - prev > max_gap), 1).otherwise(0)
    ).withColumn(
        "_isl", F.sum("_new").over(win.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy("a", "b", "diag", "_isl")
        .agg(
            F.min("pos_a").alias("a_start"),
            (F.max("pos_a") + F.lit(k - 1)).alias("a_end"),
            F.count(F.lit(1)).cast("long").alias("n_fps"),
        )
        .select(
            "a",
            "b",
            "a_start",
            "a_end",
            (F.col("a_start") + F.col("diag")).alias("b_start"),
            (F.col("a_end") + F.col("diag")).alias("b_end"),
            "n_fps",
        )
    )
