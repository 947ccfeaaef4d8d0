"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full KG construction (rule-compiled triples ->
MERGE canonicalization -> nodes/edges) over the sf0.001 TPC-H-ish tables.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator family
from SURVEY.md §2 plus the training-data ops, each with a DuckDB-equivalent
ANSI SQL oracle unless genuinely non-SQL-expressible (minhash/simhash
signatures — recorded as rows-only checks).

Column-name/type discipline: every computed column is aliased identically in
the Spark plan and the SQL; aggregates over doubles are rounded (or summed as
decimals) so value hashes match bit-for-bit across engines.
"""

from __future__ import annotations

import sys
import zipfile
from collections.abc import Callable
from pathlib import Path
from tempfile import mkdtemp

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

# make `import kgspark` work no matter where this file was imported from
_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Ship kgspark to the executors' Python workers (addPyFile — the
    spark-submit --py-files mechanism). Needed when the driver's session was
    created from a cwd that doesn't contain the repo: the driver process can
    import kgspark via sys.path, but worker processes cannot."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    zpath = Path(mkdtemp(prefix="kgspark_pyfiles_")) / "kgspark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted((_REPO / "kgspark").rglob("*.py")):
            z.write(p, p.relative_to(_REPO))
    spark.sparkContext.addPyFile(str(zpath))
    _SHIPPED.add(key)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """KG build over sf0.001: returns resolved distinct edges (names)."""
    _ship_package(spark)
    from kgspark.construct.reference_build import triples_with_names
    from kgspark.tpch_graph import build_tpch_graph

    nodes, edges = build_tpch_graph(spark, "/root/testdata/sf0.001")
    return triples_with_names(nodes, edges)


# ---------------------------------------------------------------------------
# queries — each callable: (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------
def _q1_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def _s1_scan_projection(spark, sf):
    return (
        _t(spark, sf, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "n_chars", "source")
    )


_S1_SQL = "SELECT doc_id, n_chars, source FROM documents WHERE lang = 'en'"


def _p2_rename_projection(spark, sf):
    return (
        _t(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "FURNITURE")
        .select(F.col("c_custkey").alias("cust_id"), F.col("c_acctbal").alias("balance"))
    )


_P2_SQL = "SELECT c_custkey AS cust_id, c_acctbal AS balance FROM customer WHERE c_mktsegment = 'FURNITURE'"


def _p3_blank_filter(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.filter(F.col("text").isNotNull() & (F.trim(F.col("text")) != ""))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


_P3_SQL = """
SELECT lang, count(*) AS n_docs FROM documents
WHERE text IS NOT NULL AND trim(text) <> '' GROUP BY lang
"""


def _p5_contains_filter(spark, sf):
    return (
        _t(spark, sf, "documents")
        .filter(F.col("text").contains("spark"))
        .select("doc_id", "lang")
    )


_P5_SQL = "SELECT doc_id, lang FROM documents WHERE contains(text, 'spark')"


def _p8_json_cast_filter(spark, sf):
    e = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.filter(k <= 20).select("event_id", k.alias("k"))


_P8_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events WHERE CAST(json_extract_string(props, '$.k') AS INT) <= 20
"""


def _e1_explode_tokens(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


_E1_SQL = """
SELECT token, count(*) AS n FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
) WHERE token <> '' GROUP BY token
"""


def _e4_bigram_triples(spark, sf):
    d = _t(spark, sf, "documents")
    words = F.split("text", " ")
    pairs = F.zip_with(
        F.expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"),
        F.expr("slice(split(text, ' '), 2, size(split(text, ' ')) - 1)"),
        lambda a, b: F.struct(a.alias("subj"), b.alias("obj")),
    )
    return (
        d.select(F.explode(pairs).alias("p"))
        .select(F.col("p.subj").alias("subj"), F.col("p.obj").alias("obj"))
        .filter((F.col("subj") != "") & (F.col("obj") != ""))
        .groupBy("subj", "obj")
        .agg(F.count("*").alias("n"))
    )


_E4_SQL = """
SELECT subj, obj, count(*) AS n FROM (
  SELECT w[i] AS subj, w[i + 1] AS obj
  FROM (SELECT string_split(text, ' ') AS w FROM documents) t,
       LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) g
) WHERE subj <> '' AND obj <> '' GROUP BY subj, obj
"""


def _a1_lww_canonicalize(spark, sf):
    e = _t(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.max_by("value", "event_id").alias("last_value"),
        F.max("event_id").alias("last_event_id"),
        F.count("*").alias("n_events"),
    )


_A1_SQL = """
SELECT user_id, arg_max(value, event_id) AS last_value,
       max(event_id) AS last_event_id, count(*) AS n_events
FROM events GROUP BY user_id
"""


def _a2_distinct_dedup(spark, sf):
    return _t(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


_A2_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def _a3_collect_set_str(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment"))).alias("segments"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )


_A3_SQL = """
SELECT n_name AS nation,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
       count(DISTINCT c_custkey) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def _kg_edges_tpch(spark, sf):
    from kgspark.construct.reference_build import triples_with_names
    from kgspark.tpch_graph import build_tpch_graph

    nodes, edges = build_tpch_graph(spark, sf)
    return triples_with_names(nodes, edges)


_KG_EDGES_SQL = """
SELECT c_name AS subj, 'Customer' AS subj_type, 'IN_NATION' AS pred,
       n_name AS obj, 'Nation' AS obj_type
FROM customer JOIN nation ON c_nationkey = n_nationkey
UNION
SELECT s_name, 'Supplier', 'IN_NATION', n_name, 'Nation'
FROM supplier JOIN nation ON s_nationkey = n_nationkey
UNION
SELECT n_name, 'Nation', 'IN_REGION', r_name, 'Region'
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def _kg_nodes_tpch(spark, sf):
    from kgspark.tpch_graph import build_tpch_graph

    nodes, _ = build_tpch_graph(spark, sf)
    return nodes.select("label", "name").orderBy("label", "name")


_KG_NODES_SQL = """
SELECT 'Customer' AS label, c_name AS name FROM customer
UNION
SELECT 'Supplier', s_name FROM supplier
UNION
SELECT 'Nation', n_name FROM nation
UNION
SELECT 'Region', r_name FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def _j2_onehop_expand(spark, sf):
    """1-hop expand from each Nation over the constructed graph: counts of
    in-linked customers/suppliers (the disease_expand shape, A3)."""
    from kgspark.construct.reference_build import triples_with_names
    from kgspark.tpch_graph import build_tpch_graph

    nodes, edges = build_tpch_graph(spark, sf)
    named = triples_with_names(nodes, edges)
    counts = (
        named.filter(F.col("obj_type") == "Nation")
        .groupBy(F.col("obj").alias("nation"))
        .agg(
            F.sum((F.col("subj_type") == "Customer").cast("int")).alias("n_customers"),
            F.sum((F.col("subj_type") == "Supplier").cast("int")).alias("n_suppliers"),
        )
    )
    all_nations = nodes.filter(F.col("label") == "Nation").select(
        F.col("name").alias("nation")
    )
    return all_nations.join(counts, "nation", "left").select(
        "nation",
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


_J2_SQL = """
SELECT n_name AS nation,
       (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers,
       (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) AS n_suppliers
FROM nation
"""


def _j3_reverse_join(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .filter(F.col("o_totalprice") > 100000)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_big_orders"))
    )


_J3_SQL = """
SELECT n_name AS nation, count(*) AS n_big_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_totalprice > 100000 GROUP BY n_name
"""


def _j4_twohop_bfs(spark, sf):
    """2-hop undirected BFS from Region 'AFRICA' over the constructed graph
    (J4 variable-length path, visited-dedup)."""
    from kgspark.query.subgraph import retrieve_subgraph
    from kgspark.tpch_graph import build_tpch_graph

    nodes, edges = build_tpch_graph(spark, sf)
    sub = retrieve_subgraph(nodes, edges, ["AFRICA"], hops=2, limit=10**9)
    return sub.nodes.select("label", "name", "hop")


_J4_SQL = """
WITH afr_nations AS (
  SELECT n_name FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AFRICA'
)
SELECT 'Region' AS label, 'AFRICA' AS name, 0 AS hop
UNION ALL
SELECT 'Nation', n_name, 1 FROM afr_nations
UNION ALL
SELECT 'Customer', c_name, 2 FROM customer
JOIN nation ON c_nationkey = n_nationkey WHERE n_name IN (SELECT n_name FROM afr_nations)
UNION ALL
SELECT 'Supplier', s_name, 2 FROM supplier
JOIN nation ON s_nationkey = n_nationkey WHERE n_name IN (SELECT n_name FROM afr_nations)
"""


def _j5_contains_join(spark, sf):
    d = _t(spark, sf, "documents")
    kws = spark.createDataFrame([("spark",), ("join",), ("window",)], "kw string")
    from kgspark.construct.triples import keyword_contains_join

    return keyword_contains_join(d, kws, "text").select("doc_id", "kw")


_J5_SQL = """
SELECT doc_id, kw FROM documents,
(SELECT 'spark' AS kw UNION ALL SELECT 'join' UNION ALL SELECT 'window') k
WHERE contains(text, kw)
"""


def _u1_union_by_name(spark, sf):
    c = _t(spark, sf, "customer").select(
        F.lit("Customer").alias("label"), F.col("c_name").alias("name")
    )
    s = _t(spark, sf, "supplier").select(
        F.lit("Supplier").alias("label"), F.col("s_name").alias("name")
    )
    return c.unionByName(s)


_U1_SQL = """
SELECT 'Customer' AS label, c_name AS name FROM customer
UNION ALL SELECT 'Supplier', s_name FROM supplier
"""


def _w1_hash_sample(spark, sf):
    """Deterministic 1/16 sample: md5 of the key (engine-portable 'rand')."""
    o = _t(spark, sf, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "a"
    ).select("o_orderkey", "o_totalprice")


_W1_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'a'
"""


def _w2_topk_limit(spark, sf):
    return (
        _t(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


_W2_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def _w3_topk_per_group(spark, sf):
    li = _t(spark, sf, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rk")
    )


_W3_SQL = """
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (
    PARTITION BY l_returnflag
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
  FROM lineitem
) WHERE rk <= 3
"""


def _w4_renumber(spark, sf):
    d = _t(spark, sf, "documents").filter(F.col("lang") == "de")
    return d.select(
        "doc_id", F.row_number().over(Window.orderBy("doc_id")).alias("new_id")
    )


_W4_SQL = """
SELECT doc_id, CAST(row_number() OVER (ORDER BY doc_id) AS INT) AS new_id
FROM documents WHERE lang = 'de'
"""


def _p6_rlike_filter(spark, sf):
    """P6: regex keyword filter (filter_disease.py:47-59 analog)."""
    return (
        _t(spark, sf, "documents")
        .filter(F.col("text").rlike("spark|merge"))
        .select("doc_id", "lang")
    )


_P6_SQL = "SELECT doc_id, lang FROM documents WHERE regexp_matches(text, 'spark|merge')"


def _f_string_funcs(spark, sf):
    """F1-F5/F9: trim, truncate-with-ellipsis, concat_ws, printf-format, cast."""
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.concat(F.substring(F.trim("text"), 1, 30), F.lit("...")).alias("preview"),
        F.concat_ws("|", "lang", "source").alias("tag"),
        F.format_string("%s/%d", F.col("lang"), F.col("n_chars")).alias("card"),
        F.col("n_chars").cast("string").alias("n_chars_str"),
    )


_F_STRING_SQL = """
SELECT doc_id,
       substring(trim(text), 1, 30) || '...' AS preview,
       concat_ws('|', lang, source) AS tag,
       printf('%s/%d', lang, n_chars) AS card,
       CAST(n_chars AS VARCHAR) AS n_chars_str
FROM documents
"""


def _f7_from_json(spark, sf):
    """F7: schema-declared JSON parse of the extractor-output analog."""
    e = _t(spark, sf, "events")
    parsed = F.from_json("props", "k int")
    return e.select("event_id", parsed["k"].alias("k_val")).filter(
        F.col("k_val").isNotNull()
    )


_F7_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val
FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
"""


def _x6_mentions(spark, sf):
    """X6: Aho-Corasick mention detection, oracled by occurrence counting
    (keywords chosen with no self-overlap so replace-counting agrees)."""
    from kgspark.extract.mentions import detect_mentions

    d = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    alias_df = spark.createDataFrame(
        [(w, "Term", w) for w in ["spark", "join", "window", "merge"]],
        "alias string, label string, name string",
    )
    m = detect_mentions(d, alias_df)
    return m.select(F.col("url").cast("long").alias("doc_id"), "alias", "n_hits")


_X6_SQL = """
SELECT doc_id, kw AS alias,
       (length(text) - length(replace(text, kw, ''))) // length(kw) AS n_hits
FROM documents,
     (SELECT 'spark' AS kw UNION ALL SELECT 'join'
      UNION ALL SELECT 'window' UNION ALL SELECT 'merge') k
WHERE contains(text, kw)
"""


def _f8_to_json(spark, sf):
    """F8: JSON serialization (filter_disease.py:103-104 analog)."""
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type")).alias("payload"),
    )


_F8_SQL = """
SELECT event_id, to_json(struct_pack(event_id := event_id, event_type := event_type)) AS payload
FROM events
"""


def _ngram_jaccard_pairs(spark, sf):
    """Exact char-5-gram Jaccard for every doc pair in a 100-doc slice
    (the verification kernel behind LSH candidate checking), JVM-side."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(norm) - 5, F.lit(0))),
            lambda i: norm.substr(i + 1, F.lit(5)),
        )
    )
    sh = d.select(F.col("doc_id"), shingles.alias("g"))
    a = sh.select(F.col("doc_id").alias("a"), F.col("g").alias("ga"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", F.round(inter / union, 6).alias("jaccard"))
    )


_NGRAM_JACCARD_SQL = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([substring(norm, i, 5) FOR i IN generate_series(1, greatest(len(norm) - 4, 1))]) AS g
  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm
        FROM documents WHERE doc_id < 100)
)
SELECT a.doc_id AS a, b.doc_id AS b,
       round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
             / len(list_distinct(a.g || b.g)), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
"""


def _dedup_exact(spark, sf):
    from kgspark.ops.dedup import exact_dedup

    return exact_dedup(_t(spark, sf, "documents")).select("doc_id", "n_dups")


_DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, count(*) AS n_dups FROM (
  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
) GROUP BY fp
"""


def _fingerprint_md5(spark, sf):
    from kgspark.ops.textstats import fingerprint

    return _t(spark, sf, "documents").select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


_FINGERPRINT_SQL = """
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
"""


def _lang_id(spark, sf):
    from kgspark.ops.textstats import lang_id

    return lang_id(_t(spark, sf, "documents")).select("doc_id", "lang_pred")


def _lang_hits_sql(code: str, words: list[str]) -> str:
    return " + ".join(
        f"CASE WHEN contains(' ' || lower(text) || ' ', ' {w} ') THEN 1 ELSE 0 END"
        for w in words
    )


def _lang_id_sql() -> str:
    from kgspark.ops.textstats import LANG_MARKERS

    h = {c: _lang_hits_sql(c, ws) for c, ws in LANG_MARKERS.items()}
    # argmax with lexicographically-largest-code tie-break (codes: de<en<es<fr)
    return f"""
SELECT doc_id,
  CASE
    WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
    WHEN fr = 0 AND es = 0 AND en = 0 AND de = 0 THEN 'und'
    WHEN fr >= es AND fr >= en AND fr >= de THEN 'fr'
    WHEN es >= en AND es >= de THEN 'es'
    WHEN en >= de THEN 'en'
    ELSE 'de'
  END AS lang_pred
FROM (
  SELECT doc_id, text, {h["en"]} AS en, {h["es"]} AS es, {h["de"]} AS de, {h["fr"]} AS fr
  FROM documents
)
"""


def _token_stats(spark, sf):
    from kgspark.ops.textstats import token_count_ws

    d = _t(spark, sf, "documents")
    bpe = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0)
    )
    return d.select(
        "doc_id",
        token_count_ws(F.col("text")).alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_check"),
    )


_TOKEN_STATS_SQL = r"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS INT) AS n_bpe_tokens,
       CAST(length(text) AS INT) AS n_chars_check
FROM documents
"""


def _quality_score(spark, sf):
    from kgspark.ops.textstats import quality_features

    return quality_features(_t(spark, sf, "documents")).select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
    )


_QUALITY_SQL = r"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
  round(length(regexp_replace(text, '[^.,;:!?。，；：！？]', '', 'g'))
        / greatest(length(text), 1), 6) AS punct_ratio,
  round((
    least(len(string_split_regex(trim(text), '\s+')) / 20.0, 1.0)
    + (1.0 - least(length(regexp_replace(text, '[^.,;:!?。，；：！？]', '', 'g'))
                   / greatest(length(text), 1) * 5.0, 1.0))
    + (1.0 - least(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                   / greatest(length(regexp_replace(text, '[^A-Za-z]', '', 'g')), 1) * 2.0, 1.0))
    + (CASE WHEN length(text) / greatest(len(string_split_regex(trim(text), '\s+')), 1)
             BETWEEN 3 AND 12 THEN 1.0 ELSE 0.3 END)
  ) / 4.0, 6) AS quality_score
FROM documents
"""


def _ann_cosine_topk(spark, sf):
    from kgspark.ops.similarity import cosine_topk_arrow

    emb = _t(spark, sf, "embeddings")
    qs = emb.filter(F.col("vec_id").isin(0, 1)).collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qs]
    return cosine_topk_arrow(emb, queries, k=5).select("query_id", "vec_id", "rank")


_ANN_SQL = """
SELECT query_id, vec_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         CAST(row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
         ) AS INT) AS rank
  FROM embeddings q, embeddings c
  WHERE q.vec_id IN (0, 1)
) WHERE rank <= 5
"""


def _curation_pipeline(spark, sf):
    """The training-data curation story in one plan: language gate ->
    quality gate -> exact dedup -> per-source token accounting. Composes
    lang_id + quality_features + fingerprint, all individually oracled."""
    from kgspark.ops.textstats import fingerprint, lang_id, quality_features

    d = _t(spark, sf, "documents")
    scored = lang_id(quality_features(d)).withColumn(
        "fp", fingerprint(F.col("text"))
    )
    kept = scored.filter(
        (F.col("lang_pred") == "en") & (F.col("quality_score") >= 0.5)
    )
    reps = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    final = reps.join(kept, ["fp", "doc_id"])
    return final.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def _curation_sql() -> str:
    from kgspark.ops.textstats import LANG_MARKERS

    h = {c: _lang_hits_sql(c, ws) for c, ws in LANG_MARKERS.items()}
    quality = r"""(
    least(len(string_split_regex(trim(text), '\s+')) / 20.0, 1.0)
    + (1.0 - least(length(regexp_replace(text, '[^.,;:!?。，；：！？]', '', 'g'))
                   / greatest(length(text), 1) * 5.0, 1.0))
    + (1.0 - least(length(regexp_replace(text, '[^A-Z]', '', 'g'))
                   / greatest(length(regexp_replace(text, '[^A-Za-z]', '', 'g')), 1) * 2.0, 1.0))
    + (CASE WHEN length(text) / greatest(len(string_split_regex(trim(text), '\s+')), 1)
             BETWEEN 3 AND 12 THEN 1.0 ELSE 0.3 END)
  ) / 4.0"""
    return f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         {quality} AS quality_score,
         CASE
           WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
           WHEN {h["fr"]} = 0 AND {h["es"]} = 0 AND {h["en"]} = 0 AND {h["de"]} = 0 THEN 'und'
           WHEN {h["fr"]} >= {h["es"]} AND {h["fr"]} >= {h["en"]} AND {h["fr"]} >= {h["de"]} THEN 'fr'
           WHEN {h["es"]} >= {h["en"]} AND {h["es"]} >= {h["de"]} THEN 'es'
           WHEN {h["en"]} >= {h["de"]} THEN 'en'
           ELSE 'de'
         END AS lang_pred,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
  FROM documents
), kept AS (
  SELECT * FROM scored WHERE lang_pred = 'en' AND quality_score >= 0.5
), reps AS (
  SELECT fp, min(doc_id) AS doc_id FROM kept GROUP BY fp
)
SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM reps JOIN kept USING (fp, doc_id) GROUP BY source
"""


def _embedding_neardup(spark, sf):
    from kgspark.ops.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(_t(spark, sf, "embeddings"), top_pairs=20)


_EMB_NEARDUP_SQL = """
SELECT a, b, round(CAST(sim AS DOUBLE), 6) AS sim FROM (
  SELECT e1.vec_id AS a, e2.vec_id AS b,
         list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]), CAST(e2.embedding AS DOUBLE[])) AS sim
  FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
) ORDER BY sim DESC, a, b LIMIT 20
"""


def _rollup_counts(spark, sf):
    """Grouping-set aggregation (rollup) over lineitem flags."""
    li = _t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def _sessionize(spark, sf):
    """Sessionization: 30-min inactivity gap splits a user's event stream."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    with_sess = e.withColumn("sess_idx", F.sum(new_sess).over(w))
    return with_sess.groupBy("user_id", "sess_idx").agg(
        F.min("ts").alias("session_start"),
        F.count("*").alias("n_events"),
    )


_SESSIONIZE_SQL = """
SELECT user_id, sess_idx, min(ts) AS session_start, count(*) AS n_events
FROM (
  SELECT user_id, ts, CAST(sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_idx
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_sess
    FROM events
  )
) GROUP BY user_id, sess_idx
"""


def _stream_window_counts(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


_STREAM_SQL = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
FROM events GROUP BY 1, 2
"""


def _minhash_dedup_docs(spark, sf):
    """Rows-only check (minhash signatures are not SQL-expressible)."""
    from kgspark.ops.dedup import minhash_dedup

    return minhash_dedup(_t(spark, sf, "documents"), threshold=0.8).select(
        "doc_id", "cluster", "is_representative"
    )


def _simhash_docs(spark, sf):
    """Rows-only check."""
    from kgspark.ops.dedup import simhash_dedup

    return simhash_dedup(_t(spark, sf, "documents"))


def _openie_web_corpus(spark, sf):
    """Rows-only check: deterministic web corpus -> OpenIE triple counts.

    (The extractor itself is pinned against a closed form in pytest; here the
    driver smoke-checks the distributed path at each sf.)
    """
    from kgspark import fixtures
    from kgspark.extract.html import with_extracted_text
    from kgspark.extract.openie import extract_doc_triples

    n_docs = max(1000, _t(spark, sf, "documents").count())
    pages = fixtures.web_pages_df(spark, n_docs)
    triples = extract_doc_triples(with_extracted_text(pages))
    return triples.groupBy("subj", "subj_type", "pred", "obj", "obj_type").agg(
        F.count("*").alias("n")
    )


def _shipped(fn: Callable) -> Callable:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = fn.__name__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        k: _shipped(v)
        for k, v in _raw_queries().items()
    }


def _raw_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": _q1_pricing_summary,
        "s1_scan_projection": _s1_scan_projection,
        "p2_rename_projection": _p2_rename_projection,
        "p3_blank_filter": _p3_blank_filter,
        "p5_contains_filter": _p5_contains_filter,
        "p8_json_cast_filter": _p8_json_cast_filter,
        "e1_explode_tokens": _e1_explode_tokens,
        "e4_bigram_triples": _e4_bigram_triples,
        "a1_lww_canonicalize": _a1_lww_canonicalize,
        "a2_distinct_dedup": _a2_distinct_dedup,
        "a3_collect_set_str": _a3_collect_set_str,
        "kg_nodes_tpch": _kg_nodes_tpch,
        "kg_edges_tpch": _kg_edges_tpch,
        "j2_onehop_expand": _j2_onehop_expand,
        "j3_reverse_join": _j3_reverse_join,
        "j4_twohop_bfs": _j4_twohop_bfs,
        "j5_contains_join": _j5_contains_join,
        "u1_union_by_name": _u1_union_by_name,
        "w1_hash_sample": _w1_hash_sample,
        "w2_topk_limit": _w2_topk_limit,
        "w3_topk_per_group": _w3_topk_per_group,
        "w4_renumber": _w4_renumber,
        "p6_rlike_filter": _p6_rlike_filter,
        "f_string_funcs": _f_string_funcs,
        "f7_from_json": _f7_from_json,
        "f8_to_json": _f8_to_json,
        "x6_mentions": _x6_mentions,
        "ngram_jaccard_pairs": _ngram_jaccard_pairs,
        "dedup_exact": _dedup_exact,
        "fingerprint_md5": _fingerprint_md5,
        "lang_id": _lang_id,
        "token_stats": _token_stats,
        "quality_score": _quality_score,
        "ann_cosine_topk": _ann_cosine_topk,
        "curation_pipeline": _curation_pipeline,
        "embedding_neardup": _embedding_neardup,
        "rollup_counts": _rollup_counts,
        "sessionize": _sessionize,
        "stream_window_counts": _stream_window_counts,
        "minhash_dedup_docs": _minhash_dedup_docs,
        "simhash_docs": _simhash_docs,
        "openie_web_corpus": _openie_web_corpus,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": _Q1_SQL,
        "s1_scan_projection": _S1_SQL,
        "p2_rename_projection": _P2_SQL,
        "p3_blank_filter": _P3_SQL,
        "p5_contains_filter": _P5_SQL,
        "p8_json_cast_filter": _P8_SQL,
        "e1_explode_tokens": _E1_SQL,
        "e4_bigram_triples": _E4_SQL,
        "a1_lww_canonicalize": _A1_SQL,
        "a2_distinct_dedup": _A2_SQL,
        "a3_collect_set_str": _A3_SQL,
        "kg_nodes_tpch": _KG_NODES_SQL,
        "kg_edges_tpch": _KG_EDGES_SQL,
        "j2_onehop_expand": _J2_SQL,
        "j3_reverse_join": _J3_SQL,
        "j4_twohop_bfs": _J4_SQL,
        "j5_contains_join": _J5_SQL,
        "u1_union_by_name": _U1_SQL,
        "w1_hash_sample": _W1_SQL,
        "w2_topk_limit": _W2_SQL,
        "w3_topk_per_group": _W3_SQL,
        "w4_renumber": _W4_SQL,
        "p6_rlike_filter": _P6_SQL,
        "f_string_funcs": _F_STRING_SQL,
        "f7_from_json": _F7_SQL,
        "f8_to_json": _F8_SQL,
        "x6_mentions": _X6_SQL,
        "ngram_jaccard_pairs": _NGRAM_JACCARD_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "fingerprint_md5": _FINGERPRINT_SQL,
        "lang_id": _lang_id_sql(),
        "token_stats": _TOKEN_STATS_SQL,
        "quality_score": _QUALITY_SQL,
        "ann_cosine_topk": _ANN_SQL,
        "curation_pipeline": _curation_sql(),
        "embedding_neardup": _EMB_NEARDUP_SQL,
        "rollup_counts": _ROLLUP_SQL,
        "sessionize": _SESSIONIZE_SQL,
        "stream_window_counts": _STREAM_SQL,
        # minhash_dedup_docs / simhash_docs / openie_web_corpus: rows-only
    }
