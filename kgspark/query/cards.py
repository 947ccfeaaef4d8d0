"""F5: context-card / prompt formatting — the reference's retrieval-to-text
templates as DataFrame string plans.

The reference formats every retrieval result into a Chinese "context card"
string before prompting the LLM (graph_retriever.py:64-75 disease card,
:84-86 covering-insurance line, :98-102 age line, :171-177 product card,
:218-240 nursing-home card, :244-245 empty-retrieval fallback). Here each
card is built with JVM-side string expressions (``concat``/``concat_ws``/
``format_string``/``substring``/``slice``/``array_join``) over the
retrieval DataFrames — per-row formatting stays in whole-stage codegen; the
final cross-card assembly collects only the LIMIT-bounded card rows
(5-20 per intent, driver-side by design like the reference).

Faithfulness notes:
- the reference truncates the product description at 50 chars and appends
  '...' UNCONDITIONALLY (f"{desc[:50]}..."), even for short descriptions —
  reproduced, not fixed;
- nursing-home services truncate at 100 chars only when longer (a real
  conditional there) — reproduced;
- list order inside cards: the reference takes Neo4j's nondeterministic
  collect() order; we sort lexicographically — the one deliberate deviation,
  per the engine-wide determinism-under-parallelism contract;
- the empty-retrieval fallback line and the '城市=None' Python-repr artifact
  in the header are reproduced verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _join5(col):
    """', '.join(xs[:5]) — the reference's per-group truncation (W3)."""
    return F.array_join(F.slice(col, 1, 5), ", ")


def disease_info_cards(expand_df: DataFrame) -> DataFrame:
    """disease_expand rows -> (disease, card) with the 【疾病信息】 template
    (graph_retriever.py:64-75): optional 简介/治疗 lines, first-5 症状/
    并发症/常用药物 lines — a line is omitted when its field is null/empty,
    exactly like the reference's ``if`` guards."""
    def line(prefix: str, value):
        return F.when(
            value.isNotNull() & (value != ""), F.concat(F.lit(f"  - {prefix}: "), value, F.lit("\n"))
        ).otherwise(F.lit(""))

    def list_line(prefix: str, arr):
        return F.when(
            F.size(arr) > 0, F.concat(F.lit(f"  - {prefix}: "), _join5(arr), F.lit("\n"))
        ).otherwise(F.lit(""))

    return expand_df.select(
        "disease",
        F.concat(
            F.lit("【疾病信息】"), F.col("disease"), F.lit(":\n"),
            line("简介", F.col("intro")),
            line("治疗", F.col("treat_detail")),
            list_line("症状", F.col("symptoms")),
            list_line("并发症", F.col("complications")),
            list_line("常用药物", F.col("drugs")),
        ).alias("card"),
    )


def covering_insurance_card(cov_df: DataFrame, disease: str) -> DataFrame:
    """insurance_covering rows -> one 【推荐保险】 line
    (graph_retriever.py:83-86): 'name (年龄限制: x)' items comma-joined."""
    items = cov_df.select(
        F.concat(
            F.col("ins_name"), F.lit(" (年龄限制: "), F.col("age_limit"), F.lit(")")
        ).alias("item")
    )
    # the reference appends this card only `if ins_list:` — empty -> no row
    return items.agg(
        F.count("*").alias("n"),
        F.concat(
            F.lit(f"【推荐保险】针对 {disease} 的相关保险产品: "),
            F.array_join(F.sort_array(F.collect_list("item")), ", "),
        ).alias("card"),
    ).where(F.col("n") > 0).select("card")


def age_insurance_card(age_df: DataFrame, age: int) -> DataFrame:
    """insurance_for_age rows -> one 【适老保险】 line
    (graph_retriever.py:96-102): 'name (age_limit)' items comma-joined."""
    items = age_df.select(
        F.concat(F.col("ins_name"), F.lit(" ("), F.col("age_limit"), F.lit(")")).alias("item")
    )
    return items.agg(
        F.count("*").alias("n"),
        F.concat(
            F.lit(f"【适老保险】适合 {age} 岁人群的保险产品: "),
            F.array_join(F.sort_array(F.collect_list("item")), ", "),
        ).alias("card"),
    ).where(F.col("n") > 0).select("card")


def insurance_product_cards(search_df: DataFrame, keyword: str | None = None) -> DataFrame:
    """insurance_search rows -> per-product 【产品】 cards plus the
    【保险产品库】 header row (graph_retriever.py:160-177). The unconditional
    desc[:50] + '...' truncation is reproduced; null category renders the
    reference's '未知' default."""
    per = search_df.select(
        "name",
        F.concat(
            F.lit("【产品】"), F.col("name"),
            F.lit("\n   - 险种: "), F.coalesce(F.col("category"), F.lit("未知")),
            F.lit("\n   - 投保年龄: "), F.coalesce(F.col("age_limit"), F.lit("")),
            F.lit("\n   - 描述: "), F.substring(F.coalesce(F.col("desc"), F.lit("")), 1, 50),
            F.lit("..."),
        ).alias("card"),
    )
    header = f"【保险产品库】(已根据关键词 '{keyword or '通用'}' 筛选):\n"
    return per.agg(
        F.count("*").alias("n"),
        F.concat(
            F.lit(header), F.array_join(F.sort_array(F.collect_list("card")), "\n")
        ).alias("card"),
    ).where(F.col("n") > 0).select("card")


def nursing_home_cards(
    nh_df: DataFrame, city: str | None = None, price_max: int | None = None
) -> DataFrame:
    """nursing_home_search rows -> the 【养老机构推荐】 block
    (graph_retriever.py:216-240): per-home detail cards with optional
    性质/床位/特色服务 lines (services >100 chars truncate + '...'), the
    filter-condition header, and the exact not-found fallback line when the
    search is empty."""
    svc = F.col("services")
    svc_trunc = F.when(
        F.length(svc) > 100, F.concat(F.substring(svc, 1, 100), F.lit("..."))
    ).otherwise(svc)

    def opt(prefix: str, value):
        return F.when(
            value.isNotNull() & (value != ""), F.concat(F.lit(f"\n  - {prefix}: "), value)
        ).otherwise(F.lit(""))

    per = nh_df.select(
        "name",
        F.concat(
            F.lit("【"), F.col("name"), F.lit("】"),
            F.lit("\n  - 价格: "), F.coalesce(F.col("price"), F.lit("")), F.lit("元/月"),
            F.lit("\n  - 地址: "), F.coalesce(F.col("address"), F.lit("")),
            opt("性质", F.col("nature")),
            opt("床位", F.col("beds")),
            opt("特色服务", svc_trunc),
        ).alias("card"),
    )
    header = (
        f"【养老机构推荐】(筛选条件: 城市={city or '不限'}, 预算<{price_max or '不限'}):\n"
    )
    fallback = f"【养老机构】未找到符合条件的养老院 (城市: {city}, 预算: {price_max})。"
    agg = per.agg(
        F.count("*").alias("n"),
        F.array_join(F.sort_array(F.collect_list("card")), "\n").alias("body"),
    )
    return agg.select(
        F.when(F.col("n") > 0, F.concat(F.lit(header), F.col("body")))
        .otherwise(F.lit(fallback))
        .alias("card")
    )


EMPTY_CONTEXT = "知识图谱检索完成，但在图谱中未发现与该特定实体或条件直接匹配的记录。"


def assemble_context(card_dfs: list[DataFrame]) -> str:
    """Collect the (LIMIT-bounded) card rows and join with blank lines —
    the reference's '\\n\\n'.join(context_parts) (graph_retriever.py:243-246)
    including its empty-retrieval fallback string."""
    parts: list[str] = []
    for df in card_dfs:
        for r in df.collect():
            if r["card"]:
                parts.append(r["card"])
    return "\n\n".join(parts) if parts else EMPTY_CONTEXT
