"""KG construction demo over the driver-provided TPC-H-ish tables.

Exercises the real construction code path (rule-compiled triples ->
canonicalize -> nodes/edges) on relational inputs whose expected output is
plain SQL — which is what lets the DuckDB oracle in ``__spark_entry__.py``
check the KG operators end-to-end.

Mapping: Customer / Supplier / Nation / Region entities; IN_NATION and
IN_REGION edges derived from the foreign keys (resolved to names first —
entity identity in this engine is (label, name), SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark.construct import graph
from kgspark.construct.triples import triples_from_records
from kgspark.ontology import ScalarRule


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def build_tpch_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name"), F.col("n_regionkey")
    )
    region = load(spark, sf_dir, "region")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")

    # seq = source key, NOT monotonically_increasing_id: the latter depends on
    # partitioning, which would make last-write-wins tie-breaks (dup names)
    # change across cluster sizes — a determinism/resume violation. Names are
    # unique in these tables, but the invariant must not rely on that.
    cust = customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey).select(
        F.col("c_name").alias("name"),
        F.col("n_name").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_custkey").alias("seq"),
    )
    supp = supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey).select(
        F.col("s_name").alias("name"),
        F.col("n_name").alias("nation"),
        F.col("s_suppkey").cast("long").alias("seq"),
    )
    nat = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        F.col("n_name").alias("name"),
        F.col("r_name").alias("region"),
        F.col("n_nationkey").cast("long").alias("seq"),
    )

    triples = (
        triples_from_records(cust, [ScalarRule("Customer", "name", "IN_NATION", "Nation", "nation")])
        .unionByName(
            triples_from_records(supp, [ScalarRule("Supplier", "name", "IN_NATION", "Nation", "nation")])
        )
        .unionByName(
            triples_from_records(nat, [ScalarRule("Nation", "name", "IN_REGION", "Region", "region")])
        )
    )
    node_frames = [
        graph.node_records_from_source(cust, "Customer", ["segment"]),
        graph.node_records_from_source(supp, "Supplier", []),
        graph.node_records_from_source(nat, "Nation", []),
    ]
    return graph.build_graph(node_frames, triples)
