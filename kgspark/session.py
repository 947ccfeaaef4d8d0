"""SparkSession factory tuned for the KG-construction workload.

Defaults target the sandbox (single-JVM local[N]) but every knob is the one
you would set on a 1000-executor cluster too: AQE on (runtime coalesce +
skew-join splits), shuffle partitions sized to parallelism, Arrow enabled for
the pandas-UDF extraction stages, UTC session timezone so results compare
bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "kgspark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    # Spark's Python workers inherit env from the JVM (launched from this
    # process): put the repo root on PYTHONPATH *before* the JVM starts so
    # `import kgspark` resolves in workers regardless of the caller's cwd.
    # (Cluster deployments pass the package explicitly via --py-files; see
    # also __spark_entry__._ship_package for externally-created sessions.)
    repo_root = str(Path(__file__).resolve().parent.parent)
    pypath = os.environ.get("PYTHONPATH", "")
    if repo_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{pypath}" if pypath else repo_root
        )
    # ~2 partitions/core keeps all cores busy through stragglers without
    # drowning small stages in task overhead; at cluster scale this knob is
    # replaced by AQE target sizes, which are enabled below.
    shuffle_partitions = shuffle_partitions or max(cpus, 2 * cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("KGSPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
