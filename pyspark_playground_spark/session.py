"""SparkSession factory tuned for this engine.

Local mode is the test harness; the configs are chosen to also be the right
defaults on a real cluster (AQE on, adaptive coalescing/skew-join on, Arrow
for the few Pandas-UDF paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyspark_playground_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Whole-stage-codegen class cache (default 100 entries): a driver
        # running this engine's query mix holds far more than 100 distinct
        # codegen units live (the PQ recall pipeline alone compiles ~91),
        # so at the default size the cache thrashes and every re-execution
        # re-runs Janino + JIT on identical source — measured 24 recompiled
        # units and 6-16 s of JIT-compiler time PER repeat execution of
        # pq_recall_embeddings, with nondeterministic 3-5x wall spikes as
        # compiler threads steal cores (and evictions bleed into
        # neighboring queries). At 5000 entries repeats recompile zero
        # units. Cost is driver metaspace for at most 5000 generated
        # classes — small against any production driver heap, and the
        # win is scale-independent (it is pure driver/JVM overhead).
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "5000"),
        )
    )
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
