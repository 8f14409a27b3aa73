"""SparkSession factory with engine defaults.

Centralizes the configs that matter at scale (AQE, Arrow batch sizing,
shuffle partitions) so every entry point — tests, bench, spark-submit —
runs the same plan-shaping knobs.  ``parallelism`` is the local[] core
count in the sandbox; on a real cluster the same builder is used without
``master`` so spark-submit controls deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "simplepolygon_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # at local scale: ~2x cores; a real cluster overrides via conf
        shuffle_partitions = max(2 * parallelism, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{parallelism}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big enough to amortize JVM<->Python Arrow dispatch, small enough
        # to keep executor memory bounded (SURVEY.md §7.4 R5)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
