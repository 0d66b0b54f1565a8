"""SparkSession factory tuned for the crawl engine.

Local-mode settings mirror what a 1000-executor cluster deployment would set:
AQE on (runtime re-plan + skew-join), Arrow on (all custom kernels are
pandas/Arrow UDFs), shuffle partitions sized to the parallelism level.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "amazonwebcrawler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falls back to
    ``local[*]``).  ``shuffle_partitions`` defaults to the local core count —
    on a real cluster this would be ~2-3x total executor cores.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        shuffle_partitions = (os.cpu_count() or 8) if inner == "*" else int(inner)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _warm_collation_classes(spark)
    return spark


def _warm_collation_classes(spark: SparkSession) -> None:
    """Force single-threaded init of Spark 4.1's ICU collation classes.

    First use of lower()/upper() from many executor threads at once can
    deadlock on the CollationAwareUTF8String class-initialization monitor
    (observed via jstack: every task RUNNABLE but 'waiting on the Class
    initialization monitor' in CollationSupport$Lower.execBinaryICU). One
    single-task job initializes the classes before any parallel stage runs.
    """
    from pyspark.sql import functions as F

    spark.range(1).coalesce(1).select(
        F.lower(F.concat(F.lit("Warm"), F.lit("Up"))).alias("w"),
        F.upper(F.lit("x")).alias("u"),
        F.initcap(F.lit("y")).alias("i"),
    ).collect()
