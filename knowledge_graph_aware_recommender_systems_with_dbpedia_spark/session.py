"""SparkSession factory tuned for the local[32] test harness.

On a real cluster only the master/memory settings change; the
AQE/shuffle settings below are scale-safe defaults (AQE coalesces
and re-plans at runtime, so shuffle.partitions is a ceiling, not a
hand-tuned constant).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kg_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime bloom-filter semi-join pushdown: a selective filter
        # on a dim side injects a bloom probe into the fact scan, so
        # most fact rows die at the scan instead of crossing the
        # shuffle — at 100 TB this is the difference between shuffling
        # the corpus and shuffling the match set. creationSideThreshold
        # guards the build cost (default 10 MB side only).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark 4's DataFrame debugging decorates EVERY DataFrame/
        # Column API call with call-site capture: getActiveSession + a
        # JVM conf lookup + a Python stack walk + set/clear of the JVM
        # PySparkCurrentOrigin — 3 extra py4j round trips per call,
        # measured at ~60-80% of plan-construction wall for registry
        # queries (q1 construct 0.39 s -> 0.19 s with the memo below;
        # q9 0.80 -> 0.20 s). Pure driver-side Python-boundary
        # overhead (guide §4/§5) — plans, results and error RAISING are
        # unchanged; only the "user line that caused it" annotation on
        # error messages is lost.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
