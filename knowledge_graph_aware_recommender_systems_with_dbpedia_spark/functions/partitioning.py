"""Map-side parallelism control for fan-out stages.

The local test harness (and any pipeline fed by few / unsplittable
files — one-row-group parquet, gzip) exposes a structural trap the
optimizer cannot fix: a scan that yields ONE populated input split
runs every downstream map-side operator — broadcast-join probes,
pair-join fan-outs, explodes, per-row scoring — in ONE task, however
many cores the cluster has. ``spark.sql.files.maxPartitionBytes``
cannot help: a single-row-group file "splits" into empty byte ranges
(measured: 33 claimed partitions, all 600k rows in one). The guide's
fix (§2.5, input skew: "one huge unsplittable file ... repartition
immediately after the read") is a round-robin exchange of the INPUT —
cheap by construction exactly where it matters, because the operators
that need it do candidate work quadratic (pair joins) or heavily
multiplicative (explode × join) in their input, so shuffling the
input bytes once is amortized by the work it parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_fanout(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` to the cluster's task slots
    BEFORE a fan-out stage (self-join, explode×join, per-row top-k
    scoring) — but only when the frame is small enough that its
    natural partitioning may be starving the cluster.

    Scale-adaptive gate (no local[32] constant): fires only when the
    optimizer's size estimate is under ``defaultParallelism x
    maxPartitionBytes`` — i.e. the whole input is smaller than one
    natural split per task slot, so its scan CANNOT be occupying the
    cluster even when perfectly laid out. A corpus-scale frame (many
    populated splits) is far above the gate and passes through
    untouched, so this never adds a shuffle where the scan already
    parallelizes. The repartition is deterministic under retries
    (sort-before-repartition, SPARK-23207) and never changes results —
    only the row-to-task placement."""
    spark = df.sparkSession
    sc = spark.sparkContext
    target = sc.defaultParallelism * max(1, int(factor))
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        max_split = int(
            spark._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
        )
    except Exception:  # stats unavailable — leave the plan alone
        return df
    if est >= target * max_split:
        return df
    return df.repartition(target)
