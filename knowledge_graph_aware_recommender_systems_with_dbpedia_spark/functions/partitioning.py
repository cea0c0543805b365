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

# Conf key for the batch-side broadcast gate below; bytes of OPTIMIZER
# ESTIMATE of the raw batch frame, not of the derived broadcast frames
# (shingle/band expansion multiplies text bytes ~10-20x for char
# 3-grams, so a 64 MiB batch bound keeps the largest derived broadcast
# in the guide §3.1 "few hundred MB is usually fine" envelope).
# Parameterized (conf), scale-independent default: a sf0.1 micro-batch
# estimates in the KB-MB range, so local plans are unchanged; only a
# genuinely backfill-sized batch trips the fallback.
BROADCAST_BATCH_MAX_BYTES_CONF = "spark.graft.dedup.broadcastBatchMaxBytes"
BROADCAST_BATCH_MAX_BYTES_DEFAULT = 64 * 1024 * 1024


def batch_fits_broadcast(df: DataFrame, max_bytes: int | None = None) -> bool:
    """Runtime gate for the dedup/curation chain's batch-side
    broadcasts (VERDICT r14 item 3): True while the optimizer's size
    estimate of the batch frame is under the bound, so the operator
    may broadcast its batch-derived frames; False past it — the
    operator then leaves the joins unhinted and the planner picks a
    shuffle strategy (graceful at any size) instead of OOMing the
    driver/executors on a backfill-sized "micro"-batch.

    One estimate probe per operator invocation (the caller shares the
    verdict across all of that invocation's broadcast sites — every
    broadcast frame is O(batch)-bounded by construction, so the batch
    estimate is the right shared proxy). When the estimate is
    unreadable the gate FAILS CLOSED (no broadcast hint): size-unknown
    is exactly the case the gate exists for, and the planner still
    auto-broadcasts sides it can prove small."""
    if max_bytes is None:
        try:
            max_bytes = int(
                df.sparkSession.conf.get(
                    BROADCAST_BATCH_MAX_BYTES_CONF,
                    str(BROADCAST_BATCH_MAX_BYTES_DEFAULT),
                )
            )
        except Exception:
            max_bytes = BROADCAST_BATCH_MAX_BYTES_DEFAULT
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return False
    return est <= max_bytes


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
