"""Streaming quality gate — dq1's expectation suite at ingest time.

Greenfield scale extension: a production firehose is gated the same
way a batch corpus is (operators/expectations.py), but the metrics
must be computed INCREMENTALLY — you can't re-scan yesterday's 100 TB
to score today's batch. The trick is that every row-level expectation
metric is a ratio of two mergeable counters (good rows / total rows),
so each micro-batch contributes one tiny ``(batch_id, check, good,
total)`` row set, computed map-side inside the batch, and the
corpus-level metric is an exact SUM over the metric log — identical
to what the batch suite computes on the union of all batches,
regardless of how ingest was batched (batching-invariance is asserted
by the st11 oracle and test_streaming parity).

Non-mergeable checks are deliberately out of scope here: exact
uniqueness needs the st6 state-store dedup posture, and referential
containment needs the st9 broadcast-dim enrich — both exist as their
own streaming operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.expectations import Check, _row_level_flag

ROW_LEVEL_KINDS = ("completeness", "in_set", "matches", "between")


def batch_check_counts(batch: DataFrame, checks: list[Check]) -> DataFrame:
    """One-pass conditional-agg of a batch -> long-format counter rows
    ``(check, good, total)`` (one row per check, computed map-side)."""
    for c in checks:
        if c.kind not in ROW_LEVEL_KINDS:
            raise ValueError(
                f"check {c.name!r}: kind {c.kind!r} is not mergeable per-batch"
            )
    agg = batch.agg(
        F.count(F.lit(1)).alias("_total"),
        *[
            F.sum(F.when(_row_level_flag(c), 1).otherwise(0))
            .cast("bigint")
            .alias(f"_g{i}")
            for i, c in enumerate(checks)
        ],
    )
    stacked = ", ".join(
        f"'{c.name}', _g{i}" for i, c in enumerate(checks)
    )
    return agg.select(
        F.expr(f"stack({len(checks)}, {stacked}) AS (check, good)"),
        F.col("_total").alias("total"),
    )


def write_batch_counts(
    batch: DataFrame, checks: list[Check], metrics_dir: str, batch_id: int
) -> None:
    """Idempotent per-batch metrics write: the counter rows land in the
    deterministic hive partition ``metrics_dir/batch_id=N`` with
    OVERWRITE, so an at-least-once retry of the same micro-batch
    replaces its rows instead of appending a double-counted copy
    (ADVICE r07)."""
    (
        batch_check_counts(batch, checks)
        .coalesce(1)  # #checks rows — one tiny file per batch
        .write.mode("overwrite")
        .parquet(f"{metrics_dir}/batch_id={int(batch_id)}")
    )


def quality_gate_stream(
    docs_stream: DataFrame,
    checks: list[Check],
    metrics_dir: str,
    checkpoint_dir: str,
):
    """foreachBatch metrics log: every micro-batch writes its counter
    rows to the deterministic partition ``metrics_dir/batch_id=N`` with
    OVERWRITE — foreachBatch is at-least-once, so a retried batch must
    replace its own rows, not append a second copy that corpus_metrics
    would double-count (ADVICE r07). ``batch_id`` survives as a hive
    partition column for audit. Returns the started query
    (availableNow drain — call ``awaitTermination``)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        write_batch_counts(batch, checks, metrics_dir, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def corpus_metrics(spark, metrics_dir: str, checks: list[Check]) -> DataFrame:
    """Fold the metric log to corpus-level ``(check, metric, threshold,
    passed)`` — exact integer sums, then ONE division per check (q6
    half-up, the engine-portable contract)."""
    log = spark.read.parquet(metrics_dir)
    sums = log.groupBy("check").agg(
        F.sum("good").alias("good"), F.sum("total").alias("total")
    )
    thr = F.create_map(
        *[x for c in checks for x in (F.lit(c.name), F.lit(float(c.threshold)))]
    )
    metric = F.floor(F.col("good").cast("double") / F.col("total") * 1e6 + F.lit(0.5)) / F.lit(1e6)
    threshold = thr[F.col("check")]
    # exact gates (threshold >= 1) compare the integer sums, not the
    # q6-rounded ratio (same rule as operators/expectations.py)
    passed = F.when(threshold >= 1.0, F.col("good") == F.col("total")).otherwise(
        metric >= threshold
    )
    return sums.select(
        "check",
        metric.alias("metric"),
        threshold.alias("threshold"),
        passed.alias("passed"),
    )


def windowed_quality_stream(
    docs_stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    quality_threshold: float = 0.68,
    text_col: str = "text",
) -> DataFrame:
    """EVENT-TIME quality metrics with watermark semantics — the
    late-data twin of the arrival-time batch log (VERDICT r09 item 7a:
    what happens when a doc arrives after its window was sealed?).

    The two metric surfaces answer different questions and have
    different lateness contracts, both exactly-once:

    * the per-BATCH log (:func:`write_batch_counts`) keys on arrival:
      a late doc simply lands in a later batch's partition, so corpus
      totals are always arrival-complete — nothing is ever dropped,
      and the batch-id OVERWRITE keeps retries idempotent;
    * THIS per-WINDOW aggregate keys on event time: a late doc merges
      into its event window until the window's state is EVICTED — the
      first micro-batch whose starting watermark has passed
      ``window.end`` emits the window and drops the state, and a late
      row arriving in that same batch still merges; any later arrival
      is DROPPED — the price of emitting each window exactly once,
      final, in append mode (the sealed partition is never rewritten,
      so downstream consumers may treat it as immutable). All three
      behaviors (merge, drop, no-re-emit) are unit-pinned; st17's
      oracle replays the sealed subset.

    Returns the streaming aggregate (window_start, window_end, total,
    n_good) — native windowed state, no foreachBatch; sink it in
    APPEND mode so only sealed windows emit.
    """
    from ..functions.text import quality_score

    agg = (
        docs_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total"),
            F.sum(
                F.when(
                    quality_score(F.col(text_col))
                    >= F.lit(float(quality_threshold)),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_good"),
        )
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "total",
        "n_good",
    )
