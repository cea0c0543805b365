"""Structured Streaming over the events table — SURVEY §7 phase 10.

The reference has NO streaming surface (SURVEY §2.12); this module is
the greenfield scale extension: the same event-analytics the batch
queries ev1/ev2 (plans/driver_queries.py) compute, expressed as
incremental plans with watermarks, so a 100 TB/day event firehose is a
`readStream` swap away — the aggregation code is identical.

Design:
 * event time = whatever physical type events.ts carries in the
   parquet (nanos-long or micros timestamp), normalized schema-
   adaptively to ts_ns + a microsecond ``ts`` column;
 * tumbling/sliding rollups: ``window(ts, ...)`` + watermark — late
   rows beyond the watermark are dropped instead of corrupting closed
   windows;
 * sessionization: ``session_window(ts, gap)`` — Spark's native
   merging-window state store op (batch ev2 computes the same sessions
   with a lag/cumsum window, see test_streaming.py parity asserts);
 * a custom stateful sessionizer (streaming/stateful.py) shows the
   ``applyInPandasWithState`` escape hatch for semantics session_window
   can't express (e.g. per-user dynamic gaps).

Everything here also runs in batch mode (pass a batch DataFrame) —
stream/batch unification is the point of Structured Streaming.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of events parquet (a directory of files or a
    single file). ``max_files_per_trigger`` throttles replay so tests
    can exercise multi-batch incremental execution.

    The stream schema is inferred from a batch footer read of the same
    path, so whatever physical type ``ts`` carries (nanos-long or
    micros timestamp — the driver testdata has shipped both) is the
    type the file source declares; ``with_event_time`` then normalizes
    it schema-adaptively.
    """
    reader = spark.readStream.schema(spark.read.parquet(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # FileStreamSource requires a directory or glob (it derives
        # basePath itself); wrap a bare file in a {} glob so the
        # parent directory becomes the base
        head, tail = os.path.split(path)
        path = os.path.join(head, "{%s}" % tail)
    df = reader.parquet(path)
    return with_event_time(df)


def with_event_time(events: DataFrame) -> DataFrame:
    """Normalize to ts_ns (bigint ns) + microsecond TimestampType ``ts``
    whatever the raw ``ts`` type is (nanos-long / NTZ / timestamp) —
    shared with the batch loader (sources/tables.py:shape_events)."""
    if "ts_ns" in events.columns:  # already shaped (batch loader)
        return events
    from ..sources.tables import shape_events

    return shape_events(events)


def hourly_rollup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1h count/sum per event_type; same output shape as the
    batch ev1_hourly_rollup so stream and batch results are directly
    comparable (hour_idx = hours since epoch)."""
    e = events.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            (F.unix_timestamp(F.col("w.start")) / 3600).cast("bigint").alias("hour_idx"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide
    overlapping windows)."""
    e = events.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp("w.start").cast("bigint").alias("start_s"),
            F.unix_timestamp("w.end").cast("bigint").alias("end_s"),
            "event_type",
            "n",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based sessions per user via the native merging session
    window. Output: user_id, start_s, n_events, end_event_s (second
    of the LAST EVENT, not window end = last event + gap, so the batch
    ev2_sessionize lag/cumsum query produces identical rows)."""
    e = events.withWatermark("ts", watermark)
    return (
        e.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_ns").alias("_min_ns"),
            F.max("ts_ns").alias("_max_ns"),
        )
        .select(
            "user_id",
            F.expr("_min_ns div 1000000000").cast("bigint").alias("start_s"),
            F.expr("_max_ns div 1000000000").cast("bigint").alias("end_s"),
            "n_events",
        )
    )


def purchases_within_signup_window(
    events: DataFrame,
    max_delay: str = "2 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: purchases attributed
    to a signup by the same user within ``max_delay``.

    Both sides carry watermarks and the join condition bounds
    purchase time to [signup, signup + max_delay] — the state store
    can therefore evict rows past the watermark + delay horizon
    (unbounded state is the classic stream-join failure mode).
    Works identically on a batch DataFrame (no watermark needed for
    correctness there) — the parity test runs both.
    """
    signups = (
        events.filter(F.col("event_type") == "signup")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("signup_ts"),
            F.col("event_id").alias("signup_id"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value"),
        )
    )
    joined = purchases.join(
        signups,
        F.expr(
            f"""
            p_user = s_user AND
            purchase_ts >= signup_ts AND
            purchase_ts <= signup_ts + interval {max_delay}
            """
        ),
    )
    return joined.select(
        F.col("p_user").alias("user_id"),
        "signup_id",
        "purchase_id",
        F.unix_timestamp("signup_ts").cast("bigint").alias("signup_s"),
        F.unix_timestamp("purchase_ts").cast("bigint").alias("purchase_s"),
        "value",
    )


def materialized_hourly_rollup(
    stream_events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "3650 days",
):
    """Streaming MATERIALIZED VIEW of the hourly rollup, maintained as
    a merge-on-read parquet log (the no-lakehouse upsert pattern):
    each update-mode micro-batch carries only the keys whose
    CUMULATIVE aggregate changed; :func:`upsert_batch` lands them in a
    per-batch hive partition, and :func:`read_materialized` resolves
    latest-batch-wins per key. Writes are tiny (changed keys only, no
    partition explosion however fine the key grain), a crash + replay
    OVERWRITES the same batch partition (exactly-once sink — the
    idempotence is unit-tested, not just absorbed by latest-wins), the
    batch partitions double as MV VERSIONS for as-of time travel
    (:func:`read_materialized` ``asof_batch``), and compaction is the
    sources.layout.compact job run out-of-band — the same
    write-amplification trade Delta/Iceberg make, expressed with plain
    parquet.

    The default watermark is effectively unbounded because a
    file-by-file replay of historical data arrives out of event-time
    order; a real deployment with ordered arrival uses a tight
    watermark so the state store evicts closed hours.

    Returns the StreamingQuery (caller awaits)."""
    agg = hourly_rollup(stream_events, watermark=watermark)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch(batch_df, out_dir, batch_id)

    return (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def upsert_batch(batch_df: DataFrame, out_dir: str, batch_id: int) -> None:
    """Idempotent merge-on-read upsert: the batch's changed keys land
    in the deterministic hive partition ``out_dir/batch=N`` with
    OVERWRITE, so an at-least-once foreachBatch retry replaces its own
    rows instead of appending a duplicate copy. (The partition column
    is ``batch`` — a leading underscore would make the directory
    invisible to Spark's file index, which hides ``_*`` paths.)"""
    batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={int(batch_id)}")


def read_materialized(
    spark: SparkSession,
    out_dir: str,
    key_cols: list[str],
    asof_batch: int | None = None,
) -> DataFrame:
    """Latest-wins reader for the merge-on-read MV log: one row per
    key, from the highest batch that touched it. The window partitions
    by the MV key (bounded per key by #batches that updated it).

    ``asof_batch`` reads the view AS OF that batch id (time travel over
    the version log): only partitions ``batch <= asof_batch`` are read
    — partition-pruned at the scan, so an as-of read of version k costs
    k+1 partition reads, never the full log."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    log = spark.read.parquet(out_dir)
    if asof_batch is not None:
        log = log.filter(F.col("batch") <= int(asof_batch))
    w = Window.partitionBy(*key_cols).orderBy(F.desc("batch"))
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "batch")
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drain a stream with trigger(availableNow) into an in-memory
    table; returns the result as a batch DataFrame. Test/driver
    harness — production sinks are kafka/delta/parquet writeStreams."""
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(checkpoint_dir, name))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
