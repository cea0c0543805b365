"""Bucketed-table sinks — the co-located-join storage strategy.

At 100 TB the dominant recurring cost is re-shuffling the interaction
fact table on (user_id) / (item_id) for every split, aggregation and
scoring pass. Bucketing pre-shuffles ONCE at write time: two tables
bucketed on the same key with the same bucket count join/aggregate
with ZERO exchange — Spark's scan exposes the hash partitioning to
Catalyst, which elides the shuffle (tests assert the plan has no
Exchange under the join).

Spark bucketing rides the session catalog (``saveAsTable``), so these
helpers manage warehouse tables, not bare paths — exactly how a
production deployment would pin its fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed on ``bucket_col``.

    ``sort_col`` additionally sorts within buckets (sort-merge joins
    then skip the sort too).
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange — the
    assertion hook for co-location tests/audits."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
