"""As-of (most-recent-prior) join — greenfield time-series operator.

Spark has no ASOF JOIN (DuckDB/Pandas/kdb do); the scalable Spark
re-expression is the tagged-union + running-last-row window:

 * right rows and left rows are unioned with a side tag, sorted within
   each ``by`` partition on (time, side) — right sorts before left at
   equal timestamps, which gives the inclusive ``left.t >= right.t``
   match DuckDB's ASOF JOIN performs;
 * a single window ``last(right_row_struct, ignorenulls=True)`` over
   ``rows unbounded preceding .. current`` carries the most recent
   right ROW (the whole struct, so a right row whose payload column is
   NULL still matches — row-level semantics, not per-column);
 * filter back to the left side and unpack the struct.

Plan shape: ONE shuffle on the ``by`` key (the union is map-side;
the window sort is per-partition). No join node at all, so there is
no row explosion on hot keys — a user with k left + m right rows
costs (k + m) log (k + m) locally, versus k*m for the naive
inequality join. At 100 TB this is the difference between an as-of
enrichment that runs and one that never finishes.

If multiple right rows share (by, time) the LAST in (time, side,
tiebreak) order wins — pre-aggregate the right side to one row per
(by, time) when that matters (the driver query does: max(value)),
exactly as one must for DuckDB's ASOF JOIN to be deterministic.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    tolerance: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Enrich each left row with the most recent right row at-or-before
    its ``on`` time, matching on the ``by`` keys (backward as-of join,
    inclusive — DuckDB ``l ASOF LEFT JOIN r ON l.by = r.by AND
    l.on >= r.on``).

    ``on`` must be a numeric/orderable column present in both inputs
    (use an epoch-integer timestamp). ``value_cols`` are the right
    columns to carry; they come back as ``<col><suffix>`` alongside
    ``<on><suffix>`` (the matched right timestamp), all NULL when no
    right row precedes. ``tolerance`` (same unit as ``on``) voids
    matches older than ``left.on - tolerance``.
    """
    by = list(by)
    lcols = left.columns
    row_struct = F.struct(
        F.col(on).alias("_t"), *[F.col(c).alias(c) for c in value_cols]
    )
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_ts"),
        F.lit(0).alias("_side"),
        row_struct.alias("_row"),
    )
    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(on).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_row"].dataType).alias("_row"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_row", ignorenulls=True).over(w)
    out = (
        l.unionByName(r, allowMissingColumns=True)
        .withColumn("_m", matched)
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_m").isNotNull()
                & (F.col("_ts") - F.col("_m._t") <= F.lit(tolerance)),
                F.col("_m"),
            ),
        )
    return out.select(
        *[F.col(c) for c in lcols],
        F.col("_m._t").alias(f"{on}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
