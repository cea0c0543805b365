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
    direction: str = "backward",
) -> DataFrame:
    """Enrich each left row with the right row nearest its ``on`` time
    in the requested ``direction``, matching on the ``by`` keys —
    pandas ``merge_asof`` semantics, re-expressed as one window pass:

    * ``backward`` (default): most recent right row at-or-before
      (inclusive — DuckDB ``l ASOF LEFT JOIN r ON l.by = r.by AND
      l.on >= r.on``);
    * ``forward``: earliest right row at-or-after (inclusive);
    * ``nearest``: whichever of the two is closer in absolute
      distance; exact ties prefer the backward match (documented,
      deterministic — pandas leaves this unspecified).

    ``on`` must be a numeric/orderable column present in both inputs
    (use an epoch-integer timestamp). ``value_cols`` are the right
    columns to carry; they come back as ``<col><suffix>`` alongside
    ``<on><suffix>`` (the matched right timestamp), all NULL when no
    right row qualifies. ``tolerance`` (same unit as ``on``) voids
    matches farther than that from ``left.on``.

    Every direction is still ONE shuffle on ``by`` + one per-partition
    sort: ``nearest`` evaluates the backward ``last`` and forward
    ``first`` windows over the SAME sort order, so Catalyst plans a
    single Window node — no second exchange, no inequality join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    by = list(by)
    lcols = left.columns
    row_struct = F.struct(
        F.col(on).alias("_t"), *[F.col(c).alias(c) for c in value_cols]
    )
    # side ordering: for backward/nearest the right row must sort
    # BEFORE a left row at the same timestamp (inclusive at-or-before);
    # for pure forward it must sort AFTER (inclusive at-or-after).
    r_side, l_side = (0, 1) if direction != "forward" else (1, 0)
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_ts"),
        F.lit(r_side).alias("_side"),
        row_struct.alias("_row"),
    )
    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(on).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(r.schema["_row"].dataType).alias("_row"),
    )
    base = Window.partitionBy(*by).orderBy("_ts", "_side")
    w_bw = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fw = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        out = unioned.withColumn("_m", F.last("_row", ignorenulls=True).over(w_bw))
    elif direction == "forward":
        out = unioned.withColumn("_m", F.first("_row", ignorenulls=True).over(w_fw))
    else:
        bw = F.last("_row", ignorenulls=True).over(w_bw)
        fw = F.first("_row", ignorenulls=True).over(w_fw)
        # equal-ts right rows sort into the backward frame (distance 0,
        # which also wins the tie rule), so the forward frame missing
        # them never changes the chosen match
        out = unioned.withColumn("_bw", bw).withColumn("_fw", fw).withColumn(
            "_m",
            F.when(F.col("_bw").isNull(), F.col("_fw"))
            .when(F.col("_fw").isNull(), F.col("_bw"))
            .when(
                F.col("_ts") - F.col("_bw._t") <= F.col("_fw._t") - F.col("_ts"),
                F.col("_bw"),
            )
            .otherwise(F.col("_fw")),
        )
    out = out.filter(F.col("_side") == F.lit(l_side))
    if tolerance is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_m").isNotNull()
                & (F.abs(F.col("_ts") - F.col("_m._t")) <= F.lit(tolerance)),
                F.col("_m"),
            ),
        )
    return out.select(
        *[F.col(c) for c in lcols],
        F.col("_m._t").alias(f"{on}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
