"""Distribution-drift scoring between two data windows (ML monitoring).

Greenfield scale extension (no reference counterpart): production
pipelines gate retrains and alert on DISTRIBUTION drift — "does
today's feature distribution still look like the training window's?"
— typically via PSI or KL. Both need ``ln`` on the compared surface,
which this repo's oracle contract bans (the tx14 libm rule:
transcendentals are not bit-portable under rounding). The
chi-square statistic carries the same signal with RATIONAL arithmetic
only:

    chi2(g) = sum over buckets b with ref(b) > 0 of
              (cur(b) - e(b))^2 / e(b),   e(b) = ref(b) * n_cur/n_ref

Counts are exact integers, every op is an IEEE-correctly-rounded
mul/div, and the bucket sum folds in PINNED bucket order — so a SQL
engine replaying the same fold reproduces the statistic bit-for-bit
(the a17/g9 ordered-fold discipline).

Scale shape: two count aggregations (one per window, map-side
combinable), a co-partitioned full-outer join on (group, bucket), a
per-group window bounded by the FIXED bucket count, and one fold per
group. Nothing is corpus-sized after the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chi2_drift(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str,
    bucket_col: str,
) -> DataFrame:
    """Per-group chi-square drift between two pre-bucketed frames.

    Inputs carry one row per OBSERVATION with its group and bucket
    ids. Returns one row per group present in the reference window:
    (group, n_ref, n_cur, n_new_buckets, vanished, chi2) where
    n_new_buckets counts buckets observed now but absent from the
    reference (they are excluded from chi2 — e(b) = 0 is undefined —
    and surfaced as their own integer drift signal) and ``vanished``
    flags groups with n_cur = 0. A fully-vanished group makes every
    e(b) = 0, so the fold guards on e > 0 (otherwise the r > 0 branch
    would compute 0/0 = NaN, which fails every ``chi2 > threshold``
    comparison and silently un-gates exactly the most-drifted groups);
    a downstream gate must trip on ``vanished OR chi2 > t``.
    """
    rc = ref.groupBy(
        F.col(group_col).alias("g"), F.col(bucket_col).alias("b")
    ).agg(F.count(F.lit(1)).alias("r"))
    cc = cur.groupBy(
        F.col(group_col).alias("g"), F.col(bucket_col).alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))
    j = (
        rc.join(cc, ["g", "b"], "full_outer")
        .select(
            "g",
            "b",
            F.coalesce("r", F.lit(0)).alias("r"),
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    w = Window.partitionBy("g")  # bounded by the fixed bucket count
    j = j.withColumn("n_ref", F.sum("r").over(w)).withColumn(
        "n_cur", F.sum("c").over(w)
    )
    # expected count per bucket is computed in a PROJECTION before the
    # collect/fold: the fold lambda must touch only its struct fields —
    # capturing an outer (grouping) column inside a lambda is the Spark
    # 4.1 pruning mis-bind shape this repo documents in splits/a17
    j = j.filter(F.col("n_ref") > 0).withColumn(
        "e",
        F.col("r").cast("double")
        * (F.col("n_cur").cast("double") / F.col("n_ref").cast("double")),
    )
    folded = j.groupBy("g", "n_ref", "n_cur").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("b", "r", "c", "e"))),
            F.lit(0.0),
            lambda acc, s: F.when(
                (s["r"] > 0) & (s["e"] > 0),
                acc
                + (s["c"].cast("double") - s["e"])
                * (s["c"].cast("double") - s["e"])
                / s["e"],
            ).otherwise(acc),
        ).alias("chi2"),
        F.sum(((F.col("r") == 0) & (F.col("c") > 0)).cast("bigint")).alias(
            "n_new_buckets"
        ),
    )
    return folded.select(
        "g",
        "n_ref",
        "n_cur",
        "n_new_buckets",
        (F.col("n_cur") == 0).alias("vanished"),
        "chi2",
    )
