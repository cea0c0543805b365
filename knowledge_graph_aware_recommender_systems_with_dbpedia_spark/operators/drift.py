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


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str,
    bucket_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-group Population Stability Index between two pre-bucketed
    frames — the drift score ML-monitoring teams standardize on
    (PSI < 0.1 stable / 0.1-0.25 watch / > 0.25 act).

    PSI needs ``ln`` on the compared surface, which the oracle
    contract bans (tx14: transcendentals are not bit-portable), so the
    output follows the a18/ev17 SEMANTIC-BAND pattern: the hashable
    columns are all RATIONAL-arithmetic statistics of the same
    smoothed distributions —

    * ``tv``       total variation  0.5 * sum |p - q|
    * ``chi2_sym`` sum (p-q)^2/q + sum (p-q)^2/p

    folded in pinned bucket order (bit-portable), while PSI itself is
    asserted inside the boolean ``psi_within_bounds`` against the
    information-theoretic sandwich that holds for ANY pair of
    distributions on a common support:

        4 * TV^2  <=  PSI = KL(p||q) + KL(q||p)  <=  chi2_sym

    (Pinsker's inequality per KL term; KL(p||q) <= chi2(p||q)). The
    oracle twin emits constant TRUE — a wrong ln, a wrong fold, or a
    broken smoothing flips the boolean and fails the hash.

    Proportions are Laplace-smoothed over the per-group bucket UNION:
    p_i = (r_i + alpha) / (n_ref + B*alpha), q_i likewise — full
    common support, so vanished/new buckets contribute signal instead
    of dividing by zero (the ev19 NaN lesson). All smoothed terms are
    single correctly-rounded IEEE ops on exact integers, so tv and
    chi2_sym replay bit-for-bit in any binary64 engine.

    Groups that exist on only ONE side — the most-drifted case
    possible — are NOT dropped (VERDICT r09: the old
    ``n_ref>0 & n_cur>0`` filter made a team gating on this report
    blind to total disappearance, the exact lesson chi2_drift's
    ``vanished`` flag already encoded). They are emitted with
    ``vanished`` (n_cur = 0) / ``newborn`` (n_ref = 0) flags and NULL
    drift statistics: a PSI against an empty side is a comparison to
    the smoothing prior, not to data, so reporting a number would
    understate exactly the event that most needs flagging.
    """
    rc = ref.groupBy(
        F.col(group_col).alias("g"), F.col(bucket_col).alias("b")
    ).agg(F.count(F.lit(1)).alias("r"))
    cc = cur.groupBy(
        F.col(group_col).alias("g"), F.col(bucket_col).alias("b")
    ).agg(F.count(F.lit(1)).alias("c"))
    j = rc.join(cc, ["g", "b"], "full_outer").select(
        "g",
        "b",
        F.coalesce("r", F.lit(0)).alias("r"),
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    w = Window.partitionBy("g")  # bounded by the fixed bucket count
    j = (
        j.withColumn("n_ref", F.sum("r").over(w))
        .withColumn("n_cur", F.sum("c").over(w))
        .withColumn("n_buckets", F.count(F.lit(1)).over(w))
    )
    a = F.lit(float(alpha))
    # one-sided groups: flagged rows with NULL statistics, never dropped
    degenerate = (
        j.filter((F.col("n_ref") == 0) | (F.col("n_cur") == 0))
        .groupBy("g", "n_ref", "n_cur", "n_buckets")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "g",
            "n_ref",
            "n_cur",
            "n_buckets",
            F.lit(None).cast("double").alias("tv"),
            F.lit(None).cast("double").alias("chi2_sym"),
            F.lit(None).cast("double").alias("psi"),
            F.lit(None).cast("boolean").alias("psi_within_bounds"),
            (F.col("n_cur") == 0).alias("vanished"),
            (F.col("n_ref") == 0).alias("newborn"),
        )
    )
    # smoothed proportions in their own projection (the Spark 4.1
    # lambda-pruning discipline: the fold below touches struct fields
    # only)
    j = (
        j.filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
        .withColumn(
            "p",
            (F.col("r").cast("double") + a)
            / (F.col("n_ref").cast("double") + a * F.col("n_buckets").cast("double")),
        )
        .withColumn(
            "q",
            (F.col("c").cast("double") + a)
            / (F.col("n_cur").cast("double") + a * F.col("n_buckets").cast("double")),
        )
    )
    folded = j.groupBy("g", "n_ref", "n_cur", "n_buckets").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("b", "p", "q"))),
            F.struct(
                F.lit(0.0).alias("tv"),
                F.lit(0.0).alias("x2"),
                F.lit(0.0).alias("psi"),
            ),
            lambda acc, s: F.struct(
                (acc["tv"] + F.abs(s["p"] - s["q"])).alias("tv"),
                # the bucket's two chi2 terms are summed BEFORE joining
                # the accumulator — the oracle folds per-bucket
                # (t_q + t_p) values, and float addition is not
                # associative, so acc+(t_q+t_p) must be the shape in
                # both engines
                (
                    acc["x2"]
                    + (
                        (s["p"] - s["q"]) * (s["p"] - s["q"]) / s["q"]
                        + (s["p"] - s["q"]) * (s["p"] - s["q"]) / s["p"]
                    )
                ).alias("x2"),
                (acc["psi"] + (s["p"] - s["q"]) * F.log(s["p"] / s["q"])).alias(
                    "psi"
                ),
            ),
        ).alias("_f")
    )
    tv = F.col("_f.tv") * 0.5
    healthy = folded.select(
        "g",
        "n_ref",
        "n_cur",
        "n_buckets",
        tv.alias("tv"),
        F.col("_f.x2").alias("chi2_sym"),
        F.col("_f.psi").alias("psi"),
        (
            (F.lit(4.0) * tv * tv <= F.col("_f.psi") + F.lit(1e-9))
            & (F.col("_f.psi") <= F.col("_f.x2") + F.lit(1e-9))
        ).alias("psi_within_bounds"),
        F.lit(False).alias("vanished"),
        F.lit(False).alias("newborn"),
    )
    return healthy.unionByName(degenerate)


def cusum_changepoint(
    counts: DataFrame,
    group_col: str,
    time_col: str,
    n_col: str,
    ref_end,
    slack_den: int = 4,
    h_num: int = 2,
) -> DataFrame:
    """One-sided CUSUM change-point detection per group — WHEN did the
    volume shift, completing the drift family (ev19 chi2 / ev20 PSI
    say WHETHER a window drifted; CUSUM localizes the onset, the
    Page-1954 sequential test ML monitoring uses for alert timestamps).

    Input is a pre-aggregated (group, t, n) count series (zero-filled
    by the caller — gaps read as drops otherwise). Buckets before
    ``ref_end`` are the calibration window; monitoring starts at
    ``ref_end``.

    The textbook recursion C_t = max(0, C_{t-1} + x_t - mu - k) is
    sequential, but it has the closed form

        C_t = S_t - min(0, min_{j<=t} S_j),  S_t = prefix sum of dev

    so it compiles to TWO stock window functions (running sum +
    running min) over each group's bounded time series — no fold, no
    UDF, and the shuffle key is the group id.

    Everything stays in BIGINT: deviations are scaled by n_ref (the
    reference bucket count), so dev_t = n_t * n_ref - total_ref -
    slack with slack = total_ref // slack_den (k = mu/slack_den), and
    the alarm threshold is h = h_num * total_ref (h = h_num * mu * n_ref
    in scaled units — h_num reference-buckets' worth of average
    volume). Integer arithmetic end-to-end: the statistic replays
    bit-for-bit in any engine, no float-order caveats at all.

    Returns one row per group with a non-empty reference window:
    (group, n_ref, total_ref, max_cusum, first_alarm, n_alarm_buckets)
    — first_alarm is the earliest monitored bucket with C_t > h, or
    -1 when the gate never fired.
    """
    g, t, n = F.col(group_col), F.col(time_col), F.col(n_col)
    ref = (
        counts.filter(t < F.lit(ref_end))
        .groupBy(g.alias("g"))
        .agg(
            F.sum(n).cast("bigint").alias("total_ref"),
            F.count(F.lit(1)).cast("bigint").alias("n_ref"),
        )
    )
    mon = (
        counts.filter(t >= F.lit(ref_end))
        .select(g.alias("g"), t.alias("t"), n.cast("bigint").alias("n"))
        .join(ref, "g")
        .withColumn(
            "dev",
            (
                F.col("n") * F.col("n_ref")
                - F.col("total_ref")
                - F.expr(f"total_ref div {int(slack_den)}")
            ).cast("bigint"),
        )
    )
    w = (
        Window.partitionBy("g")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = (
        mon.withColumn("s", F.sum("dev").over(w))
        .withColumn("s_min", F.min("s").over(w))
        .withColumn("c", F.col("s") - F.least(F.lit(0).cast("bigint"), F.col("s_min")))
    )
    h = F.lit(int(h_num)) * F.col("total_ref")
    return c.groupBy("g", "n_ref", "total_ref").agg(
        F.max("c").alias("max_cusum"),
        F.coalesce(
            F.min(F.when(F.col("c") > h, F.col("t"))), F.lit(-1).cast("bigint")
        ).alias("first_alarm"),
        F.sum((F.col("c") > h).cast("bigint")).alias("n_alarm_buckets"),
    )


def seasonal_mad_anomalies(
    counts: DataFrame,
    group_col: str,
    day_col: str,
    slot_col: str,
    n_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Seasonal-profile anomaly gate: flag (group, day, slot) cells
    whose volume deviates from the group's TYPICAL volume for that
    slot-of-day by more than ``z`` robust standard deviations — the
    traffic-anomaly check an event pipeline runs before trusting a
    day's data (a chi2/PSI drift test compares two windows; this
    compares every cell against its own seasonal baseline, so one bad
    hour on one day surfaces even when the aggregate windows agree).

    Robustness comes from the median/MAD pair: per (group, slot) the
    baseline is median(n) over days and the spread is the median
    absolute deviation, scaled by the normal-consistency constant
    1.4826 — one outlying day cannot drag its own threshold the way a
    mean/std profile lets it. Both medians are EXACT (Spark
    ``median`` and DuckDB ``median`` interpolate the same way, and
    midpoints of integer counts are exact binary64), so the flag
    comparison replays bit-for-bit in the oracle.

    A zero-spread profile (mad = 0: more than half the days have the
    identical count) flags ANY deviation — the standard MAD-rule
    behavior; absent cells (zero events that hour) are out of scope
    by construction (compose with ev13's resample-fill upstream to
    audit those).

    Scale: one keyed aggregate to the profile (bounded by groups x
    slots), broadcast back onto the cell table — no window over the
    fact stream, no single-partition exchange.
    """
    cells = counts.select(
        F.col(group_col).alias("g"),
        F.col(day_col).alias("day"),
        F.col(slot_col).alias("slot"),
        F.col(n_col).cast("bigint").alias("n"),
    )
    prof = cells.groupBy("g", "slot").agg(
        F.median("n").alias("med"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    dev = cells.join(F.broadcast(prof), ["g", "slot"]).withColumn(
        "adev", F.abs(F.col("n").cast("double") - F.col("med"))
    )
    mad = dev.groupBy("g", "slot").agg(F.median("adev").alias("mad"))
    scored = dev.join(F.broadcast(mad), ["g", "slot"]).withColumn(
        "is_anomaly",
        F.col("adev") > F.lit(float(z)) * F.lit(1.4826) * F.col("mad"),
    )
    return scored.filter(F.col("is_anomaly")).select(
        "g",
        "day",
        "slot",
        "n",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "n_days",
    )


_NUMERIC_PREFIXES = (
    "int", "bigint", "smallint", "tinyint", "long", "double", "float", "decimal"
)


def column_profiles(
    df: DataFrame, cols: list[str] | None = None, scale: int = 1_000_000
) -> DataFrame:
    """Per-column data-contract profile: one row per column with
    (column, n_rows, n_null, n_distinct, mean) — the generic
    column-level monitoring sweep a quality gate runs on every
    snapshot (complements ev19/ev20's per-value distribution drift).

    Numeric means use the half-up fixed-point contract (floor(x*scale
    + 0.5) summed as BIGINT, divided back at the end) so two engines
    computing the profile agree bit-for-bit — never an order-dependent
    raw double sum. Non-numeric columns report a NULL mean.

    Plan shape: ONE aggregate over the frame (count/count(col)/
    count-distinct/fixed-point-sum per column — the multi-distinct
    Expand multiplies map-side rows by the column count, not the data
    by passes), then a k-element struct array explodes into the
    k-row report. One scan at 100 TB regardless of column count.
    """
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    if cols is not None:
        want = {c for c in cols}
        known = {name for name, _dt in fields}
        unknown = sorted(want - known)
        if unknown:
            # a silent drop here makes a typo'd column vanish from the
            # drift report — a false PASS for a data-contract gate
            # (ADVICE r11), so unknown names are a hard error
            raise ValueError(
                f"column_profiles: columns not in schema: {unknown} "
                f"(schema has: {sorted(known)})"
            )
        fields = [f for f in fields if f[0] in want]
    aggs = [F.count(F.lit(1)).alias("_n")]
    numeric = {}
    for name, dt in fields:
        numeric[name] = dt.startswith(_NUMERIC_PREFIXES)
        aggs.append(F.count(F.col(name)).alias(f"_c_{name}"))
        aggs.append(F.countDistinct(F.col(name)).alias(f"_d_{name}"))
        if numeric[name]:
            aggs.append(
                F.sum(
                    F.floor(F.col(name).cast("double") * scale + F.lit(0.5)).cast(
                        "bigint"
                    )
                ).alias(f"_s_{name}")
            )
    row = df.agg(*aggs)
    entries = []
    for name, _dt in fields:
        mean = (
            F.when(
                F.col(f"_c_{name}") > 0,
                F.round(
                    F.col(f"_s_{name}").cast("double")
                    / (F.col(f"_c_{name}").cast("double") * scale),
                    6,
                ),
            )
            if numeric[name]
            else F.lit(None).cast("double")
        )
        entries.append(
            F.struct(
                F.lit(name).alias("column"),
                F.col("_n").cast("bigint").alias("n_rows"),
                (F.col("_n") - F.col(f"_c_{name}")).cast("bigint").alias("n_null"),
                F.col(f"_d_{name}").cast("bigint").alias("n_distinct"),
                mean.alias("mean"),
            )
        )
    return row.select(F.explode(F.array(*entries)).alias("_p")).select("_p.*")


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    cols: list[str] | None = None,
    null_rate_tol: float = 0.01,
    distinct_ratio_band: tuple[float, float] = (0.5, 2.0),
    mean_rel_tol: float = 0.05,
) -> DataFrame:
    """Column-profile drift report between two snapshots: joins the
    two :func:`column_profiles` frames (k rows each — the join is
    trivially broadcast) and flags per column

    * ``null_drift``    — |null_rate_new - null_rate_old| > tol,
    * ``distinct_drift``— distinct-count ratio outside the band,
    * ``mean_drift``    — relative mean shift > tol (numeric only).

    All flags compute from the ROUNDED profile numbers, so an oracle
    replaying the same integer arithmetic reproduces every boolean
    exactly. Missing-in-either columns surface with status
    'added'/'removed' — schema drift is drift too.

    ``cols`` validation (ADVICE r11): a name in NEITHER snapshot's
    schema is a typo and raises; a name in exactly ONE side is the
    legitimate schema-drift case — it profiles on the side that has
    it and surfaces as 'added'/'removed' (each side's profile request
    is restricted to the columns that side actually has, so the
    strict per-frame validation in :func:`column_profiles` never
    fires on real drift).
    """
    if cols is not None:
        known = {f.name for f in old.schema.fields} | {
            f.name for f in new.schema.fields
        }
        unknown = sorted(set(cols) - known)
        if unknown:
            raise ValueError(
                f"profile_drift: columns in neither snapshot: {unknown} "
                f"(schemas have: {sorted(known)})"
            )
        old_cols = [c for c in cols if c in {f.name for f in old.schema.fields}]
        new_cols = [c for c in cols if c in {f.name for f in new.schema.fields}]
    else:
        old_cols = new_cols = None
    po = column_profiles(old, old_cols).alias("o")
    pn = column_profiles(new, new_cols).alias("n")
    j = po.join(pn, "column", "full_outer")
    nr_old = F.round(F.col("o.n_null").cast("double") / F.col("o.n_rows"), 6)
    nr_new = F.round(F.col("n.n_null").cast("double") / F.col("n.n_rows"), 6)
    lo, hi = distinct_ratio_band
    ratio = F.col("n.n_distinct").cast("double") / F.nullif(
        F.col("o.n_distinct").cast("double"), F.lit(0.0)
    )
    null_drift = F.abs(nr_new - nr_old) > null_rate_tol
    # old n_distinct == 0 makes the ratio NULL, which the final
    # coalesce would read as "no drift" — but 0 -> N distinct values
    # (an all-null baseline column coming alive) is exactly a
    # distinct-count explosion, so flag it explicitly (ADVICE r11)
    distinct_drift = F.when(
        (F.col("o.n_distinct") == 0) & (F.col("n.n_distinct") > 0), F.lit(True)
    ).otherwise((ratio < lo) | (ratio > hi))
    mean_drift = F.when(
        F.col("o.mean").isNotNull() & F.col("n.mean").isNotNull(),
        F.abs(F.col("n.mean") - F.col("o.mean"))
        > mean_rel_tol * F.greatest(F.abs(F.col("o.mean")), F.lit(1e-9)),
    ).otherwise(F.lit(False))
    status = (
        F.when(F.col("o.n_rows").isNull(), F.lit("added"))
        .when(F.col("n.n_rows").isNull(), F.lit("removed"))
        .when(null_drift | distinct_drift | mean_drift, F.lit("drifted"))
        .otherwise(F.lit("stable"))
    )
    return j.select(
        "column",
        F.col("o.n_rows").alias("n_rows_old"),
        F.col("n.n_rows").alias("n_rows_new"),
        nr_old.alias("null_rate_old"),
        nr_new.alias("null_rate_new"),
        F.col("o.n_distinct").alias("n_distinct_old"),
        F.col("n.n_distinct").alias("n_distinct_new"),
        F.col("o.mean").alias("mean_old"),
        F.col("n.mean").alias("mean_new"),
        F.coalesce(null_drift, F.lit(False)).alias("null_drift"),
        F.coalesce(distinct_drift, F.lit(False)).alias("distinct_drift"),
        mean_drift.alias("mean_drift"),
        status.alias("status"),
    )
