"""Scale diagnostics — the pre-flight checks a 100 TB job runs BEFORE
committing to a shuffle plan.

Greenfield operators (no reference counterpart; the reference never
has to care — its datasets fit one GPU). At cluster scale the single
most common run-killer is JOIN-KEY SKEW: one hot key concentrates a
shuffle partition onto one task, and the job is as slow as that task.
This module measures it declaratively so pipelines can GATE on it
(choose a salt factor, switch to a broadcast or skew-join strategy)
instead of discovering it in a 10-hour straggler.

Everything here is one hash-aggregate pass — map-side combined, no
window over the data, no collect beyond the bounded top-k — so the
diagnostic itself is safe to run on the full input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def join_cardinality_report(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    top: int = 10,
) -> DataFrame:
    """Exact pre-flight of a prospective equi-join's OUTPUT size —
    the companion check to :func:`key_skew_report`: |A ⋈ B| =
    Σ_k a_k·b_k computed from the two per-key count tables, NEVER by
    running the join. A join that looks innocent at the input level
    (both sides fit) can explode at the output level (a many-to-many
    key pair); this report prices it first, for the cost of two
    map-side-combined aggregates plus a #distinct-keys-sized equi-join
    of the COUNT tables (input-row volume never re-shuffles).

    Returns the ``top`` keys by output contribution:
    (rank, key, n_left, n_right, n_out = n_left*n_right, out_share),
    heaviest first — out_share against the exact total output size, so
    ``sum(n_out) / out_share`` sanity checks and a single runaway key
    pair is visible before any executor sees it. Composite keys join
    with ``\\x01`` as in :func:`key_skew_report`.

    Equi-join NULL semantics are honored: a row with a NULL in ANY key
    column never matches in a real equi-join, so such rows are dropped
    from BOTH count tables before pricing (they contribute zero output
    rows). Pricing them as joinable — the pre-r13 behavior, where NULL
    rendered as '' — overestimated n_out whenever keys held NULLs."""
    if not key_cols:
        raise ValueError("join_cardinality_report: key_cols must be non-empty")
    notnull = None
    for c in key_cols:
        cond = F.col(c).isNotNull()
        notnull = cond if notnull is None else (notnull & cond)
    key = F.concat_ws("\x01", *[F.col(c).cast("string") for c in key_cols])
    ca = left.filter(notnull).select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_left")
    )
    cb = right.filter(notnull).select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_right")
    )
    j = ca.join(cb, "key").select(
        "key", "n_left", "n_right",
        (F.col("n_left") * F.col("n_right")).alias("n_out"),
    )
    tot = j.agg(F.sum("n_out").cast("bigint").alias("_t"))
    ranked = (
        j.orderBy(F.desc("n_out"), "key").limit(int(top)).crossJoin(F.broadcast(tot))
    )
    return ranked.select(
        # the rank window rides the <= top-row frame, never the data
        F.row_number()
        .over(Window.orderBy(F.desc("n_out"), "key"))
        .cast("bigint")
        .alias("rank"),
        "key",
        "n_left",
        "n_right",
        "n_out",
        F.round(F.col("n_out").cast("double") / F.col("_t"), 6).alias("out_share"),
    )


def equiwidth_histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 16,
) -> DataFrame:
    """Exact equi-width histogram of a numeric column — the ANALYZE
    TABLE primitive a cost-based optimizer's selectivity estimates
    read, and the third leg of the pre-flight stats family next to
    :func:`key_skew_report` (key shape) and
    :func:`join_cardinality_report` (join shape).

    Two passes, both cheap: ONE 1-row (min, max) aggregate broadcast
    back, then one map-side-combined groupBy on the bin id (bin =
    ``least(floor((v - min)/width), bins-1)``, width =
    ``(max - min)/bins``) — the shuffle carries at most ``bins`` rows
    per input partition regardless of data volume. NULLs are excluded
    (the null count is dq5's job); a constant column collapses into
    one full bin. Engine-exact: both engines see identical input
    doubles and the bin arithmetic is correctly rounded ops only.

    Returns (bin, lo, hi, n_rows) with lo/hi the bin's value range
    (hi of the last bin = max)."""
    v = F.col(value_col).cast("double")
    mm = df.filter(v.isNotNull()).agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    )
    binned = (
        df.filter(v.isNotNull())
        .crossJoin(F.broadcast(mm))
        .select(
            F.when(
                F.col("_hi") == F.col("_lo"), F.lit(0)
            )
            .otherwise(
                F.least(
                    F.floor(
                        (v - F.col("_lo"))
                        / ((F.col("_hi") - F.col("_lo")) / F.lit(float(bins)))
                    ),
                    F.lit(bins - 1),
                )
            )
            .cast("bigint")
            .alias("bin"),
            "_lo",
            "_hi",
        )
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    return (
        binned.groupBy("bin", "_lo", "_hi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .select(
            "bin",
            F.round(F.col("_lo") + F.col("bin") * width, 6).alias("lo"),
            F.round(
                F.when(
                    F.col("bin") == bins - 1, F.col("_hi")
                ).otherwise(F.col("_lo") + (F.col("bin") + 1) * width),
                6,
            ).alias("hi"),
            "n_rows",
        )
    )


def partition_plan_report(
    df: DataFrame,
    target_bytes: int = 128 * 1024 * 1024,
    min_partitions: int = 1,
) -> DataFrame:
    """Shuffle/scan partition-count planner — the fourth leg of the
    pre-flight stats family (dq6 key shape, dq7 join shape, dq8 value
    shape; this one answers "what should spark.sql.shuffle.partitions
    / files.maxPartitionBytes BE for this frame?"). Sizing partitions
    to a byte target is THE knob that keeps 100 TB shuffles out of
    spill territory: rows-per-partition heuristics break the moment
    row width varies (a 40-byte fact row vs a 4 KB document row is a
    100x error).

    Estimates the frame's in-flight size with a DETERMINISTIC width
    model — fixed widths for fixed-width types (8 for 64-bit numerics,
    4 for 32-bit, 1 for boolean), measured average lengths for
    strings/binary, and element-summed widths for arrays of the above
    — NOT by casting values to strings (engine float formatting would
    make the estimate engine-dependent; string/binary lengths are
    stored properties both engines agree on). ONE map-side-combined
    aggregate (sums of lengths + a count), 1 output row:
    (n_rows, est_row_bytes, est_total_bytes, target_bytes,
    n_partitions = max(ceil(total/target), min_partitions)).

    The estimate prices the COLUMN DATA, not codec overhead — the
    same convention as Spark's own SizeEstimator-based stats; callers
    gate on relative magnitude, which is what the partition count is.
    """
    fixed = 0.0
    var_width_exprs = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in ("bigint", "double", "timestamp", "timestamp_ntz"):
            fixed += 8.0
        elif t in ("int", "float", "date"):
            # DATE is a 32-bit days-since-epoch value in both Spark's
            # in-memory layout and parquet — pricing it at 8 would
            # overestimate date-heavy frames ~2x.
            fixed += 4.0
        elif t in ("smallint",):
            fixed += 2.0
        elif t in ("tinyint", "boolean"):
            fixed += 1.0
        elif t in ("string", "binary"):
            var_width_exprs.append(
                F.coalesce(F.length(F.col(f.name)).cast("double"), F.lit(0.0))
            )
        elif t.startswith("array<"):
            elem = t[len("array<"):-1]
            if elem in ("bigint", "double"):
                var_width_exprs.append(
                    F.coalesce(F.size(F.col(f.name)).cast("double"), F.lit(0.0))
                    * F.lit(8.0)
                )
            elif elem in ("int", "float"):
                var_width_exprs.append(
                    F.coalesce(F.size(F.col(f.name)).cast("double"), F.lit(0.0))
                    * F.lit(4.0)
                )
            elif elem == "string":
                var_width_exprs.append(
                    F.coalesce(
                        F.aggregate(
                            F.col(f.name),
                            F.lit(0.0),
                            lambda a, x: a
                            + F.coalesce(F.length(x).cast("double"), F.lit(0.0)),
                        ),
                        F.lit(0.0),
                    )
                )
            else:
                raise ValueError(
                    f"partition_plan_report: unsupported array element "
                    f"type {elem!r} in column {f.name!r}"
                )
        else:
            raise ValueError(
                f"partition_plan_report: unsupported type {t!r} in "
                f"column {f.name!r} — project the frame to plannable "
                "columns first"
            )
    var_bytes = None
    for e in var_width_exprs:
        var_bytes = e if var_bytes is None else (var_bytes + e)
    row_var = var_bytes if var_bytes is not None else F.lit(0.0)
    agg = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.coalesce(F.sum(row_var), F.lit(0.0)).alias("_var_total"),
    )
    total = (
        F.col("n_rows").cast("double") * F.lit(fixed) + F.col("_var_total")
    )
    return agg.select(
        "n_rows",
        F.round(
            F.when(F.col("n_rows") > 0, total / F.col("n_rows").cast("double"))
            .otherwise(F.lit(0.0)),
            2,
        ).alias("est_row_bytes"),
        F.ceil(total).cast("bigint").alias("est_total_bytes"),
        F.lit(int(target_bytes)).cast("bigint").alias("target_bytes"),
        F.greatest(
            F.ceil(total / F.lit(float(target_bytes))).cast("bigint"),
            F.lit(int(min_partitions)).cast("bigint"),
        ).alias("n_partitions"),
    )


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    top: int = 10,
) -> DataFrame:
    """Hot-key report for a prospective shuffle key: the ``top``
    heaviest key values with, per key, its row count, share of the
    input, the skew factor (count / mean-rows-per-key — how many
    "average keys" this one key weighs), and the minimal SALT factor
    that would bring its partition-share down to the mean (the number
    a salting rewrite should use; 1 = no salting needed).

    Shape: ONE groupBy over the key (map-side combined — a hot key
    partial-aggregates inside each input partition, so the diagnostic
    never concentrates the hot key's raw rows on one task; the
    combiner output is #distinct-keys rows), a 1-row (n_rows, n_keys)
    scalar broadcast back, and a bounded top-k sort. The mean-based
    skew factor matches what AQE's skew-join trigger reasons about
    (partition size vs median); gate on ``skew_factor`` before
    choosing a plain hash join at scale.

    Returns (rank, key, n_rows, share, skew_factor, salt_factor),
    rank 1 = heaviest, key rendered as a string (composite keys join
    with ``\\u0001`` so the report schema is key-type-agnostic). NULL
    components render as the sentinel ``\\x00null`` BEFORE the join —
    ``concat_ws`` alone skips NULLs together with their separator, so
    ('a', NULL) and (NULL, 'a') would alias to the same rendered key
    and silently merge distinct shuffle groups; the sentinel keeps
    arity and null positions encoded. (NULL keys stay IN the report —
    a groupBy/shuffle hashes the null group like any other, so a hot
    NULL key is exactly what this diagnostic must surface.)
    """
    key = F.concat_ws(
        "\x01",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in key_cols],
    )
    counts = df.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    tot = counts.agg(
        F.sum("n_rows").cast("bigint").alias("_n"),
        F.count(F.lit(1)).cast("bigint").alias("_k"),
    )
    ranked = (
        counts.orderBy(F.desc("n_rows"), "key")
        .limit(int(top))
        .crossJoin(F.broadcast(tot))
    )
    mean = F.col("_n").cast("double") / F.col("_k").cast("double")
    return ranked.select(
        # the rank window rides the <= top-row frame, never the data
        F.row_number()
        .over(Window.orderBy(F.desc("n_rows"), "key"))
        .cast("bigint")
        .alias("rank"),
        "key",
        "n_rows",
        F.round(F.col("n_rows").cast("double") / F.col("_n"), 6).alias("share"),
        F.round(F.col("n_rows").cast("double") / mean, 6).alias("skew_factor"),
        F.greatest(
            F.ceil(F.col("n_rows").cast("double") / mean).cast("bigint"),
            F.lit(1).cast("bigint"),
        ).alias("salt_factor"),
    )
