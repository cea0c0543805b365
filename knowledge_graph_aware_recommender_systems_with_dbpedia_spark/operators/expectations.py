"""Declarative data-quality expectations over a DataFrame (Deequ-style).

Greenfield scale extension (no reference counterpart): a 100 TB
training-data pipeline gates every ingest on a verification suite —
completeness, uniqueness, value ranges, set membership, regex shape,
referential containment — and the naive spelling (one query per check)
scans the fact table once PER CHECK. :func:`run_expectations` instead
compiles the whole suite into:

 * ONE conditional-aggregation pass over the checked table for every
   row-level check (completeness / in_set / matches / between) — all
   sums fold map-side, so the scan parallelizes and the shuffle is one
   scalar row;
 * the exact ``count_distinct`` shuffle only when a uniqueness check
   is present (the documented sketch swap is approx_count_distinct,
   same shape as a18);
 * one semi-join aggregate per referential check — Catalyst broadcasts
   the dimension side when it is small (the usual case: checking fact
   foreign keys against a dimension).

Only O(#checks) scalars ever reach the driver; the returned report is
a #checks-row DataFrame of ``(check, metric, threshold, passed)``.

Metrics are fractions-of-rows (or distinct/count for uniqueness) in
[0, 1], rounded to 6 so the report is engine-portable: every metric is
a ratio of exact BIGINT counts, and IEEE division + half-up rounding of
the same integers is bit-identical on any binary64 engine (the tx14
rule: no transcendentals on the hash-compared surface).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation. ``kind`` one of:

    * ``completeness`` — fraction of rows with ``column`` non-null
    * ``uniqueness``   — exact count_distinct(column) / count(*)
    * ``in_set``       — fraction with value in ``values`` (nulls fail)
    * ``matches``      — fraction matching regex ``pattern`` (nulls fail)
    * ``between``      — fraction with ``lo <= column <= hi`` (nulls fail)
    * ``referential``  — fraction whose ``column`` exists in
      ``ref_table``'s ``ref_column`` (checked via semi-join count)

    ``threshold``: minimum acceptable metric. ``passed`` in the report
    is ``metric >= threshold`` on the rounded metric — EXCEPT when
    ``threshold >= 1.0``: an exact gate compares the raw integer counts
    (``good == total``), because q6 rounding would otherwise let up to
    ~5e-7 of rows violate and still "pass" (~500 bad rows in a billion
    — fatal for an 'exactly complete' gate at scale; ADVICE r07). The
    rounded metric stays the reported value either way.
    """

    name: str
    kind: str
    column: str
    threshold: float
    values: tuple = ()
    pattern: str = ""
    lo: float | None = None
    hi: float | None = None
    ref_table: DataFrame | None = field(default=None, compare=False, hash=False)
    ref_column: str = ""


def _row_level_flag(c: Check):
    col = F.col(c.column)
    if c.kind == "completeness":
        return col.isNotNull()
    if c.kind == "in_set":
        return col.isin(list(c.values))
    if c.kind == "matches":
        return col.rlike(c.pattern)
    if c.kind == "between":
        return (col >= F.lit(c.lo)) & (col <= F.lit(c.hi))
    raise ValueError(f"not a row-level check: {c.kind}")


def run_expectations(
    spark: SparkSession, df: DataFrame, checks: list[Check]
) -> DataFrame:
    """Compile + run the suite; return the per-check report DataFrame
    with columns ``(check, metric, threshold, passed)``."""
    row_level = [c for c in checks if c.kind in ("completeness", "in_set", "matches", "between")]
    unique = [c for c in checks if c.kind == "uniqueness"]
    referential = [c for c in checks if c.kind == "referential"]
    if len(row_level) + len(unique) + len(referential) != len(checks):
        bad = [c.kind for c in checks if c not in row_level + unique + referential]
        raise ValueError(f"unknown check kinds: {bad}")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(row_level):
        aggs.append(
            F.sum(F.when(_row_level_flag(c), 1).otherwise(0)).cast("bigint").alias(f"_rl{i}")
        )
    for i, c in enumerate(unique):
        aggs.append(F.count_distinct(F.col(c.column)).alias(f"_uq{i}"))
    row = df.agg(*aggs).first()
    n = row["_n"]

    # Coalesce aggregated counts to 0: on an EMPTY frame SUM yields
    # NULL while count_distinct yields 0, and `None == 0` is False —
    # the same exact gate would be vacuously true for uniqueness but
    # false for row-level checks. Uniform rule: n == 0 PASSES every
    # gate vacuously (zero rows violate nothing; emptiness itself is a
    # volume signal, gated separately by corpus_metrics' n_rows).
    good: dict[str, int] = {}
    for i, c in enumerate(row_level):
        good[c.name] = row[f"_rl{i}"] or 0
    for i, c in enumerate(unique):
        good[c.name] = row[f"_uq{i}"] or 0
    for c in referential:
        good[c.name] = (
            df.select(F.col(c.column).alias("_k"))
            .join(
                c.ref_table.select(F.col(c.ref_column).alias("_k")).distinct(),
                "_k",
                "left_semi",
            )
            .count()
        )

    rows = []
    for c in checks:  # report preserves suite order via the name column
        # portable half-up q6 (the _q6 contract): floor(x*1e6 + 0.5)/1e6
        # is bit-identical in Python, Spark and DuckDB — Python's
        # round() is banker's and may differ at a boundary.
        m = math.floor((good[c.name] / n if n else 0.0) * 1e6 + 0.5) / 1e6
        # exact gates (threshold >= 1) compare integer counts, not the
        # rounded ratio — see the Check docstring
        ok = good[c.name] == n if c.threshold >= 1.0 else m >= c.threshold
        rows.append((c.name, float(m), float(c.threshold), bool(ok)))
    return spark.createDataFrame(
        rows, "check string, metric double, threshold double, passed boolean"
    )
