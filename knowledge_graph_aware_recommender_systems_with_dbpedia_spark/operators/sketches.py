"""Mergeable frequency sketches: heavy hitters without a full-key shuffle.

``heavy_hitters`` finds every key whose frequency is at least ``1/k``
of the table (threshold given as the integer denominator ``k`` so the
cutoff ``count * k >= N`` is pure-integer and bit-exact in any engine)
via the two-phase SKETCH-PROPOSE / EXACT-VERIFY pattern:

1. **Propose** — one ``mapInPandas`` pass runs a Misra–Gries summary
   (capacity ``m``) per PARTITION, emitting only each partition's
   surviving candidate keys. Misra–Gries summaries are mergeable
   (Agarwal et al., "Mergeable Summaries", PODS'12): if a key has
   global count > N/(m+1), it must exceed N_p/(m+1) in at least one
   partition (else summing the per-partition bounds contradicts the
   global count), so the UNION of per-partition survivors is a
   SUPERSET of every global 1/(m+1)-heavy key. With ``m + 1 >= k``
   no true heavy hitter can be missed.
2. **Verify** — the candidate union is tiny (<= m keys per partition),
   so it broadcasts; an exact count restricted to candidate rows
   (broadcast semi-join, then a shuffle of ONLY candidate-key rows)
   replaces sketch estimates with exact counts, and the integer
   cutoff filters.

The output is therefore EXACT — identical to a full groupBy + HAVING —
and independent of partitioning, while at 100 TB the shuffle carries
only rows whose key survived a partition-local sketch instead of the
entire key universe (the a9/a16 full-shuffle shapes this replaces for
skew-headed distributions).

No reference counterpart (scale extension, SURVEY §2.12-adjacent
family of a15/a17/a18/ev17 sketch ops).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """Classic Misra–Gries over one partition's Arrow batches: keep at
    most ``capacity`` counters; an unseen key beyond capacity decrements
    every counter (dropping zeros). State lives across the partition's
    batches — O(capacity) memory regardless of partition size."""
    counters: dict[object, int] = {}
    for pdf in batches:
        for key in pdf["_hh_key"]:
            if key in counters:
                counters[key] += 1
            elif len(counters) < capacity:
                counters[key] = 1
            else:
                dead = []
                for kk in counters:
                    counters[kk] -= 1
                    if counters[kk] == 0:
                        dead.append(kk)
                for kk in dead:
                    del counters[kk]
    yield pd.DataFrame({"_hh_key": list(counters.keys())})


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int,
    capacity: int | None = None,
) -> DataFrame:
    """Exact keys with ``count * k >= N`` (frequency >= 1/k of ``df``).

    ``capacity`` (default ``2 * k``) must be >= k for the no-miss
    guarantee; the default doubles it so near-threshold keys rarely
    reach the verify phase as false negatives of partition skew
    (they cannot be false negatives of the final answer — the verify
    phase is exact — only extra candidates cost anything).

    Returns (``key_col``, ``n``) for every heavy key, plus the exact
    total in ``n_total`` (constant column) so callers can re-derive
    the fraction without a second scan.
    """
    assert k >= 2, "k is the frequency denominator (freq >= 1/k)"
    cap = capacity or 2 * k
    assert cap >= k, "capacity < k loses the Misra-Gries no-miss guarantee"

    keyed = df.select(F.col(key_col).alias("_hh_key"))
    # NULL keys never enter the sketch path: in pandas they surface as
    # None/NaN (NaN != NaN corrupts the counter dict) and a plain
    # left_semi join is null-unsafe, so they'd silently vanish from the
    # output even when frequent (ADVICE r07). SQL's GROUP BY treats NULL
    # as one group, so to stay identical to the groupBy+HAVING oracle the
    # NULL key is an UNCONDITIONAL candidate and the verify join is
    # null-safe (<=>) — the exact phase then counts the NULL group like
    # any other, with no extra scan of the input.
    nonnull = keyed.filter(F.col("_hh_key").isNotNull())
    schema = keyed.schema
    key_type = dict(keyed.dtypes)["_hh_key"]
    candidates = (
        nonnull.mapInPandas(
            lambda it: _misra_gries_partition(it, cap), schema=schema
        )
        .distinct()
        .withColumnRenamed("_hh_key", key_col)
        .unionByName(
            df.sparkSession.range(1).select(
                F.lit(None).cast(key_type).alias(key_col)
            )
        )
    )
    total = keyed.agg(F.count(F.lit(1)).alias("n_total"))
    cand = candidates.withColumnRenamed(key_col, "_hh_cand")
    exact = (
        df.join(
            F.broadcast(cand),
            F.col(key_col).eqNullSafe(F.col("_hh_cand")),
            "left_semi",
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n") * F.lit(k) >= F.col("n_total"))
        .select(key_col, "n", "n_total")
    )
