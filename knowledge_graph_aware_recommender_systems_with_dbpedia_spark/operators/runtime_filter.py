"""Bloom-style runtime pre-filter for selective joins.

Greenfield scale extension: when a join's build side is selective but
too large to broadcast as ROWS (say 10^8 surviving keys of a 10^10-row
dimension), engines ship a compact membership sketch to the probe side
so the big table is thinned BEFORE its shuffle — Spark's own runtime
row-level filters (spark.sql.optimizer.runtimeFilter.*) and the
classic bloom-filter join do exactly this.

:func:`prefiltered_join` expresses the same physical idea with stock
DataFrame operators, so it stays inside Catalyst/codegen and needs no
driver-side sketch object:

 * the build side's keys collapse to DISTINCT HASH BUCKETS
   (``hash(key) mod n_buckets`` — at most n_buckets rows, i.e. a
   bounded, broadcastable bitmap-as-table no matter how large the
   build side is);
 * the probe side left-semi-joins that broadcast bucket table on its
   own bucketed key — a map-side filter, no probe-side shuffle;
 * the exact join then runs on the thinned probe side.

Correctness is unconditional: a semi-join on ``hash(key)`` buckets
never drops a true match (same key -> same bucket); false positives
(collisions) survive the pre-filter and are eliminated by the exact
join. The output is therefore byte-identical to the plain join — the
oracle is ordinary SQL — while the probe side's shuffle shrinks by the
build side's selectivity. With the default 2^16 buckets the broadcast
is ~64k rows regardless of data scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefiltered_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    how: str = "inner",
    n_buckets: int = 1 << 16,
) -> DataFrame:
    """``probe.join(build, probe[probe_key] == build[build_key], how)``
    with a broadcast bucket-membership pre-filter on the probe side.

    ``how`` must be a type where pre-filtering the probe side is
    semantics-preserving: ``inner`` / ``left_semi``.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"pre-filtering the probe side is unsound for how={how!r}")
    # F.hash is type-sensitive: hash(5 as int) != hash(5 as bigint), so
    # hashing mismatched key dtypes would silently drop true matches the
    # exact join (with its implicit cast) would keep. Hash through a
    # common type: equal dtypes as-is, integral families widened to
    # bigint, anything else is refused rather than risked (ADVICE r07).
    probe_t = dict(probe.dtypes)[probe_key]
    build_t = dict(build.dtypes)[build_key]
    _integral = {"tinyint", "smallint", "int", "bigint"}
    if probe_t == build_t:
        probe_h, build_h = F.col(probe_key), F.col(build_key)
    elif probe_t in _integral and build_t in _integral:
        probe_h = F.col(probe_key).cast("bigint")
        build_h = F.col(build_key).cast("bigint")
    else:
        raise ValueError(
            f"prefiltered_join key dtypes differ ({probe_key}:{probe_t} vs "
            f"{build_key}:{build_t}) and are not both integral; cast the "
            "keys to a common type before calling"
        )
    buckets = (
        build.select(F.pmod(F.hash(build_h), F.lit(n_buckets)).alias("_rf_b"))
        .distinct()
    )
    thinned = (
        probe.withColumn("_rf_b", F.pmod(F.hash(probe_h), F.lit(n_buckets)))
        .join(F.broadcast(buckets), "_rf_b", "left_semi")
        .drop("_rf_b")
    )
    return thinned.join(build, thinned[probe_key] == build[build_key], how)
