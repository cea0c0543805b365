"""Bucketed range joins — greenfield interval operators.

Spark has no range-join optimization (Databricks' RANGE_JOIN hint and
DuckDB's iejoin are engine features, not open-source Spark): a plain
``a.lo <= b.hi AND b.lo <= a.hi`` condition plans as
BroadcastNestedLoopJoin (small side) or a full cartesian product —
O(n*m) at 100 TB, i.e. never finishes.

The scalable re-expression is the classic bucketed band join:

 * pick a bucket width ``w`` on the join dimension;
 * explode each interval to the buckets it covers
   (``floor(lo/w) .. floor(hi/w)`` — integer ``div``, never float
   division, so epoch-nanos keys beyond 2^53 stay exact);
 * shuffle-equi-join on the bucket id (Catalyst plans a plain
   SortMergeJoin/AQE-skew-splittable exchange);
 * re-check the exact predicate.

Double-count elimination is algebraic, not a ``distinct``: a pair of
overlapping intervals shares every bucket the overlap region covers,
but the overlap START bucket ``floor(max(lo1, lo2)/w)`` is unique —
keeping only the join row whose bucket equals it emits each pair
exactly once with zero extra shuffle. (Point-in-interval needs no
elimination at all: a point lives in exactly one bucket.)

Cost model: each interval is replicated ``ceil(span/w)+1`` times, and
each bucket's local join is |left-in-bucket| x |right-in-bucket| —
pick ``w`` near the typical interval span so both factors stay small;
at real scale feed hot buckets through recommend.salted_join exactly
like the LSH band joins (dedup.minhash_lsh_pairs) do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: str, width: int) -> Column:
    # integer div keeps epoch-nanos (> 2^53) exact; floor semantics for
    # negative keys follow Spark/DuckDB `div` (truncation) identically
    # on both sides of the oracle, so bucket ids still agree.
    return F.expr(f"CAST(`{col}` AS BIGINT) div {int(width)}")


def _explode_buckets(df: DataFrame, lo: str, hi: str, width: int) -> DataFrame:
    """One row per bucket the [lo, hi] interval covers."""
    return df.withColumn(
        "_bucket", F.explode(F.sequence(_bucket(lo, width), _bucket(hi, width)))
    )


def interval_overlap_join(
    left: DataFrame,
    lo1: str,
    hi1: str,
    right: DataFrame,
    lo2: str,
    hi2: str,
    bucket_width: int,
) -> DataFrame:
    """All (left row, right row) pairs whose closed intervals overlap:
    ``lo1 <= hi2 AND lo2 <= hi1`` (DuckDB twin: the same theta join).

    Column names must be disjoint across the two inputs (alias before
    calling, as with any self-join) and plain identifiers; bounds are
    integers with ``lo <= hi``. Each pair is emitted exactly once (the
    overlap-start-bucket trick above), so callers add symmetry breaks
    like ``id1 < id2`` as a post-filter, not for dedup.
    """
    lb = _explode_buckets(left, lo1, hi1, bucket_width)
    rb = _explode_buckets(right, lo2, hi2, bucket_width)
    start_bucket = F.expr(
        f"CAST(greatest(`{lo1}`, `{lo2}`) AS BIGINT) div {int(bucket_width)}"
    )
    return (
        lb.join(rb, "_bucket")
        .filter(
            (F.col(lo1) <= F.col(hi2))
            & (F.col(lo2) <= F.col(hi1))
            & (F.col("_bucket") == start_bucket)
        )
        .drop("_bucket")
    )


def point_in_interval_join(
    points: DataFrame,
    val: str,
    intervals: DataFrame,
    lo: str,
    hi: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Each point paired with every interval containing it
    (``lo <= val <= hi``). A point covers exactly one bucket, so no
    duplicate elimination is needed; ``how='left'`` keeps unmatched
    points with NULL interval columns (enrichment form).
    """
    pb = points.withColumn("_bucket", _bucket(val, bucket_width))
    ib = _explode_buckets(intervals, lo, hi, bucket_width)
    cond = (
        (pb["_bucket"] == ib["_bucket"])
        & (F.col(lo) <= F.col(val))
        & (F.col(val) <= F.col(hi))
    )
    out = pb.join(ib, cond, how)
    return out.drop(pb["_bucket"]).drop(ib["_bucket"])
