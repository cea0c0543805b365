"""Bucketed range joins (operators/rangejoin.py): exactness vs a naive
cross-join reference, cross-bucket spans, exactly-once emission, and
the point-in-interval enrichment form."""

import random

from pyspark.sql import functions as F

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)


def _intervals(seed: int, n: int, span_max: int, domain: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        lo = rng.randrange(domain)
        rows.append((i, lo, lo + rng.randrange(span_max)))
    return rows


def test_overlap_join_matches_naive_cross_join(spark):
    """Property check: the bucketed plan equals the O(n*m) reference on
    random intervals whose spans cross many buckets (width 10, spans up
    to 50) — covers zero-length, nested, identical, and multi-bucket
    overlaps."""
    a_rows = _intervals(1, 60, 50, 300)
    b_rows = _intervals(2, 70, 50, 300)
    a = spark.createDataFrame(a_rows, "id1 long, lo1 long, hi1 long")
    b = spark.createDataFrame(b_rows, "id2 long, lo2 long, hi2 long")

    got = {
        (r.id1, r.id2)
        for r in interval_overlap_join(a, "lo1", "hi1", b, "lo2", "hi2", 10).collect()
    }
    want = {
        (i1, i2)
        for (i1, l1, h1) in a_rows
        for (i2, l2, h2) in b_rows
        if l1 <= h2 and l2 <= h1
    }
    assert got == want and len(want) > 100


def test_overlap_join_emits_each_pair_exactly_once(spark):
    """Two intervals sharing MANY buckets still produce one output row
    (the overlap-start-bucket elimination, not a distinct)."""
    a = spark.createDataFrame([(1, 0, 1000)], "id1 long, lo1 long, hi1 long")
    b = spark.createDataFrame([(2, 500, 2000)], "id2 long, lo2 long, hi2 long")
    out = interval_overlap_join(a, "lo1", "hi1", b, "lo2", "hi2", 10).collect()
    assert len(out) == 1
    # and the plan really has no Distinct/dropDuplicates node
    plan = interval_overlap_join(a, "lo1", "hi1", b, "lo2", "hi2", 10)._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" not in plan and "Distinct" not in plan


def test_point_in_interval_inner_and_left(spark):
    pts = spark.createDataFrame(
        [(1, 5), (2, 25), (3, 999)], "pid long, v long"
    )
    iv = spark.createDataFrame(
        [(10, 0, 9), (11, 0, 30), (12, 20, 26)], "iid long, lo long, hi long"
    )
    inner = {
        (r.pid, r.iid)
        for r in point_in_interval_join(pts, "v", iv, "lo", "hi", 8).collect()
    }
    assert inner == {(1, 10), (1, 11), (2, 11), (2, 12)}
    left = point_in_interval_join(pts, "v", iv, "lo", "hi", 8, how="left")
    rows = {(r.pid, r.iid) for r in left.collect()}
    assert (3, None) in rows and len(rows) == 5


def test_negative_bounds(spark):
    """Truncating div buckets still agree for negative keys because both
    sides bucket identically; exactness comes from the re-check."""
    a = spark.createDataFrame([(1, -25, -5)], "id1 long, lo1 long, hi1 long")
    b = spark.createDataFrame(
        [(2, -10, 3), (3, -100, -30)], "id2 long, lo2 long, hi2 long"
    )
    got = {
        (r.id1, r.id2)
        for r in interval_overlap_join(a, "lo1", "hi1", b, "lo2", "hi2", 7).collect()
    }
    assert got == {(1, 2)}
